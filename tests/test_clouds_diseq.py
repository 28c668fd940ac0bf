"""Cloud microphysics (virga-lite), quench chemistry, moist adiabat,
MLT kzz, and resort-rebin CK mixing."""

import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from picaso_tpu import chemistry, justdoit as jdi, virga as vj
from picaso_tpu.climate import moist
from picaso_tpu.climate.adiabat import load_adiabat_grid
from picaso_tpu.opacities import resortrebin as rr
from picaso_tpu.opacities.ck import double_gauss_points


# ---------------------------------------------------------------------------
# virga-lite
# ---------------------------------------------------------------------------

def _bd_profile(nlevel=40):
    # cool Jupiter-like profile so H2O actually condenses near ~1 bar
    pressure = np.logspace(-4, 2, nlevel)
    temperature = np.clip(420 * (pressure / 50) ** 0.15, 120, None)
    return pd.DataFrame({'pressure': pressure, 'temperature': temperature,
                         'kz': np.zeros(nlevel) + 1e9})


def test_pvaps_monotonic_in_temperature():
    for gas in vj.available():
        t = np.linspace(150, 2500, 50)
        pv = getattr(vj.pvaps, gas)(t)
        assert np.isfinite(pv).all() and (pv > 0).all()
        assert (np.diff(pv) > 0).all(), gas   # Clausius-Clapeyron-like


def test_condensation_t_and_recommend():
    df = _bd_profile()
    p, tc = vj.condensation_t('H2O', 1, 2.2,
                              pressure=np.asarray(df['pressure']))
    assert (np.diff(tc) > 0).all()   # condenses hotter at depth
    rec = vj.recommend_gas(np.asarray(df['pressure']),
                           np.asarray(df['temperature']))
    assert len(rec) > 0


def test_eddysed_balance():
    df = _bd_profile()
    atmo = vj.Atmosphere(['H2O'], fsed=2.0)
    atmo.gravity = 1000.0
    atmo.ptk(df=df)
    out = vj.compute(atmo)
    opd = out['opd_per_layer']
    assert opd.shape == (39, 196)
    assert opd.sum() > 0
    qc = out['condensibles']['H2O']['q_c']
    # cloud base: condensate exists only above (at lower pressure than)
    # the deepest supersaturated layer
    ibase = int(np.max(np.nonzero(qc)[0]))
    assert (qc[ibase + 1:] == 0).all()      # nothing below the base
    assert qc[ibase] > 0
    assert (out['single_scattering'] >= 0).all()
    assert (out['single_scattering'] <= 1).all()
    # higher fsed -> thinner cloud
    atmo2 = vj.Atmosphere(['H2O'], fsed=6.0)
    atmo2.gravity = 1000.0
    atmo2.ptk(df=df)
    out2 = vj.compute(atmo2)
    assert out2['opd_per_layer'].sum() < opd.sum()


def test_inputs_virga_attaches_clouds():
    case = jdi.inputs(calculation='browndwarf')
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    df = _bd_profile()
    df['H2'] = 0.84
    df['He'] = 0.16
    case.atmosphere(df=df)
    cld = case.virga(['H2O'], fsed=1.0)
    assert case.inputs['clouds']['profile'] is not None
    assert cld['opd'].sum() > 0


def test_mieff_roundtrip(tmp_path):
    # write a tiny synthetic mieff file and read it back
    nw, nr = 5, 3
    wave = np.linspace(0.5, 5, nw)
    radii = np.logspace(-6, -4, nr)
    lines = [f'{nw} {nr}']
    for r in radii:
        lines.append(f'{r:.6e}')
        for w in wave:
            lines.append(f'{w:.4f} 1.0 2.0 1.6')
    fn = tmp_path / 'H2O.mieff'
    fn.write_text('\n'.join(lines))
    mie = vj.load_mieff(str(fn))
    assert mie['qext'].shape == (nr, nw)
    np.testing.assert_allclose(mie['wave_um'], wave)


# ---------------------------------------------------------------------------
# quench chemistry
# ---------------------------------------------------------------------------

def test_quench_levels_and_adjustment():
    nlevel = 50
    pressure = np.logspace(-4, 3, nlevel)
    temp = np.clip(1500 * (pressure / 100) ** 0.1, 350, None)
    mmw = np.zeros(nlevel - 1) + 2.2
    scale_h = 1.38e-16 * temp[:-1] / (2.2 * 1.66e-24 * 1000)
    dtdp = np.diff(np.log(temp)) / np.diff(np.log(pressure))
    q, t_mix = chemistry.quench_levels(pressure, temp, dtdp, 1e9, mmw,
                                       scale_h, 10.0)
    assert 'CO-CH4-H2O' in q
    assert 0 < q['CO-CH4-H2O'] < nlevel

    case = jdi.inputs(calculation='browndwarf')
    df = pd.DataFrame({'pressure': pressure, 'temperature': temp,
                       'H2': np.zeros(nlevel) + 0.85,
                       'CH4': 1e-4 * (pressure / 100) ** 0.2,
                       'CO': 1e-4 * (100 / pressure) ** 0.05,
                       'H2O': np.zeros(nlevel) + 1e-3,
                       'CO2': np.zeros(nlevel) + 1e-7})
    case.atmosphere(df=df)
    total_before = case.inputs['atmosphere']['profile'][
        ['H2', 'CH4', 'CO', 'H2O', 'CO2']].sum(axis=1)
    case.adjust_quench_chemistry(q)
    prof = case.inputs['atmosphere']['profile']
    qlev = q['CO-CH4-H2O']
    # frozen above the quench level
    assert prof['CH4'][:qlev].std() < 1e-12
    # totals conserved via H2
    total_after = prof[['H2', 'CH4', 'CO', 'H2O', 'CO2']].sum(axis=1)
    np.testing.assert_allclose(total_after, total_before, rtol=1e-10)


# ---------------------------------------------------------------------------
# moist adiabat
# ---------------------------------------------------------------------------

def test_moist_grad_below_dry():
    """Latent heat release flattens the gradient below the dry adiabat."""
    adiabat = load_adiabat_grid()
    t = jnp.asarray([280.0])
    p = jnp.asarray([1.0])
    dry, _ = moist.moist_grad(t, p, adiabat,
                              jnp.asarray([[0.0]]), ('H2O',), (18.015,))
    wet, _ = moist.moist_grad(t, p, adiabat,
                              jnp.asarray([[2e-2]]), ('H2O',), (18.015,))
    assert float(wet[0]) < float(dry[0])
    # without condensables it reduces to the table gradient
    from picaso_tpu.climate.adiabat import did_grad_cp
    table, _ = did_grad_cp(t, p, adiabat)
    np.testing.assert_allclose(float(dry[0]), float(table[0]), rtol=1e-8)


def test_cp_shomate_ranges():
    for mol in ('H2O', 'CH4', 'NH3', 'Fe', 'CO2', 'Na'):
        cps = [float(moist.cp_gas(mol, jnp.asarray(T), 18.0))
               for T in (50.0, 500.0, 1500.0, 3000.0)]
        assert all(np.isfinite(cps)) and all(c > 0 for c in cps)


# ---------------------------------------------------------------------------
# resort-rebin CK mixing
# ---------------------------------------------------------------------------

def _mix_2_gases_oracle(k1, k2, mix1, mix2, gauss_pts, gauss_wts):
    """Independent numpy transcription of the reference algorithm
    (deq_chem.py:538-598) used as a parity oracle."""
    mix_t = mix1 + mix2
    Nk = len(gauss_wts)
    kmix = np.zeros(Nk * Nk)
    wts = np.zeros(Nk * Nk)
    for i in range(Nk):
        for j in range(Nk):
            kmix[i * Nk + j] = (mix1 * k1[i] + mix2 * k2[j]) / mix_t
            wts[i * Nk + j] = gauss_wts[i] * gauss_wts[j]
    order = np.argsort(kmix, kind='mergesort')
    ksort, wsort = kmix[order], wts[order]
    x = np.cumsum(wsort) / np.cumsum(wsort).max()
    return 10 ** np.interp(gauss_pts, x, np.log10(ksort)), mix_t


def test_mix_2_gases_matches_reference_algorithm():
    gauss_pts, gauss_wts = double_gauss_points()
    rng = np.random.default_rng(0)
    k1 = np.sort(10.0 ** rng.uniform(-30, -20, 8))
    k2 = np.sort(10.0 ** rng.uniform(-28, -22, 8))
    expect, mt = _mix_2_gases_oracle(k1, k2, 0.7, 0.3, gauss_pts,
                                     gauss_wts)
    kmix, mix_t = rr.mix_2_gases(jnp.asarray(k1)[None],
                                 jnp.asarray(k2)[None],
                                 jnp.asarray([0.7]), jnp.asarray([0.3]),
                                 jnp.asarray(gauss_pts),
                                 jnp.asarray(gauss_wts))
    assert float(mix_t[0]) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(kmix[0]), expect, rtol=1e-10)


def test_mix_conserves_mean_opacity():
    """Random-overlap mixing preserves the weighted-mean opacity."""
    gauss_pts, gauss_wts = double_gauss_points()
    rng = np.random.default_rng(4)
    k1 = np.sort(10.0 ** rng.uniform(-24, -22, 8))
    k2 = np.sort(10.0 ** rng.uniform(-23, -21, 8))
    kmix, _ = rr.mix_2_gases(jnp.asarray(k1)[None], jnp.asarray(k2)[None],
                             jnp.asarray([0.5]), jnp.asarray([0.5]),
                             jnp.asarray(gauss_pts),
                             jnp.asarray(gauss_wts))
    mean_in = 0.5 * (gauss_wts @ k1) + 0.5 * (gauss_wts @ k2)
    mean_out = gauss_wts @ np.asarray(kmix[0])
    np.testing.assert_allclose(mean_out, mean_in, rtol=0.05)


def test_mix_dominant_gas_wins():
    gauss_pts, gauss_wts = double_gauss_points()
    rng = np.random.default_rng(1)
    k1 = jnp.asarray(np.sort(10.0 ** rng.uniform(-30, -25, 8)))
    k2 = jnp.asarray(np.sort(10.0 ** rng.uniform(-24, -20, 8)))
    kmix, _ = rr.mix_2_gases(k1[None], k2[None], jnp.asarray([1.0]),
                             jnp.asarray([1e-12]),
                             jnp.asarray(gauss_pts),
                             jnp.asarray(gauss_wts))
    np.testing.assert_allclose(np.asarray(kmix[0]), np.asarray(k1),
                               rtol=0.05)


def test_resortrebin_full_stack():
    wno = np.linspace(1000, 5000, 12)
    tables, meta = rr.synthetic_per_gas_tables(wno, ntemp=5, npress=4)
    ngas = tables.shape[0]
    nlayer = 7
    mixes = jnp.asarray(np.full((ngas, nlayer), 1.0 / ngas))
    tlayer = jnp.asarray(np.linspace(300, 2500, nlayer))
    player = jnp.asarray(np.logspace(-3, 1, nlayer))
    nc_p = jnp.asarray(np.full(5, 4), jnp.int32)
    kappa = rr.resortrebin_kappa(
        jnp.asarray(tables), jnp.asarray(1.0 / meta['temps']),
        jnp.asarray(np.log10(meta['pressures'])), nc_p,
        jnp.asarray(meta['gauss_pts']), jnp.asarray(meta['gauss_wts']),
        mixes, tlayer, player)
    kappa = np.asarray(kappa)
    assert kappa.shape == (nlayer, 12, 8)
    assert np.isfinite(kappa).all() and (kappa > 0).all()
    # k-distribution must be non-decreasing in g
    assert (np.diff(kappa, axis=-1) >= -1e-6 * kappa[..., :-1]).all()
