"""Climate solver tests: components + end-to-end RCE convergence.

The reference ships no climate unit tests; we anchor with physics:
(1) the adiabat lookup reproduces table nodes, (2) profile reconstruction
follows the adiabat in convective zones, (3) a cloud-free brown-dwarf RCE
run converges to a net-flux balance |F_net/sigma Teff^4| << 1 with a
monotonic T(P) profile, using a synthetic premixed CK table + the real
bundled CIA continuum database.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.climate import core
from picaso_tpu.climate.adiabat import load_adiabat_grid, did_grad_cp
from picaso_tpu.opacities.ck import synthetic_ck_table


def test_adiabat_grid_nodes():
    grid = load_adiabat_grid()
    t_log = np.asarray(grid.t_table)
    p_log = np.asarray(grid.p_table)
    # query exactly at interior nodes -> exact table values
    it, ip = 20, 10
    g, cp = did_grad_cp(10 ** t_log[it], 10 ** p_log[ip], grid)
    assert np.isclose(float(g), float(grid.grad[it, ip]), rtol=1e-6)
    assert np.isclose(float(cp), 10 ** float(grid.cp[it, ip]), rtol=1e-6)
    # clamping outside the grid must not produce NaN
    g2, cp2 = did_grad_cp(jnp.asarray([1.0, 1e6]),
                          jnp.asarray([1e-12, 1e9]), grid)
    assert np.isfinite(np.asarray(g2)).all()


def test_reconstruct_profile_follows_adiabat():
    adiabat = load_adiabat_grid()
    nlevel = 40
    plevel = np.logspace(-4, 2, nlevel) * 1e6
    beta = np.linspace(600, 1200, nlevel)
    nstr = [0, 19, nlevel - 2, 0, 0, 0]
    zones = core.zone_maps(nstr, 1, nlevel)
    temp = np.asarray(core.reconstruct_profile(
        jnp.asarray(beta), zones, jnp.asarray(plevel), adiabat))
    # radiative region untouched
    np.testing.assert_allclose(temp[:20], beta[:20])
    # convective region follows the adiabat step by step
    p_bar = plevel / 1e6
    for j in range(20, nlevel):
        pm = np.sqrt(p_bar[j - 1] * p_bar[j])
        g, _ = did_grad_cp(temp[j - 1], pm, adiabat)
        expect = np.exp(np.log(temp[j - 1])
                        + float(g) * np.log(p_bar[j] / p_bar[j - 1]))
        assert np.isclose(temp[j], expect, rtol=1e-10)


def test_zone_maps_packing():
    nstr = [0, 5, 20, 0, 0, 0]
    z = core.zone_maps(nstr, 1, 30)
    assert int(z.n_total) == 6           # level@0 + midpts 0..4
    assert list(np.asarray(z.pert_levels[:6])) == [0, 1, 2, 3, 4, 5]
    assert list(np.asarray(z.resid_level[:6])) == [0, 0, 1, 2, 3, 4]
    assert list(np.asarray(z.resid_is_level[:6])) == [1, 0, 0, 0, 0, 0]
    assert np.asarray(z.is_conv)[6:22].all()
    assert not np.asarray(z.is_conv)[:6].any()

    z2 = core.zone_maps([0, 5, 8, 12, 15, 28], 2, 30)
    assert int(z2.n_total) == 6 + 3      # + midpts 12..14
    assert list(np.asarray(z2.pert_levels[6:9])) == [13, 14, 15]


@pytest.fixture(scope='module')
def bd_case():
    ck = synthetic_ck_table()
    opa = jdi.opannection(ck_table=ck)
    case = jdi.inputs(calculation='browndwarf', climate=True)
    case.effective_temp(1000)
    case.gravity(gravity=200, gravity_unit=jdi.u.Unit('m/(s**2)'))
    nlevel = 61
    pressure = np.logspace(-4, 2.5, nlevel)
    # crude guess: isothermal top + adiabat-ish bottom
    temp_guess = np.clip(1000 * (pressure / 30) ** 0.1, 400, None)
    case.inputs_climate(temp_guess=temp_guess, pressure=pressure,
                        rcb_guess=40, rfacv=0.0)
    return opa, case


def test_brown_dwarf_rce_converges(bd_case):
    opa, case = bd_case
    out = case.climate(opa, verbose=False)
    assert out['converged'] == 1
    temp = out['temperature']
    press = out['pressure']
    assert np.isfinite(temp).all()
    # monotonic increasing T with depth below the upper levels
    assert (np.diff(temp[5:]) > -1e-6).all()
    # energy balance: net flux zeroed to 0.1% of sigma*Teff^4 everywhere
    # in the radiative zone above the RCB (the converged solver actually
    # reaches ~3e-5 here; 1e-3 leaves margin for platform jitter)
    fb = out['flux_balance']
    sigT4 = core.SIGMA_SB * 1000.0 ** 4
    nstr = out['cvz_locs']
    resid = (fb['flux_net'][:max(nstr[1], 1)]) / sigT4
    assert np.max(np.abs(resid)) < 1e-3, resid
    # the convective zone lapse rate tracks the adiabat
    adiabat = load_adiabat_grid()
    tbar = 0.5 * (temp[1:] + temp[:-1])
    pbar = np.sqrt(press[1:] * press[:-1])
    grad, _ = did_grad_cp(jnp.asarray(tbar), jnp.asarray(pbar), adiabat)
    dtdp = out['dtdp']
    conv = slice(nstr[1] + 1, nstr[2])
    np.testing.assert_allclose(dtdp[conv], np.asarray(grad)[conv],
                               rtol=0.05)


def test_irradiated_rce_converges():
    """Irradiated exoplanet RCE (rfacv>0): visible stellar heating enters
    through rfacv-weighted reflected fluxes (climate.py:1806-1813 path).
    The profile must converge and sit warmer aloft than the same object
    without irradiation."""
    ck = synthetic_ck_table()
    nlevel = 41
    pressure = np.logspace(-4, 2.5, nlevel)
    guess = np.clip(700.0 * (pressure / 30) ** 0.1, 300, None)

    def run(irradiated):
        opa = jdi.opannection(ck_table=ck)
        case = jdi.inputs(calculation='planet', climate=True)
        case.effective_temp(700)
        case.gravity(gravity=20, gravity_unit=jdi.u.Unit('m/(s**2)'))
        if irradiated:
            case.star(opa, temp=5600, radius=1.0,
                      radius_unit=jdi.u.Unit('Rsun'), semi_major=0.05,
                      semi_major_unit=jdi.u.Unit('au'))
            case.inputs_climate(temp_guess=guess, pressure=pressure,
                                rcb_guess=30, rfacv=0.5)
        else:
            case.setup_nostar()
            case.inputs_climate(temp_guess=guess, pressure=pressure,
                                rcb_guess=30, rfacv=0.0)
        return case.climate(opa, verbose=False)

    hot = run(True)
    cold = run(False)
    assert hot['converged'] == 1 and cold['converged'] == 1
    t_hot = np.asarray(hot['temperature'])
    t_cold = np.asarray(cold['temperature'])
    assert np.isfinite(t_hot).all()
    # stellar heating warms the upper radiative atmosphere
    assert t_hot[:10].mean() > t_cold[:10].mean() + 25.0


def test_t_start_keeps_visible_flux_in_residual():
    """Irradiated t_start must zero the FULL balance rfaci*F_ir +
    rfacv*F_v + tidal (regression: the line search re-ran _flux_state
    with compute_reflected=False, so every iteration after the first
    solved the non-irradiated problem; reference climate.py:1425-1427
    carries the temperature-independent visible fluxes instead)."""
    from picaso_tpu.climate.api import ck_rtprops, _ClimateState
    from picaso_tpu.climate.adiabat import load_adiabat_grid
    from picaso_tpu.opacities.ck import load_ck_db
    from picaso_tpu.rt import toon
    import pandas as pd

    nlevel = 31
    ck = synthetic_ck_table(dtype=np.float64)
    pressure = np.logspace(-4, 2.5, nlevel)
    guess = np.clip(700.0 * (pressure / 10.0) ** 0.12, 250.0, 2800.0)
    nstr = [0, nlevel - 8, nlevel - 2, 0, 0, 0]

    prof = pd.DataFrame(dict(pressure=pressure, temperature=guess))
    for sp, v in (('H2', 0.837), ('He', 0.155), ('H2O', 1e-3),
                  ('CH4', 3e-4)):
        prof[sp] = v
    props, _ = ck_rtprops(prof, ck, gravity=100.0 * 100.0,
                          dtype=np.float64)
    tidal = core.tidal_flux(700.0, nlevel)
    F0PI = np.zeros(len(np.asarray(ck.wno))) + 1e5   # strong irradiation
    rfacv = 0.5
    res = core.t_start(
        guess, pressure * 1e6, nstr, 1, props,
        core.make_climate_geometry(), np.asarray(ck.wno),
        np.asarray(ck.arrays.delta_wno), np.asarray(ck.arrays.gauss_wts),
        0.0, F0PI, toon.ScatteringControls(), load_adiabat_grid(), 1.0,
        rfacv, np.asarray(tidal), 50.0, 10000.0, it_max=10)
    # full energy balance at the returned profile, INCLUDING the
    # visible term, normalized by sigma Teff^4
    balance = (1.0 * np.asarray(res.flux_net_ir)
               + rfacv * np.asarray(res.flux_net_v)
               + np.asarray(tidal))
    resid = np.abs(balance[:nstr[1]]) / abs(float(tidal[0]))
    assert np.max(resid) < 5e-3, f'max resid {np.max(resid):.2e}'
    # and the stellar term actually mattered (non-trivial test)
    assert np.max(np.abs(rfacv * np.asarray(res.flux_net_v))
                  / abs(float(tidal[0]))) > 0.05
