"""End-to-end spectrum pipeline against a synthetic reference-schema DB.

The analog of the reference golden-file test (tests/test_notebooks.py:55-143)
— since the real 7 GB opacity DB is not distributable inside CI, we run the
full Jupiter pipeline (profile parse -> hydrostatics -> DB interpolation ->
optics fusion -> Toon RT -> disk integration) on a synthetic database with
the same schema and dynamic range, asserting physical invariants and pinned
regression values.
"""

import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities import factory


@pytest.fixture(scope='module')
def connection(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('opa') / 'synthetic.db')
    wno = np.concatenate([np.linspace(100.0, 1900.0, 120),
                          np.linspace(2000.0, 18000.0, 300)])
    factory.build_synthetic_db(path, wno, ntemp=8, npress=6)
    return jdi.opannection(filename_db=path)


@pytest.fixture(scope='module')
def jupiter_case(connection):
    opa = connection
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(radius=1.0, radius_unit=jdi.u.Unit('Rjup'),
                 mass=1.0, mass_unit=jdi.u.Unit('Mjup'))
    case.star(opa, 5700, 0.0, 4.4, radius=1.0,
              radius_unit=jdi.u.Unit('Rsun'), semi_major=5.2,
              semi_major_unit=jdi.u.Unit('au'))
    case.atmosphere(filename=jdi.jupiter_pt(), sep=r'\s+')
    case.clouds(filename=jdi.jupiter_cld(), sep=r'\s+')
    return opa, case


def test_reflected_spectrum_physical(jupiter_case):
    opa, case = jupiter_case
    out = case.spectrum(opa, calculation='reflected', full_output=True)
    alb = out['albedo']
    assert alb.shape == (opa.nwno,)
    assert np.isfinite(alb).all()
    assert (alb >= 0).all() and (alb <= 1.05).all()
    assert 0 < out['bond_albedo'] < 1
    assert len(out['fpfs_reflected']) == opa.nwno
    # fp/fs for a 1 Rjup planet at 5.2 AU is ~1e-9 * albedo
    scale = (7.1492e9 / (5.2 * 1.495978707e13)) ** 2
    np.testing.assert_allclose(out['fpfs_reflected'], alb * scale)


def test_thermal_spectrum_physical(jupiter_case):
    opa, case = jupiter_case
    out = case.spectrum(opa, calculation='thermal')
    th = out['thermal']
    assert np.isfinite(th).all() and (th >= 0).all()
    # Jupiter profile spans ~110-400 K; the 100 cm^-1 grid edge misses the
    # far-IR tail so Teff lands somewhat below the bolometric value
    assert 30 < out['effective_temperature'] < 500


def test_transmission_spectrum_physical(jupiter_case):
    opa, case = jupiter_case
    out = case.spectrum(opa, calculation='transmission')
    rprs2 = out['transit_depth']
    assert np.isfinite(rprs2).all()
    rs = 6.957e10
    base = (7.1492e9 / rs) ** 2
    assert (rprs2 > base * 0.98).all()          # depth >= solid-disk depth
    assert (rprs2 < base * 1.3).all()           # atmosphere is thin vs Rp
    assert rprs2.std() > 0                      # spectral structure exists


def test_combined_calculation(jupiter_case):
    opa, case = jupiter_case
    out = case.spectrum(opa, calculation='thermal+reflected')
    assert 'albedo' in out and 'thermal' in out
    assert 'fpfs_total' in out


def test_exclude_mol_changes_spectrum(connection):
    opa = connection
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opa, 5700, 0.0, 4.4)
    df = pd.read_csv(jdi.jupiter_pt(), sep=r'\s+')
    case.atmosphere(df=df)
    full = case.spectrum(opa, calculation='reflected')['albedo']
    case.atmosphere(df=df, exclude_mol={'CH4': 0})
    no_ch4 = case.spectrum(opa, calculation='reflected')['albedo']
    assert not np.allclose(full, no_ch4)
    # removing an absorber can only brighten reflected light
    assert (no_ch4 >= full - 1e-8).all()


def test_patchy_clouds_mix(jupiter_case):
    opa, _ = jupiter_case
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opa, 5700, 0.0, 4.4)
    case.atmosphere(filename=jdi.jupiter_pt(), sep=r'\s+')
    case.clouds(filename=jdi.jupiter_cld(), sep=r'\s+')
    cloudy = case.spectrum(opa, calculation='reflected')['albedo']
    case.clouds(filename=jdi.jupiter_cld(), sep=r'\s+', do_holes=True,
                fhole=0.4, fthin_cld=0.0)
    patchy = case.spectrum(opa, calculation='reflected')['albedo']
    # the 'hole' column keeps the cloud's w0/g0 with opd scaled by fthin_cld
    # (reference semantics, optics.py:314-315) — emulate it explicitly
    cld = pd.read_csv(jdi.jupiter_cld(), sep=r'\s+')
    cld['opd'] = 0.0 * cld['opd']
    case.clouds(df=cld)
    hole = case.spectrum(opa, calculation='reflected')['albedo']
    expect = 0.6 * cloudy + 0.4 * hole
    np.testing.assert_allclose(patchy, expect, rtol=1e-6, atol=1e-9)


def test_raman_modes(jupiter_case):
    """All three raman treatments run end-to-end and differ sensibly
    (optics.py:286-306: oklopcic shifts, pollack table, none)."""
    opa, case = jupiter_case
    albs = {}
    for mode in ('none', 'pollack', 'oklopcic'):
        case.approx(raman=mode)
        if mode == 'oklopcic':
            # reference order: raman option must be set before star()
            # binds the shifted spectra (justdoit.py:1833-1841)
            case.star(opa, 5700, 0.0, 4.4, radius=1.0,
                      radius_unit=jdi.u.Unit('Rsun'), semi_major=5.2,
                      semi_major_unit=jdi.u.Unit('au'))
        out = case.spectrum(opa, calculation='reflected')
        alb = np.asarray(out['albedo'])
        assert np.isfinite(alb).all(), mode
        assert (alb >= 0).all() and (alb <= 1.2).all(), mode
        albs[mode] = alb
    case.approx()  # restore defaults
    # this grid stops at 0.556 um where the Pollack table is > 1, so the
    # 0.99999 cap (optics.py:301-306) makes pollack coincide with 'none';
    # oklopcic picks up sub-percent slope effects from the blackbody's
    # shifted/unshifted ratios.  The discriminating stellar-line case is
    # exercised in test_raman_oklopcic_f32_no_underflow.
    assert np.allclose(albs['pollack'], albs['none'], rtol=1e-4)
    assert np.allclose(albs['oklopcic'], albs['none'], rtol=0.02)


def test_raman_oklopcic_f32_no_underflow(jupiter_case):
    """The Oklopcic factor's un-normalized cross sections (~1e-53)
    underflow float32 to 0/0 = NaN; the scale-invariant normalization
    must keep f32 finite and matching f64, including rf < 1 regions
    driven by a stellar absorption line."""
    import jax
    from picaso_tpu import raman as raman_mod
    opa, case = jupiter_case
    wno_star = np.linspace(50.0, 40000.0, 20000)
    from picaso_tpu.constants import PLANCK_C1, PLANCK_C2
    flux = (np.pi * PLANCK_C1 * wno_star ** 3
            / (np.exp(PLANCK_C2 * wno_star / 5700.0) - 1.0))
    flux *= 1 - 0.8 * np.exp(-0.5 * ((wno_star - 15000) / 80.0) ** 2)
    shifts, _ = raman_mod.compute_stellar_shifts(
        np.asarray(opa.wno), opa.raman_db, wno_star, flux)
    args64 = (jnp.asarray(opa.wno), jnp.asarray(shifts),
              jnp.linspace(150.0, 900.0, 30),
              jnp.asarray(opa.raman_db['c'].values),
              jnp.asarray(opa.raman_db['ji'].values, jnp.int32),
              jnp.asarray(opa.raman_db['deltanu'].values))
    rf64 = np.asarray(raman_mod.raman_factor_oklopcic(*args64))
    with jax.enable_x64(False):
        args32 = tuple(jnp.asarray(np.asarray(a),
                                   jnp.int32 if a.dtype == jnp.int32
                                   else jnp.float32) for a in args64)
        rf32 = np.asarray(raman_mod.raman_factor_oklopcic(*args32),
                          np.float64)
    assert np.isfinite(rf32).all()
    assert (rf64 < 0.999).any()          # the line produces real dips
    assert np.abs(rf32 - rf64).max() < 1e-3
