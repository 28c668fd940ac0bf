"""End-to-end spectrum pipeline against a synthetic reference-schema DB.

The analog of the reference golden-file test (tests/test_notebooks.py:55-143)
— since the real 7 GB opacity DB is not distributable inside CI, we run the
full Jupiter pipeline (profile parse -> hydrostatics -> DB interpolation ->
optics fusion -> Toon RT -> disk integration) on a synthetic database with
the same schema and dynamic range, asserting physical invariants and pinned
regression values.
"""

import numpy as np
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
