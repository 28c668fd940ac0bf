"""Disequilibrium, cloudy, and moist climate workflows (small/fast cases)."""

import numpy as np
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities.ck import synthetic_ck_table


def _setup_case(teff=700, nlevel=31, moist=False):
    ck = synthetic_ck_table(with_per_gas=True)
    opa = jdi.opannection(ck_table=ck)
    case = jdi.inputs(calculation='browndwarf', climate=True)
    case.effective_temp(teff)
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    pressure = np.logspace(-4, 2.5, nlevel)
    temp_guess = np.clip(teff * 1.2 * (pressure / 30) ** 0.1, 250, None)
    case.inputs_climate(temp_guess=temp_guess, pressure=pressure,
                        rcb_guess=28, rfacv=0.0, moistgrad=moist)
    return opa, case


@pytest.mark.slow
def test_diseq_climate_runs():
    opa, case = _setup_case()
    case.inputs['approx']['chem_params']['quench'] = True
    out = case.climate(opa, diseq_chem=True, verbose=False)
    temp = out['temperature']
    assert np.isfinite(temp).all()
    assert (np.diff(temp[5:]) > -1e-6).all()
    assert 'kzz' in out
    assert np.isfinite(out['kzz']).all() and (out['kzz'] > 0).all()


@pytest.mark.slow
def test_cloudy_climate_runs():
    """H2O at Teff=400 never condenses on this profile: the OPD stays
    identically zero, which upstream hangs the `taudif < taudif_tol`
    flag forever (0 < 0, climate.py:3228) — our gate treats an exactly
    unchanged cloud as converged."""
    opa, case = _setup_case(teff=400)
    case.inputs['climate']['cloudy'] = True
    case.inputs['climate']['virga_kwargs'] = {
        'condensates': ['H2O'], 'fsed': 3.0, 'mh': 1.0, 'mmw': 2.2}
    out = case.climate(opa, verbose=False)
    assert np.isfinite(out['temperature']).all()
    assert 'cld_df' in out
    assert out['cld_df']['opd'].sum() >= 0
    assert out['converged']


@pytest.mark.slow
def test_cloudy_climate_forming_cloud_converges():
    """A case whose cloud actually forms (silicate+iron at Teff=1300)
    must converge through the 4-step OPD-history damping
    (climate.py:2882-2915) and return a nonzero averaged cloud."""
    opa, case = _setup_case(teff=1300)
    case.inputs['climate']['cloudy'] = True
    case.inputs['climate']['virga_kwargs'] = {
        'condensates': ['Mg2SiO4', 'Fe'], 'fsed': 2.0, 'mh': 1.0,
        'mmw': 2.2}
    out = case.climate(opa, verbose=False)
    assert np.isfinite(out['temperature']).all()
    assert out['converged']
    assert out['cld_df']['opd'].sum() > 0


@pytest.mark.slow
def test_moist_climate_runs():
    opa, case = _setup_case(teff=350, moist=True)
    out = case.climate(opa, verbose=False)
    assert np.isfinite(out['temperature']).all()


def test_energy_injection_tidal():
    """Chapman deposition conserves total injected energy (fluxes.py:3671)."""
    from picaso_tpu.climate.core import chapman, tidal_flux

    nlevel = 40
    pressure = np.logspace(-6, 2, nlevel)
    colden = np.diff(pressure) * 1e6 / 1e4
    teff = 500.0
    base = tidal_flux(teff, nlevel)
    assert np.allclose(base, base[0]) and base[0] < 0

    inj = dict(total_energy=1e5, press_max=0.1, hratio=1.0,
               inject_beam=False)
    t = tidal_flux(teff, nlevel, pressure=pressure, colden=colden,
                   injection=inj)
    # TOA sink deepens by the injected luminosity (everything deposited
    # below must escape through the top); the bottom level returns to
    # the pure internal-heat sink
    assert np.isclose(t[0], base[0] - 1e5)
    assert np.isclose(t[-1], base[0])
    # cumulative deposition is monotonic toward depth
    assert np.all(np.diff(t) >= -1e-9)
    # chapman peaks at p = pm
    p = np.logspace(-3, 1, 200)
    c = chapman(p, 0.1, 1.0)
    assert abs(p[np.argmax(c)] - 0.1) / 0.1 < 0.1

    beam = np.zeros(nlevel)
    beam[10:20] = 3.0
    tb = tidal_flux(teff, nlevel, injection=dict(
        inject_beam=True, beam_profile=beam))
    assert np.isclose(base[0] - tb[0], beam.sum())


def test_convert_flux_units_roundtrip():
    from picaso_tpu.justdoit import convert_flux_units
    from picaso_tpu.constants import C_LIGHT

    wno = np.linspace(2000.0, 10000.0, 30)
    f = np.linspace(1.0, 5.0, 30) * 1e4   # erg/cm2/s/cm
    jy = convert_flux_units(wno, f, 'Jy')
    lam = 1.0 / wno
    expect = (f * lam ** 2 / C_LIGHT / 1e-23)[::-1]
    np.testing.assert_allclose(jy, expect, rtol=1e-12)
    back = convert_flux_units(1e4 * lam[::-1], jy, 'erg*cm^(-3)*s^(-1)',
                              xgrid_unit='um', f_unit='Jy')
    np.testing.assert_allclose(back, f[::-1], rtol=1e-12)
    flam = convert_flux_units(wno, f, 'FLAM')
    np.testing.assert_allclose(flam, (f * 1e-8)[::-1], rtol=1e-12)


def test_host_path_threads_moist_adiabat():
    """The diseq/cloudy HOST path must thread the current condensable
    abundances into the moist re-stitch (regression: it re-stitched dry
    and left cond_abunds at zero, silently degenerating moistgrad=True
    to the dry solve)."""
    import pandas as pd
    from picaso_tpu.climate import core
    from picaso_tpu.climate.api import (_ClimateState, _reconstruct_host,
                                        _update_cond_abunds)

    opa, case = _setup_case(teff=300, moist=True)
    tidal = core.tidal_flux(300.0, 31)
    state = _ClimateState(case, opa, tidal, 1.0, 0.0, 80.0, 4000.0,
                          moist=True, verbose=False)
    assert state.condensables, 'chem grid must expose condensables'

    pressure = np.logspace(-4, 2.5, 31)
    temp = np.clip(380.0 * (pressure / 30) ** 0.1, 250, None)
    nstr = [0, 12, 29, 0, 0, 0]

    t_dry = _reconstruct_host(
        type('S', (), {'moist': False, 'condensables': (),
                       'data': state.data, 'adiabat': state.adiabat,
                       '_config_base': state._config_base})(),
        temp, pressure, nstr, 1)

    # saturated condensables -> the moist gradient must change the
    # stitched convective profile
    df = pd.DataFrame({'pressure': pressure, 'temperature': temp})
    for c in state.condensables:
        df[c] = 5e-3
    _update_cond_abunds(state, df)
    assert float(np.max(np.asarray(state.data.cond_abunds))) > 0
    t_moist = _reconstruct_host(state, temp, pressure, nstr, 1)
    conv = slice(nstr[1] + 1, nstr[2])
    assert np.max(np.abs(t_moist[conv] - t_dry[conv])) > 0.1
    # moist adiabat is shallower: cooler (or equal) at depth
    assert t_moist[-1] <= t_dry[-1] + 1e-9
