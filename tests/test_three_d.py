"""3D (disco-ball) spectra and phase curves."""

import numpy as np
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities import factory


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('opa') / 'synthetic.db')
    wno = np.linspace(1000.0, 12000.0, 120)
    factory.build_synthetic_db(path, wno, ntemp=8, npress=6)
    return jdi.opannection(filename_db=path)


def _gcm(nlevel=25, nlon=12, nlat=8, t_day=1000.0, t_night=700.0):
    pressure = np.logspace(-4, 2, nlevel)
    lon = np.linspace(-180, 180, nlon)
    lat = np.linspace(-85, 85, nlat)
    base = np.clip(900 * (pressure / 10) ** 0.08, 300, None)
    tmap = np.zeros((nlevel, nlon, nlat))
    for i, lo in enumerate(lon):
        for j, la in enumerate(lat):
            dayside = np.cos(np.radians(lo)) * np.cos(np.radians(la))
            tmap[:, i, j] = base * (1 + 0.2 * max(dayside, 0.0))
    data = {'pressure': pressure, 'lat': lat, 'lon': lon,
            'temperature': tmap,
            'H2O': np.zeros_like(tmap) + 1e-3,
            'CH4': np.zeros_like(tmap) + 3e-4,
            'H2': np.zeros_like(tmap) + 0.84,
            'He': np.zeros_like(tmap) + 0.155}
    return data


def test_uniform_3d_matches_1d_thermal(setup):
    """A horizontally-uniform 3D map must reproduce the 1D spectrum."""
    opa = setup
    data = _gcm(t_day=0, t_night=0)
    data['temperature'] = np.broadcast_to(
        np.clip(900 * (data['pressure'] / 10) ** 0.08, 300, None)[:, None,
                                                                  None],
        data['temperature'].shape).copy()

    case3 = jdi.inputs(calculation='browndwarf')
    case3.phase_angle(0, num_gangle=6, num_tangle=4)
    case3.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case3.atmosphere_3d(data)
    out3 = case3.spectrum(opa, calculation='thermal', dimension='3d')

    case1 = jdi.inputs(calculation='browndwarf')
    case1.phase_angle(0, num_gangle=6, num_tangle=4)
    case1.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    import pandas as pd
    case1.atmosphere(df=pd.DataFrame({
        'pressure': data['pressure'],
        'temperature': data['temperature'][:, 0, 0],
        'H2O': data['H2O'][:, 0, 0], 'CH4': data['CH4'][:, 0, 0],
        'H2': data['H2'][:, 0, 0], 'He': data['He'][:, 0, 0]}))
    out1 = case1.spectrum(opa, calculation='thermal')
    np.testing.assert_allclose(out3['thermal'], out1['thermal'], rtol=1e-6)


def test_hot_dayside_brightens_thermal(setup):
    opa = setup
    case = jdi.inputs(calculation='browndwarf')
    case.phase_angle(0, num_gangle=6, num_tangle=4)
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.atmosphere_3d(_gcm())
    hot = case.spectrum(opa, calculation='thermal', dimension='3d')
    cold = _gcm()
    cold['temperature'] = cold['temperature'] * 0.9
    case.atmosphere_3d(cold)
    colder = case.spectrum(opa, calculation='thermal', dimension='3d')
    assert (hot['thermal'] > colder['thermal']).all()


def test_reflected_3d_runs_and_is_physical(setup):
    opa = setup
    case = jdi.inputs()
    case.phase_angle(np.pi / 3, num_gangle=6, num_tangle=4)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opa, 5700, 0.0, 4.4)
    case.atmosphere_3d(_gcm())
    out = case.spectrum(opa, calculation='reflected', dimension='3d')
    alb = out['albedo']
    assert np.isfinite(alb).all()
    assert (alb >= 0).all() and (alb <= 1.1).all()


def test_thermal_phase_curve(setup):
    """Thermal phase curve of a day-night contrast map: same geometry at
    each phase (flux emitted at all angles), flat curve for a static map."""
    opa = setup
    case = jdi.inputs(calculation='browndwarf')
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.phase_angle(phase_grid=np.array([0.0, np.pi / 2, np.pi]),
                     num_gangle=6, num_tangle=4, calculation='thermal')
    case.atmosphere_3d(_gcm())
    allout = case.phase_curve(opa, verbose=False)
    assert len(allout) == 3
    fluxes = {ph: out['thermal'].mean() for ph, out in allout.items()}
    assert all(np.isfinite(v) for v in fluxes.values())


def test_atmosphere_4d_rotation():
    """atmosphere_4d rolls the hotspot by phase+shift (justdoit.py:3666)."""
    case = jdi.inputs(calculation='browndwarf')
    case.phase_angle(phase_grid=np.array([0.0, np.pi]),
                     num_gangle=6, num_tangle=4, calculation='thermal')
    data = _gcm()
    profiles = case.atmosphere_4d(data, shift=np.zeros(2), verbose=False,
                                  zero_point='secondary_eclipse')
    assert len(profiles) == 2
    # phase 0, zero shift: unrotated
    assert np.allclose(profiles[0]['temperature'], data['temperature'])
    # phase pi: hotspot (max T at fixed level) moves ~180 deg in lon
    lon = data['lon']
    t0 = profiles[0]['temperature'][0, :, 3]
    t1 = profiles[1]['temperature'][0, :, 3]
    i0, i1 = np.argmax(t0), np.argmax(t1)
    dlon = abs((lon[i1] - lon[i0] + 180) % 360 - 180)
    assert abs(dlon - 180) <= 2 * abs(lon[1] - lon[0])
    # night_transit zero point adds another 180 for thermal
    prof_nt = case.atmosphere_4d(data, verbose=False,
                                 zero_point='night_transit')
    assert np.allclose(prof_nt[0]['temperature'],
                       profiles[1]['temperature'])


def test_clouds_4d_facets():
    case = jdi.inputs(calculation='browndwarf')
    case.phase_angle(phase_grid=np.array([0.0, np.pi / 2]),
                     num_gangle=6, num_tangle=4, calculation='thermal')
    data = _gcm(nlevel=25)
    case.atmosphere_4d(data, verbose=False, zero_point='secondary_eclipse')
    nlayer, nwno_cld = 24, 10
    rng = np.random.default_rng(0)
    cld = {'lat': data['lat'], 'lon': data['lon'],
           'wavenumber': np.linspace(1e4 / 2, 1e4 / 0.3, nwno_cld),
           'opd': rng.uniform(0, 1, (nlayer, nwno_cld, 12, 8)),
           'g0': np.full((nlayer, nwno_cld, 12, 8), 0.8),
           'w0': np.full((nlayer, nwno_cld, 12, 8), 0.9)}
    per_phase = case.clouds_4d(cld, verbose=False)
    assert len(per_phase) == 2
    for d in per_phase:
        assert d['opd'].shape == (nlayer, nwno_cld, 6, 4)
        assert np.isfinite(d['opd']).all()


def test_phase_curve_4d(setup):
    """Full 4D path: rotated profiles through phase_curve (hot spot moves
    in and out of view -> non-flat thermal curve)."""
    opa = setup
    case = jdi.inputs(calculation='browndwarf')
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.phase_angle(phase_grid=np.array([0.0, np.pi]),
                     num_gangle=6, num_tangle=4, calculation='thermal')
    case.atmosphere_4d(_gcm(), verbose=False,
                       zero_point='secondary_eclipse')
    allout = case.phase_curve(opa, verbose=False)
    vals = [out['thermal'].mean() for out in allout.values()]
    assert all(np.isfinite(v) for v in vals)
    assert abs(vals[0] - vals[1]) / vals[0] > 1e-3


def test_chemeq_3d_vectorized():
    """chemeq_3d post-processes equilibrium chemistry onto every GCM
    column in one vectorized call (justdoit.py:3590 analog)."""
    case = jdi.inputs(calculation='browndwarf')
    data = _gcm(nlevel=25)
    case.atmosphere_3d(data)
    out = case.chemeq_3d(log_mh=0.0, cto_absolute=0.55)
    assert 'H2O' in out and out['H2O'].shape == (25, 12, 8)
    assert np.isfinite(out['H2O']).all() and (out['H2O'] > 0).all()
    # hotter dayside column should differ from nightside chemistry
    assert not np.allclose(out['CH4'][:, 0, 3], out['CH4'][:, 6, 3])
    # matches the 1D path column-by-column
    case1 = jdi.inputs(calculation='browndwarf')
    import pandas as pd
    case1.atmosphere(df=pd.DataFrame({
        'pressure': data['pressure'],
        'temperature': data['temperature'][:, 6, 3]}))
    df1 = None
    case1.chemeq_visscher_1060(cto_relative=0.55 / 0.55, log_mh=0.0)
    df1 = case1.inputs['atmosphere']['profile']
    np.testing.assert_allclose(out['CH4'][:, 6, 3], df1['CH4'],
                               rtol=2e-5)


def test_premix_3d_requires_ck():
    case = jdi.inputs(calculation='browndwarf')
    case.atmosphere_3d(_gcm(nlevel=25))

    class NoCk:
        ck = None
    with pytest.raises(ValueError):
        case.premix_3d(NoCk())
