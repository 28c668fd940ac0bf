"""Utility layers: contribution functions, model round-trip, references,
evolution tracks, plotting smoke tests."""

import matplotlib

matplotlib.use('Agg')

import os
import numpy as np
import pandas as pd
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu import justplotit as jpi
from picaso_tpu import io_utils
from picaso_tpu.opacities import factory
from picaso_tpu.references import References


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('opa') / 'synthetic.db')
    wno = np.linspace(2000.0, 15000.0, 100)
    factory.build_synthetic_db(path, wno, ntemp=6, npress=5)
    opa = jdi.opannection(filename_db=path)
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


def test_get_contribution(setup):
    opa, case = setup
    out = jdi.get_contribution(case, opa, at_tau=1)
    taus, cumsum_taus, tau_p = (out['taus_per_layer'],
                                out['cumsum_taus'],
                                out['tau_p_surface'])
    assert 'H2O' in taus and 'rayleigh' in taus and 'cloud' in taus
    assert 'H2He' in taus or 'H2H2' in taus
    for name, t in taus.items():
        assert t.shape == (60, opa.nwno)
        assert np.isfinite(t).all() and (t >= 0).all()
    for name, c in cumsum_taus.items():
        assert c.shape == (61, opa.nwno)
        assert (np.diff(c, axis=0) >= -1e-12).all()
    # tau=1 surfaces are inside the pressure grid where defined
    for name, p in tau_p.items():
        good = np.isfinite(p)
        if good.any():
            assert (p[good] >= 1e-7).all() and (p[good] <= 1.1e3).all()


def test_model_save_load_roundtrip(setup, tmp_path):
    opa, case = setup
    out = case.spectrum(opa, calculation='reflected+thermal')
    fn = str(tmp_path / 'model.h5')
    io_utils.save_model(fn, case, out, meta={'author': 'test'})
    case2, spectra, attrs = io_utils.load_model(fn, opannection=opa)
    np.testing.assert_allclose(spectra['albedo'], out['albedo'])
    assert attrs['author'] == 'test'
    # the reconstituted bundle reruns to the same spectrum
    out2 = case2.spectrum(opa, calculation='reflected')
    np.testing.assert_allclose(out2["albedo"], out["albedo"], rtol=1e-6)


def test_references():
    refs = References()
    assert len(refs.bib_dict) > 10
    rows, bibs = refs.get_opa(molecules=['H2O', 'CH4'])
    assert len(bibs) >= 1


def test_evolution_and_young_planets():
    out = jdi.evolution_track(mass=4, age=1e8)
    assert 100 < out['hot']['Teff'] < 3000
    allm = jdi.evolution_track(mass='all')
    assert '10Mj' in allm['cold']
    yp = jdi.young_planets()
    assert len(yp) > 10


def test_plotting_smoke(setup):
    opa, case = setup
    out = case.spectrum(opa, calculation='reflected+thermal',
                        full_output=True)
    jpi.spectrum(out['wavenumber'], out['albedo'], R=30)
    jpi.pt(out['full_output'])
    jpi.mixing_ratio(case.inputs['atmosphere']['profile'])
    contrib = jdi.get_contribution(case, opa)
    tau_p = contrib['tau_p_surface']
    jpi.photon_attenuation(tau_p, out['wavenumber'])
    jpi.molecule_contribution(contrib, opa, min_pressure=1e6, R=20)
    jpi.brightness_temperature(out['wavenumber'], out['thermal'])


def test_guillot_pt():
    case = jdi.inputs()
    case.gravity(gravity=10, gravity_unit=jdi.u.Unit('m/(s**2)'))
    df = case.guillot_pt(1000, T_int=150)
    assert (df['temperature'] > 500).all()
    assert df['temperature'].iloc[-1] > df['temperature'].iloc[0]


def test_justplotit_surface():
    """Every plot function renders on synthetic data without error."""
    import matplotlib
    matplotlib.use('Agg')
    from picaso_tpu import justplotit as jpi

    rng = np.random.default_rng(0)
    wno = np.linspace(1000, 10000, 50)
    flux = rng.uniform(0.5, 1.0, 50)
    jpi.spectrum(wno, flux, R=20)
    jpi.spectrum_hires(wno, flux)
    jpi.plot_errorbar(wno, flux, flux * 0.1)
    jpi.plot_multierror(wno, flux, dy_low=flux * 0.1, dy_up=flux * 0.1)
    be = jpi.bin_errors(wno[::5], wno, flux * 0.1)
    assert len(be) == len(wno[::5])
    jpi.brightness_temperature(wno, flux * 1e9)
    jpi.flux_at_top({'wavenumber': wno, 'thermal': flux})

    nlayer = 10
    full = {'layer': {'pressure': np.logspace(-4, 2, nlayer),
                      'temperature': np.linspace(500, 1500, nlayer),
                      'cloud': {'opd': rng.uniform(0, 1, (nlayer, 50)),
                                'g0': np.full((nlayer, 50), 0.8),
                                'w0': np.full((nlayer, 50), 0.9)}},
            'wavenumber': wno,
            'taugas': rng.uniform(0, 1, (nlayer, 50)),
            'taucld': rng.uniform(0, 1, (nlayer, 50)),
            'tauray': rng.uniform(0, 1, (nlayer, 50))}
    jpi.cloud(full)
    jpi.all_optics_1d(full)
    jpi.create_heat_map(full['taugas'])
    jpi.heatmap_taus({'H2O': full['taugas'], 'CH4': full['taucld']})
    jpi.species_contribution({'wavenumber': wno,
                              'taus_per_layer': {'H2O': full['taugas']}})
    import pandas as pd
    df = pd.DataFrame({'opd': rng.uniform(0, 1, nlayer * 50),
                       'g0': np.zeros(nlayer * 50) + 0.8,
                       'w0': np.zeros(nlayer * 50) + 0.9})
    jpi.plot_cld_input(50, nlayer, df=df)
    evo = {'hot': pd.DataFrame({'age_years': np.logspace(6, 9, 10),
                                'Teff1Mj': np.linspace(2000, 500, 10)})}
    jpi.plot_evolution(evo)
    jpi.phase_snaps({0.0: {'wavenumber': wno, 'thermal': flux},
                     1.5: {'wavenumber': wno, 'thermal': flux}})
    import matplotlib.pyplot as plt
    plt.close('all')


def test_model_io_parity_names():
    from picaso_tpu.io_utils import merge_models
    from picaso_tpu import justdoit as jdi

    wno = np.linspace(1000, 5000, 10)
    d1 = {'wavenumber': wno, 'albedo': np.ones(10)}
    d2 = {'wavenumber': wno, 'albedo': np.zeros(10)}
    m = merge_models([d1, d2])
    assert m['albedo'].shape == (2, 10)
    assert m['n_model'] == 2
    assert callable(jdi.output_xarray) and callable(jdi.input_xarray)


def test_tp_line_earth():
    from picaso_tpu import justdoit as jdi
    case = jdi.inputs()
    P = np.logspace(-6, 2, 80)
    prof = case.TP_line_earth(P)
    T = np.asarray(prof['temperature'])
    assert T.min() >= 10 and T.max() <= 1000
    # surface temperature near Tsfc, decreasing into the troposphere
    i_sfc = np.argmin(np.abs(P - 1.0))
    assert abs(T[i_sfc] - 294.0) < 10
    i_trop = np.argmin(np.abs(P - 0.199))
    assert T[i_trop] < T[i_sfc]
    # stratosphere warms upward (negative lapse rate)
    i_strat = np.argmin(np.abs(P - 0.01))
    assert T[i_strat] > T[i_trop]


def test_data_catalog():
    """Data-fetch catalog lists the reference's artifact families
    (data.py:71-265) without requiring network access."""
    from picaso_tpu import data
    cat = data.data_catalog()
    keys = ' '.join(cat.keys()).lower()
    for fam in ('opacit', 'stellar', 'virga', 'sonora'):
        assert fam in keys, f'missing {fam} family in catalog'
    env = data.check_environ(verbose=False)
    assert isinstance(env, (bool, str, dict, list, type(None)))


def test_photochem_gate():
    """Optional photochem dependency is cleanly gated (photochem.py)."""
    from picaso_tpu import photochem
    assert photochem.photochem_available() in (True, False)
    if not photochem.photochem_available():
        import pytest
        with pytest.raises(ImportError):
            photochem.EvoAtmosphereGasGiantPicaso()


def test_w17_data_and_classic_netcdf():
    """Bundled WASP-17 MIRI spectrum (justdoit.py:5505) reads through the
    classic-NetCDF path of ncio.read_netcdf."""
    from picaso_tpu.ncio import read_netcdf

    fn = jdi.w17_data()
    ds = read_netcdf(fn)
    depth = np.asarray(ds['transit_depth'].values)
    err = np.asarray(ds['transit_depth_error'].values)
    wl = np.asarray(ds.coords['central_wavelength'].values)
    assert depth.shape == err.shape == wl.shape
    assert 0.01 < depth.mean() < 0.02          # WASP-17b ~1.5% depth
    assert (err > 0).all()
    assert (np.diff(wl) > 0).all()


def test_hj_pt_3d_gated(tmp_path):
    with pytest.raises(FileNotFoundError):
        jdi.HJ_pt_3d(input_file=str(tmp_path / 'nope.pt'))


def test_plot_atmosphere(setup, tmp_path):
    """analyze.plot_atmosphere reads a saved model nc (analyze.py:1339)."""
    from picaso_tpu.analyze import plot_atmosphere

    opa, case = setup
    df = case.spectrum(opa, calculation='reflected')
    jdi.output_xarray(df, case, savefile=str(tmp_path / 'bf.nc'))
    fig, ax = plot_atmosphere(str(tmp_path), 'bf.nc',
                              gas_names=['H2O', 'CH4'])
    assert ax[0].yaxis_inverted()
    # overlay a second model on the same axes
    fig, ax = plot_atmosphere(str(tmp_path), 'bf.nc', fig=fig, ax=ax,
                              linestyle='--', color='r', label='alt')
    assert len(ax[0].lines) == 2


def test_pressure_grid_chemistry_handler_interpret_run(capsys):
    """Thin config-driven helpers (justdoit.py:2082/3249/4868)."""
    import pandas as pd

    case = jdi.inputs()
    p = case.pressure_grid({'min': {'value': 1e-6, 'unit': 'bar'},
                            'max': {'value': 100.0, 'unit': 'bar'},
                            'nlevel': 40, 'spacing': 'log'})
    assert len(p) == 40 and p[0] == pytest.approx(1e-6)
    lin = case.pressure_grid({'min': {'value': 1.0}, 'max': {'value': 5.0},
                              'nlevel': 5, 'spacing': 'linear'})
    np.testing.assert_allclose(lin, [1, 2, 3, 4, 5])

    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    pr = np.logspace(-6, 2, 30)
    case.atmosphere(df=pd.DataFrame({
        'pressure': pr, 'temperature': 1300 * (pr / 10) ** 0.1,
        'H2': 0.84 + 0 * pr, 'He': 0.16 + 0 * pr}))
    case.inputs['approx'].setdefault('chem_params', {})[
        'chem_method'] = 'visscher_1060'
    case.chemistry_handler()
    assert 'CH4' in case.inputs['atmosphere']['profile'].columns

    case.interpret_run()
    out = capsys.readouterr().out
    assert 'SUMMARY' in out and 'chem_method' in out


def test_api_long_tail_helpers():
    """merge_xarrays / check_units / find_press / justplotit nearest
    helpers (justdoit.py:657/664/1290, justplotit.py:682-872)."""
    # merge two band-limited outputs, ds1 wins on overlap
    d1 = {'wavenumber': np.array([100., 200., 300.]),
          'albedo': np.array([.1, .2, .3]), 'full_output': {'k': 1}}
    d2 = {'wavenumber': np.array([200., 250., 350.]),
          'albedo': np.array([.9, .25, .35])}
    m = jdi.merge_xarrays(d1, d2)
    np.testing.assert_allclose(m['wavenumber'],
                               [100., 200., 250., 300., 350.])
    np.testing.assert_allclose(m['albedo'], [.1, .2, .25, .3, .35])
    assert m['full_output'] == {'k': 1}

    assert jdi.check_units('cm') is not None
    assert jdi.check_units('not-a-unit') is None

    tau = np.array([[0.1, 0.2], [1.0, 0.5], [10., 3.]])
    press = np.array([1e-3, 1e-1, 1e1])
    at = jdi.find_press(1.0, tau, 2, press)
    assert at[0] == pytest.approx(0.1)
    assert 0.1 < at[1] < 10.0

    arr = np.array([3., 1., 2., 2., 5.])
    assert jpi.find_nearest_1d(arr, 2.1) == 3    # last duplicate wins
    assert jpi.find_nearest_old(arr, 2.1) == 2   # plain argmin
    mat = np.array([[1., 4.], [2., 2.], [2., 9.]])
    assert list(jpi.find_nearest_2d(mat, 2.0)) == [2, 1]
    x, y, z = jpi.lon_lat_to_cartesian(np.pi / 2, 0.0)
    assert x == pytest.approx(0.0, abs=1e-12) and y == pytest.approx(1.0)


def test_atmosphere_chem_kwargs_linear_mh(monkeypatch, tmp_path):
    """atmosphere(mh=..., chem_method=...) stores LINEAR metallicity and
    the grid lookup applies log10 + the relative-C/O convention
    (justdoit.py:2044/2112): mh=10 (10x solar) must select a feh_10
    grid file, not feh_00 — and certainly not a 'log_mh=10' one."""
    import picaso_tpu.refdata as refdata_mod

    ref = '/root/reference/reference'
    if not os.path.isdir(os.path.join(ref, 'chemistry',
                                      'visscher_grid_1060')):
        pytest.skip('reference 1060 grid set unavailable')
    monkeypatch.setenv('picaso_refdata', ref)

    picked = {}
    real = jdi._nearest_grid_file

    def spy(directory, prefix, log_mh, cto):
        out = real(directory, prefix, log_mh, cto)
        picked['file'] = os.path.basename(out)
        picked['log_mh'] = log_mh
        return out

    monkeypatch.setattr(jdi, '_nearest_grid_file', spy)
    pr = np.logspace(-6, 2, 20)
    case = jdi.inputs()
    case.atmosphere(df=pd.DataFrame({
        'pressure': pr, 'temperature': 1100 * (pr / 10) ** 0.1}),
        mh=10.0, cto_relative=1.0, chem_method='visscher_1060')
    assert picked['log_mh'] == pytest.approx(1.0)
    assert 'feh_10' in picked['file'] and '_co_10' in picked['file']
    assert 'CH4' in case.inputs['atmosphere']['profile'].columns


def test_nearest_grid_file_2121_decode():
    """The 2121 filename decode ('feh-0.3_co0.14') must survive the
    trailing '.txt' dot (regression: every file was skipped)."""
    d = '/root/reference/reference/chemistry/visscher_grid_2121'
    if not os.path.isdir(d):
        pytest.skip('reference 2121 grid set unavailable')
    f = os.path.basename(jdi._nearest_grid_file(d, 'sonora_2121grid',
                                                0.0, 0.458))
    assert 'feh0.0' in f and 'co0.46' in f


def test_parse_visscher_2121_header():
    """The 2121 headers write 'T(K)  P(bar)' without spaces — the unit
    tokens must not leak into the species list (regression: DataFrame
    shape mismatch when the external grid set is visible)."""
    d = '/root/reference/reference/chemistry/visscher_grid_2121'
    if not os.path.isdir(d):
        pytest.skip('reference 2121 grid set unavailable')
    fn = os.path.join(d, sorted(os.listdir(d))[0])
    df = jdi._parse_visscher_grid(fn)
    assert 'T(K)' not in df.columns and 'P(bar)' not in df.columns
    assert {'H2O', 'CH4', 'CO', 'temperature', 'pressure'} <= set(
        df.columns)
    assert df.shape[0] == 2121
