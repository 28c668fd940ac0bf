"""Samplers, grid fitting, parameterizations, and the TOML retrieval
driver, end to end on synthetic data."""

import matplotlib

matplotlib.use('Agg')

import numpy as np
import pandas as pd
import pytest

from picaso_tpu import driver, justdoit as jdi, retrieval
from picaso_tpu.analyze import GridFitter
from picaso_tpu.opacities import factory
from picaso_tpu.parameterizations import Parameterize
from picaso_tpu.sampler import ensemble_sample, nested_sample


# ---------------------------------------------------------------------------
# samplers on analytic problems
# ---------------------------------------------------------------------------

def test_ensemble_recovers_gaussian():
    mu = np.array([1.0, -2.0])
    sig = np.array([0.5, 1.5])

    def logp(x):
        return -0.5 * np.sum((x - mu) ** 2 / sig ** 2, axis=-1)

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((32, 2))
    chain, lps = ensemble_sample(logp, p0, 600, seed=1)
    flat = chain[300:].reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), mu, atol=0.15)
    np.testing.assert_allclose(flat.std(0), sig, rtol=0.2)


def test_nested_gaussian_evidence():
    """Unit-cube gaussian: ln Z known analytically."""
    sig = 0.05
    mu = 0.5

    def loglike(x):
        x = np.atleast_2d(x)
        return (-0.5 * np.sum((x - mu) ** 2, axis=1) / sig ** 2
                - 0.5 * x.shape[1] * np.log(2 * np.pi * sig ** 2))

    res = nested_sample(loglike, lambda u: u, 2, nlive=150, seed=2,
                        dlogz=0.1)
    # analytic: Z = integral of the gaussian over the unit square ~ 1
    assert abs(res.logz) < 0.3, res.logz
    mean = (res.samples * res.weights[:, None]).sum(0)
    np.testing.assert_allclose(mean, [mu, mu], atol=0.02)


def test_nested_multimodal_correlated():
    """Correlated bimodal 3D mixture: evidence and mode masses known
    (the multimodal case the round-1 random-walk sampler couldn't handle
    — multi-ellipsoid bounds track both modes)."""
    m1 = np.array([0.3, 0.3, 0.3])
    m2 = np.array([0.72, 0.72, 0.72])
    sig = 0.04
    rho = 0.7
    cov = sig ** 2 * (np.full((3, 3), rho) + (1 - rho) * np.eye(3))
    icov = np.linalg.inv(cov)
    lognorm = -0.5 * (3 * np.log(2 * np.pi)
                      + np.log(np.linalg.det(cov)))
    w1, w2 = 0.65, 0.35

    def loglike(x):
        x = np.atleast_2d(x)
        d1, d2 = x - m1, x - m2
        l1 = -0.5 * np.einsum('ij,jk,ik->i', d1, icov, d1) + lognorm
        l2 = -0.5 * np.einsum('ij,jk,ik->i', d2, icov, d2) + lognorm
        return np.logaddexp(np.log(w1) + l1, np.log(w2) + l2)

    res = nested_sample(loglike, lambda u: u, 3, nlive=400, seed=5,
                        dlogz=0.05)
    # analytic: both normalized gaussians lie within the cube -> Z ~ 1
    assert abs(res.logz) < 0.35, res.logz
    # both modes present with ~the right posterior mass
    d_to_1 = np.linalg.norm(res.samples_equal - m1, axis=1)
    d_to_2 = np.linalg.norm(res.samples_equal - m2, axis=1)
    frac1 = float((d_to_1 < d_to_2).mean())
    assert 0.5 < frac1 < 0.8, frac1
    # and the in-mode correlation structure is recovered
    in1 = res.samples_equal[d_to_1 < d_to_2]
    corr = np.corrcoef(in1.T)[0, 1]
    assert 0.4 < corr < 0.95, corr


def test_nested_dynamic_batches():
    """dynamic=True adds posterior-focused live points: evidence is
    consistent and effective sample size improves."""
    sig = 0.05

    def loglike(x):
        x = np.atleast_2d(x)
        return (-0.5 * np.sum((x - 0.5) ** 2, axis=1) / sig ** 2
                - 0.5 * x.shape[1] * np.log(2 * np.pi * sig ** 2))

    static = nested_sample(loglike, lambda u: u, 2, nlive=120, seed=7,
                           dlogz=0.1)
    dyn = nested_sample(loglike, lambda u: u, 2, nlive=120, seed=7,
                        dlogz=0.1, dynamic=True)
    assert abs(dyn.logz) < 0.4, dyn.logz
    assert abs(dyn.logz - static.logz) < 0.4
    assert dyn.ess > 1.2 * static.ess, (dyn.ess, static.ess)


def test_nested_checkpoint_resume(tmp_path):
    def loglike(x):
        x = np.atleast_2d(x)
        return -0.5 * np.sum((x - 0.5) ** 2, axis=1) / 0.1 ** 2

    ck = str(tmp_path / 'ns.ckpt')
    res1 = nested_sample(loglike, lambda u: u, 2, nlive=100, seed=3,
                         max_iter=150, checkpoint_file=ck)
    res2 = nested_sample(loglike, lambda u: u, 2, nlive=100, seed=3,
                         checkpoint_file=ck, resume=True, dlogz=0.1)
    assert res2.niter > 100
    assert np.isfinite(res2.logz)


# ---------------------------------------------------------------------------
# parameterizations
# ---------------------------------------------------------------------------

def test_parameterize_pt_forms():
    par = Parameterize(nlevel=60)
    iso = par.pt_isothermal(800)
    assert (iso == 800).all()
    knots = par.pt_knots([1e-4, 1e-1, 1e2], [200, 500, 1500])
    assert knots[0] < knots[-1]
    ms = par.pt_madhu_seager_09_noinversion(0.6, 0.5, 1e-3, 1.0, 1600)
    assert np.isfinite(ms).all()
    assert abs(ms[-1] - 1600) < 1e-6
    inv = par.pt_madhu_seager_09_inversion(0.6, 0.5, 1e-3, 1e-2, 1.0, 1600)
    assert np.isfinite(inv).all()
    zj = par.pt_zj24([1e-4, 1e-2, 1e0, 1e2], [100, 200, 300], 2000)
    assert zj[0] < zj[-1]


def test_parameterize_chem_and_clouds():
    par = Parameterize(nlevel=40)
    df = par.chem_free(H2O=-3, CH4=-4)
    total = df.drop(columns='pressure').sum(axis=1)
    np.testing.assert_allclose(total, 1.0, rtol=1e-10)
    deck = par.deck_decay(1.0)
    assert deck['opd'].max() == pytest.approx(10.0)
    slab = par.slab_decay(0.01, 1.0, 5.0, alpha=2.0)
    assert slab['opd'].sum() > 0


# ---------------------------------------------------------------------------
# grid fitter
# ---------------------------------------------------------------------------

def test_grid_fitter_identifies_truth():
    wno = np.linspace(1000, 10000, 200)
    temps = np.array([500.0, 700.0, 900.0, 1100.0])
    spectra = np.array([t * (1 + 0.3 * np.sin(wno / 1500 + t / 300))
                        for t in temps])
    fitter = GridFitter('toy', models={'wavenumber': wno,
                                       'spectra': spectra},
                        grid_parameters=pd.DataFrame({'teff': temps}),
                        verbose=False)
    wl = 1e4 / np.linspace(1500, 9500, 40)
    truth = spectra[2]
    y = np.interp(1e4 / wl, wno, truth)
    res = fitter.fit_grid('toy', 'obs', wl, y, y * 0 + 10.0)
    assert res['best_fit_index'] == 2
    best = fitter.best_fit('toy', 'obs')
    assert best['parameters']['teff'] == 900.0
    vals, probs = fitter.parameter_posteriors('toy', 'obs', 'teff')
    assert vals[np.argmax(probs)] == 900.0
    interp = fitter.interp_models(['teff'], [800.0])
    assert interp.shape == (200,)


def test_grid_fitter_best_fit_reporting():
    """print_best_fit / plot_best_fit / plot_chi_posteriors
    (analyze.py:389-612 long tail)."""
    import matplotlib
    matplotlib.use('Agg')

    wno = np.linspace(1000, 10000, 120)
    temps = np.repeat([500.0, 800.0], 2)
    gravs = np.tile([100.0, 300.0], 2)
    spectra = np.array([t * (1 + 0.2 * np.sin(wno / 1200 + g / 100))
                        for t, g in zip(temps, gravs)])
    fitter = GridFitter('toy', models={'wavenumber': wno,
                                       'spectra': spectra},
                        grid_parameters=pd.DataFrame({'teff': temps,
                                                      'grav': gravs}),
                        verbose=False)
    wl = 1e4 / np.linspace(1500, 9500, 30)
    y = np.interp(1e4 / wl, wno, spectra[1])
    fitter.fit_grid('toy', 'obs', wl, y, y * 0 + 5.0)

    best = fitter.print_best_fit('toy', 'obs', verbose=False)
    assert best == {'teff': 500.0, 'grav': 300.0}

    fig, ax = fitter.plot_best_fit('toy', 'obs')
    assert 'A' in ax and 'B' in ax
    import matplotlib.pyplot as plt
    plt.close(fig)

    fig2, post = fitter.plot_chi_posteriors('toy', 'obs')
    assert set(post) == {'teff', 'grav'}
    vals, probs = post['teff']
    assert vals[np.argmax(probs)] == 500.0
    np.testing.assert_allclose(probs.sum(), 1.0)
    plt.close(fig2)
    # get_chi_posteriors is the reference-named alias
    v2, p2 = fitter.get_chi_posteriors('toy', 'obs', 'grav')
    assert v2[np.argmax(p2)] == 300.0


# ---------------------------------------------------------------------------
# TOML driver end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def toml_config(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('opa') / 'synthetic.db')
    wno = np.linspace(1500.0, 15000.0, 80)
    factory.build_synthetic_db(path, wno, ntemp=6, npress=5)
    config = driver.load_toml(jdi.refdata_path('input_tomls',
                                               'driver_example.toml'))
    config['OpticalProperties']['opacity_files'] = path
    config['OpticalProperties']['wave_range'] = None
    config['temperature']['pressure']['nlevel'] = 30
    return config


def test_driver_spectrum_mode(toml_config, tmp_path):
    config = dict(toml_config, calc_type='spectrum',
                  observation_type='transmission')
    case, out = driver.run(config)
    assert np.isfinite(out['transit_depth']).all()
    # dashboard (driver.py:713-741)
    fig = driver.viz(case, out, savefile=str(tmp_path / 'dash.png'))
    assert (tmp_path / 'dash.png').exists()


def test_driver_climate_mode(tmp_path):
    """TOML-driven RCE climate (calc_type='climate') — the reference's
    driver leaves this NYI (driver.py:67-69); here it runs end-to-end."""
    import h5py
    from picaso_tpu.opacities.ck import synthetic_ck_table

    # write a premixed CK table in the reference hdf5 format on the
    # 196-pt grid (so the bundled continuum DB matches)
    tbl = synthetic_ck_table()
    arr = tbl.arrays
    npress, ntemp = len(tbl.pressures), len(tbl.temps)
    fn = str(tmp_path / 'premixed_196.hdf5')
    with h5py.File(fn, 'w') as f:
        f.create_dataset('ck_molecules',
                         data=[m.encode() for m in tbl.molecules])
        f.create_dataset('wno', data=tbl.wno)
        f.create_dataset('delta_wno', data=tbl.delta_wno)
        f.create_dataset('pressures',
                         data=np.tile(tbl.pressures, ntemp))
        f.create_dataset('temperatures',
                         data=np.repeat(tbl.temps, npress))
        f.create_dataset('gauss_pts', data=tbl.gauss_pts)
        f.create_dataset('gauss_wts', data=tbl.gauss_wts)
        f.create_dataset('kcoeffs', data=np.asarray(arr.ln_kappa))
        ab = tbl.full_abunds
        mols = [c for c in ab.keys()
                if c not in ('pressure', 'temperature')]
        f.create_dataset('abunds',
                         data=np.column_stack([ab[m] for m in mols]))
        f.create_dataset('abunds_map', data=[m.encode() for m in mols])

    config = {
        'calc_type': 'climate',
        'OpticalProperties': {'ck_db': fn,
                              'opacity_method': 'preweighted'},
        'object': {'gravity': {'value': 100.0, 'unit': 'm/(s**2)'}},
        'climate': {'teff': 700.0, 'nlevel': 31, 'logp_top': -4.0,
                    'logp_bottom': 2.5, 'rcb_guess': 28, 'rfacv': 0.0},
    }
    case, out = driver.run(config, verbose=False)
    assert np.isfinite(out['temperature']).all()
    assert out['converged'] == 1
    assert (np.diff(out['temperature'][5:]) > -1e-6).all()

    # irradiated setup: the star block must produce a properly-scaled
    # relative flux, sum(F0PI bins) ~ band-limited sigma*T^4 (r/a)^2
    from picaso_tpu.opacities.ck import synthetic_ck_table
    from picaso_tpu.climate.core import SIGMA_SB
    config_irr = dict(config, irradiated=True)
    config_irr['star'] = {
        'grid': {'teff': 5600.0},
        'radius': {'value': 1.0, 'unit': 'Rsun'},
        'semi_major': {'value': 0.05, 'unit': 'au'}}
    config_irr['climate'] = dict(config['climate'], rfacv=0.5)
    case2, opa2 = driver.setup_climate_class(config_irr)
    assert case2.inputs['climate']['rfacv'] == 0.5
    rf = np.asarray(opa2.relative_flux)
    total = (SIGMA_SB * 5600.0 ** 4
             * ((1.0 * 6.957e10) / (0.05 * 1.496e13)) ** 2)
    assert 0.05 * total < rf.sum() < 1.1 * total


def test_driver_retrieval_recovers_temperature(toml_config):
    config = dict(toml_config)
    # generate truth data at T=1000, logH2O=-3
    case, opa, _ = driver.setup_spectrum_class(config)
    truth = case.spectrum(opa, calculation='transmission')
    wl = 1e4 / np.asarray(truth['wavenumber'])
    y = np.asarray(truth['transit_depth'])
    e = y * 0 + y.std() * 0.05
    res = driver.run(config, data=(wl, y, e), sampler='nested', nlive=25,
                     max_iter=60, verbose=False, dlogz=5.0, walks=5)
    info = retrieval.get_info(res)
    t_med = info['temperature.isothermal.T']['median']
    assert 700 < t_med < 1350, info
    # posterior tooling smoke
    retrieval.plot_pair(res)
    print(retrieval.summary(res))


def test_create_template(tmp_path):
    path = retrieval.create_template('free', output_dir=str(tmp_path))
    text = open(path).read()
    assert 'driver.run' in text
    compile(text, path, 'exec')


def test_detection_test_sigma():
    """Gaussian vs line evidence comparison detects an injected feature."""
    from picaso_tpu.analyze import detection_test, sigma

    rng = np.random.default_rng(5)
    wl = np.linspace(1.0, 2.0, 60)
    e = np.full(60, 5.0)  # ppm-ish
    feature = 80.0 * np.exp(-(wl - 1.4) ** 2 / 0.05 ** 2)
    model_exclude = 1000.0 + 0 * wl
    model_full = model_exclude + feature / 1e6
    y = model_exclude + feature / 1e6 + rng.normal(0, e / 1e6 * 0)
    # residuals in the same 1e-6 scaling the reference uses
    res = detection_test(wl, y * 0 + feature / 1e6, e / 1e6,
                         model_full - model_exclude, wl * 0,
                         1.0, 2.0, nlive=80, max_iter=1200, seed=1)
    assert res['logZ_single'] > res['logZ_line']
    assert res['sigma_single_v_line'] > 3.0
    s, lnb = sigma(10.0, 0.0)
    assert s > 3.5 and abs(lnb - 10.0) < 1e-12


def test_gridtrieval_multilinear():
    """custom_interp reproduces a linear response exactly at off-grid
    points (multilinear interpolation on a full-factorial grid)."""
    from picaso_tpu.analyze import GridFitter

    wno = np.linspace(1000, 5000, 12)
    t_axis = np.array([500.0, 1000.0, 1500.0])
    m_axis = np.array([0.0, 1.0])
    rows, specs = [], []
    for t in t_axis:
        for m in m_axis:
            rows.append({'teff': t, 'mh': m})
            specs.append(t * 1e-4 + m * 0.3 + 0 * wno)
    fitter = GridFitter('toy', models={'wavenumber': wno,
                                       'spectra': np.array(specs)},
                        grid_parameters=pd.DataFrame(rows), verbose=False)
    fitter.prep_gridtrieval(['teff', 'mh'])
    got = fitter.custom_interp([750.0, 0.25])
    np.testing.assert_allclose(got, 750 * 1e-4 + 0.25 * 0.3, rtol=1e-12)
    # clamped outside the hull
    got = fitter.custom_interp([10000.0, -5.0])
    np.testing.assert_allclose(got, 1500 * 1e-4 + 0.0, rtol=1e-12)
    # incomplete grids are rejected
    fitter2 = GridFitter('toy2', models={'wavenumber': wno,
                                         'spectra': np.array(specs[:-1])},
                         grid_parameters=pd.DataFrame(rows[:-1]),
                         verbose=False)
    with pytest.raises(ValueError):
        fitter2.prep_gridtrieval(['teff', 'mh'])


def test_get_evaluations_bands():
    """Posterior bands + max-logL chi-square (retrieval.py:199-368)."""
    import pandas as pd
    from picaso_tpu import retrieval

    wno = np.linspace(1000, 2000, 30)

    class Toy:
        def __init__(self, t):
            self.inputs = {'atmosphere': {'profile': pd.DataFrame({
                'pressure': np.logspace(-4, 2, 10),
                'temperature': np.full(10, 500.0 + t[0]),
                'H2O': np.full(10, 1e-3),
                'CO2': np.full(10, 1e-6)})}}

    def model(theta, return_ptchem=False):
        if return_ptchem:
            return Toy(theta)
        return wno, np.full(30, 1.0 + theta[0]), {}, 0.0

    samples = np.random.default_rng(0).normal(0, 0.1, (200, 1))
    best = samples[np.argmax(samples[:, 0])]
    ev = retrieval.get_evaluations(samples, best, model, 25)
    bs = ev['bands_spectra']
    assert bs['1sig_lo'].shape == (30,)
    assert (bs['1sig_lo'] <= bs['median']).all()
    assert (bs['median'] <= bs['1sig_hi']).all()
    assert (bs['1sig_hi'] <= bs['3sig_hi']).all()
    assert ev['bands_ptchem']['temperature']['median'].shape == (10,)
    assert ev['max_logl_spectra'].max() > bs['median'].mean()
    chis = retrieval.get_chisq_max(
        ev, {'d1': (np.linspace(1100, 1900, 12),
                    np.full(12, 1.0), np.full(12, 0.1))})
    assert np.isfinite(chis['chisq_per_datapt'])

    # band plots over the same evaluations dict (retrieval.py:370-455)
    fig, ax = retrieval.plot_spectra_bands(ev)
    assert len(ax.collections) == 2 and len(ax.lines) == 2
    fig, ax = retrieval.plot_pressure_bands(ev, 'temperature')
    assert ax.yaxis_inverted()
    fig, ax = retrieval.plot_pressure_bands(ev, 'H2O')
    assert ax.get_xscale() == 'log'


# ---------------------------------------------------------------------------
# condensate Mie parameterizations (cloud_flex_fsed / cloud_brewster_mie)
# ---------------------------------------------------------------------------

def _write_mieff(path, nwave=12, nrad=6, qe=2.0, qs=1.8, g=0.5):
    """Synthetic virga .mieff file: uniform efficiencies so the
    distribution-integrated w0/g0 are known in closed form."""
    wave = np.linspace(0.5, 5.0, nwave)
    radii = np.logspace(-6, -3, nrad)          # cm
    with open(path, 'w') as f:
        f.write(f'{nwave} {nrad}\n')
        for r in radii:
            f.write(f'{r:.6e}\n')
            for w in wave:
                # cos_qscat column stores g*qscat (.mieff convention)
                f.write(f'{w:.6e} {qs:.6e} {qe:.6e} {g * qs:.6e}\n')
    return wave, radii


def test_calc_optics_user_r_dist_uniform_tables(tmp_path):
    from picaso_tpu import virga as vj
    fn = tmp_path / 'MgSiO3.mieff'
    _write_mieff(str(fn))
    mie = vj.load_mieff(str(fn))
    dist = np.exp(-np.log10(mie['radii'] / 1e-4) ** 2)
    opd, w0, g0, wavenumber = vj.calc_optics_user_r_dist(
        mie['wave_um'], 1e8, mie['radii'], dist, mie['qext'],
        mie['qscat'], mie['cos_qscat'])
    np.testing.assert_allclose(w0, 1.8 / 2.0, rtol=1e-12)
    np.testing.assert_allclose(g0, 0.5, rtol=1e-12)
    assert (opd > 0).all()
    # opd scales linearly with column density
    opd2, *_ = vj.calc_optics_user_r_dist(
        mie['wave_um'], 2e8, mie['radii'], dist, mie['qext'],
        mie['qscat'], mie['cos_qscat'])
    np.testing.assert_allclose(opd2, 2 * opd, rtol=1e-12)


def test_parameterize_mie_clouds(tmp_path):
    _write_mieff(str(tmp_path / 'MgSiO3.mieff'))
    par = Parameterize(nlevel=40, load_cld_optical='MgSiO3',
                       mieff_dir=str(tmp_path))
    # distributions: positive, correct length
    d_log = par.get_particle_dist('MgSiO3', 'lognorm',
                                  lognorm_kwargs={'sigma': 0.5,
                                                  'lograd': -4.0})
    d_han = par.get_particle_dist('MgSiO3', 'hansen',
                                  hansen_kwargs={'b': 0.3, 'lograd': -4.0})
    assert len(d_log) == 6 and (d_log > 0).all()
    assert len(d_han) == 6 and (d_han > 0).all()

    play = np.sqrt(par.pressure[1:] * par.pressure[:-1])

    # flex-fsed: zero below base, decaying toward the top above it
    df = par.cloud_flex_fsed('MgSiO3', base_pressure=1.0, ndz=1e8,
                             fsed=2.0, distribution='lognorm',
                             lognorm_kwargs={'sigma': 0.5, 'lograd': -4.0})
    opd = np.asarray(df['opd']).reshape(len(play), -1)
    assert (opd[play > 1.0] == 0).all()
    above = opd[play <= 1.0][:, 0]
    assert above.max() == pytest.approx(above[-1])     # peak at cloud base
    assert above[0] < above[-1]
    np.testing.assert_allclose(np.asarray(df['w0'])[np.asarray(df['opd']) > 0],
                               0.9, rtol=1e-10)

    # brewster-mie slab: opd only inside [ptop, ptop*10**dp]
    df = par.cloud_brewster_mie('MgSiO3', 'hansen', 'slab',
                                hansen_kwargs={'b': 0.3, 'lograd': -4.0},
                                slab_kwargs={'ptop': 0.1, 'dp': 1.0,
                                             'reference_tau': 3.0})
    opd = np.asarray(df['opd']).reshape(len(play), -1)
    inside = (play >= 0.1) & (play <= 1.0)
    assert (opd[~inside] == 0).all()
    assert opd[inside].sum() > 0
    np.testing.assert_allclose(opd.max(axis=1)[inside].sum(), 3.0,
                               rtol=1e-10)

    # brewster-mie deck: saturates below ptop
    df = par.cloud_brewster_mie('MgSiO3', 'lognorm', 'deck',
                                lognorm_kwargs={'sigma': 0.5,
                                                'lograd': -4.0},
                                deck_kwargs={'ptop': 1.0})
    opd = np.asarray(df['opd']).reshape(len(play), -1)
    assert opd[play >= 1.0].max() == pytest.approx(10.0)

    # wavenumber column ascending per layer
    wn = np.asarray(df['wavenumber']).reshape(len(play), -1)
    assert (np.diff(wn[0]) > 0).all()


def test_parameterize_cloud_virga_and_chem(tmp_path):
    import picaso_tpu.justdoit as jdi

    par = Parameterize()
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    nlevel = 30
    pressure = np.logspace(-6, 2, nlevel)
    temperature = 1300 * (pressure / 10) ** 0.1
    import pandas as pd
    case.atmosphere(df=pd.DataFrame({
        'pressure': pressure, 'temperature': temperature,
        'H2': 0.84 + 0 * pressure, 'He': 0.15 + 0 * pressure,
        'H2O': 1e-3 + 0 * pressure}))
    par.add_class(case)
    assert par.nlevel == nlevel   # add_class adopts the case's grid

    df = par.cloud_virga(condensates=['MgSiO3'], fsed=1.0, kzz=1e9,
                         solver='analytic')
    assert {'opd', 'w0', 'g0'} <= set(df.columns)
    assert np.asarray(df['opd']).max() >= 0

    prof = par.chem_visscher(1.0, 0.0)
    assert 'CH4' in prof.columns
    assert np.asarray(prof['H2O']).max() > 0


def test_grid_fitter_add_grid_add_data(tmp_path):
    """Reference accumulation workflow: add_grid/add_data/fit_all
    (analyze.py:92-183)."""
    import h5py

    wno = np.linspace(1000, 10000, 150)
    temps = np.array([600.0, 800.0, 1000.0])
    gdir = tmp_path / 'grid2'
    gdir.mkdir()
    for i, t in enumerate(temps):
        with h5py.File(str(gdir / f'm{i}.h5'), 'w') as f:
            g = f.create_group('spectra')
            g['wavenumber'] = wno
            g['fpfs_thermal'] = t * (1 + 0.2 * np.sin(wno / 1500))
            f.attrs['teff'] = t

    base = np.array([[1.0 + 0 * wno]])[0]
    fitter = GridFitter('toy', models={'wavenumber': wno,
                                       'spectra': base},
                        grid_parameters=pd.DataFrame({'teff': [500.0]}),
                        verbose=False)
    fitter.add_grid('disk', str(gdir))
    assert 'disk' in fitter.grids
    assert fitter.check_square('disk')

    wl = 1e4 / np.linspace(1500, 9500, 40)
    truth = 800.0 * (1 + 0.2 * np.sin((1e4 / wl) / 1500))
    fitter.add_data('obs', wl, wl * 0 + 0.01, truth, truth * 0 + 5.0)
    res = fitter.fit_all()
    assert 'disk' in res and 'obs' in res['disk']
    best = fitter.best_fit('disk', 'obs')
    assert float(best['parameters']['teff']) == 800.0
    d = fitter.as_dict()
    assert 'disk' in d['grids'] and 'obs' in d['data']


def test_conv_non_uniform_R_matches_loop():
    """Vectorized instrument convolution == the reference's per-point
    Gaussian loop (driver.py:338-381)."""
    from picaso_tpu.wavelength import conv_non_uniform_R

    rng = np.random.default_rng(3)
    model_wl = np.linspace(1.0, 5.0, 600)
    flux = 1.0 + 0.5 * np.sin(8 * model_wl) + 0.05 * rng.standard_normal(600)
    obs_wl = np.linspace(1.2, 4.8, 25)
    R = np.linspace(50.0, 200.0, 25)

    out = conv_non_uniform_R(flux, model_wl, R, obs_wl)

    expect = np.zeros_like(obs_wl)
    for i, wlc in enumerate(obs_wl):
        sigma = (wlc / R[i]) / 2.355
        k = np.exp(-((model_wl - wlc) ** 2) / (2 * sigma ** 2))
        expect[i] = np.sum(flux * k / k.sum())
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-10)

    # smoothing: convolved spectrum has less variance than the model
    assert np.var(np.asarray(out)) < np.var(flux)


def test_grid_fitter_multi_grid_readback(tmp_path):
    """best_fit/posteriors re-point at the named grid after another
    add_grid (regression: flat attrs stayed on the last-loaded grid)."""
    import h5py

    wno = np.linspace(1000, 10000, 80)
    ta = np.array([500.0, 900.0])
    fitter = GridFitter(
        'a', models={'wavenumber': wno,
                     'spectra': np.array([t * (1 + 0.2 * np.sin(wno / 900))
                                          for t in ta])},
        grid_parameters=pd.DataFrame({'teff': ta}), verbose=False)

    gdir = tmp_path / 'gb'
    gdir.mkdir()
    tb = np.array([100.0, 200.0, 300.0])
    for i, t in enumerate(tb):
        with h5py.File(str(gdir / f'm{i}.h5'), 'w') as f:
            g = f.create_group('spectra')
            g['wavenumber'] = wno
            g['fpfs_thermal'] = np.full(80, t)
            f.attrs['mass'] = t
    fitter.add_grid('b', str(gdir))

    wl = 1e4 / np.linspace(1500, 9500, 30)
    y = np.interp(1e4 / wl, wno, ta[1] * (1 + 0.2 * np.sin(wno / 900)))
    fitter.fit_grid('a', 'obs', wl, y, y * 0 + 5.0)
    # after loading grid b, reading grid a must still see a's params
    best = fitter.best_fit('a', 'obs')
    assert best['parameters']['teff'] == 900.0
    vals, _ = fitter.parameter_posteriors('a', 'obs', 'teff')
    assert set(vals) == {500.0, 900.0}


def test_sigma_trotta_values():
    """Detection sigmas follow Trotta 2008 Table 2 (regression: the
    reference's interpolation grid includes the non-invertible p > 1/e
    branch and clamps every weak detection to a ~0.26-sigma constant;
    analyze.py:1513-1522)."""
    from picaso_tpu.analyze import sigma
    s1, _ = sigma(1.0, 0.0)      # lnB = 1.0 -> ~2.0 sigma ('weak')
    s5, _ = sigma(5.0, 0.0)      # lnB = 5.0 -> ~3.6 sigma ('strong')
    s11, _ = sigma(11.0, 0.0)    # lnB = 11  -> ~5 sigma
    assert abs(s1 - 2.0) < 0.15
    assert abs(s5 - 3.6) < 0.15
    assert abs(s11 - 5.0) < 0.15
    # weak detections must DECREASE toward lnB=0, not clamp
    s05, _ = sigma(0.5, 0.0)
    assert s05 < s1 and s05 > 1.0


def test_nested_result_attribute_protocol():
    """Missing attributes raise AttributeError (not KeyError) so
    hasattr / deepcopy / 3-arg getattr behave."""
    import copy
    from picaso_tpu.sampler import NestedResult
    r = NestedResult(logz=1.0)
    assert r.logz == 1.0
    assert not hasattr(r, 'fitpars')
    assert getattr(r, 'nope', None) is None
    r2 = copy.deepcopy(r)
    assert r2['logz'] == 1.0


def test_load_grid_mixed_wavenumber_axes(tmp_path):
    """Members on different wavenumber grids interpolate onto the first
    file's axis instead of stacking against the wrong coordinates."""
    import h5py
    from picaso_tpu.analyze import GridFitter

    wno_a = np.linspace(1000.0, 2000.0, 40)
    wno_b = np.linspace(1000.0, 2000.0, 80)
    for name, wno, scale in (('a', wno_a, 1.0), ('b', wno_b, 2.0)):
        with h5py.File(tmp_path / f'{name}.h5', 'w') as f:
            g = f.create_group('spectra')
            g['wavenumber'] = wno
            g['fpfs_thermal'] = scale * (wno / 1000.0)
            f.attrs['tint'] = scale
    fitter = GridFitter('mix', str(tmp_path), verbose=False)
    assert fitter.spectra.shape == (2, 40)
    # the second member's VALUES survive the regrid (it is 2x the first)
    np.testing.assert_allclose(fitter.spectra[1],
                               2.0 * fitter.spectra[0], rtol=1e-12)


def test_plot_atmosphere_overlay_ax_only(tmp_path):
    """plot_atmosphere(ax=...) without fig= must not crash on
    tight_layout (regression)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import pandas as pd
    from picaso_tpu import justdoit as jdi
    from picaso_tpu.io_utils import save_model_nc
    from picaso_tpu.analyze import plot_atmosphere

    pr = np.logspace(-4, 2, 15)
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.atmosphere(df=pd.DataFrame({
        'pressure': pr, 'temperature': 900 * (pr / 10) ** 0.1,
        'H2': 0.85 + 0 * pr, 'H2O': 1e-3 + 0 * pr}))
    save_model_nc(str(tmp_path / 'm.nc'), case, {})
    fig0, ax0 = plt.subplots(1, 2)
    fig, ax = plot_atmosphere(str(tmp_path), 'm.nc', ax=ax0)
    assert fig is fig0
    plt.close('all')
