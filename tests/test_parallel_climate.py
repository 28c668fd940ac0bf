"""Sharded-vs-unsharded equality for the climate and retrieval batch paths.

Extends the forward-pipeline mesh tests (test_pipeline.py,
test_phase_curve.py) to the other two production workloads SURVEY §2.4
calls out: the fused climate Newton solve batched over scenes, and
retrieval likelihood batches.  Both run on the 8 virtual CPU devices the
conftest configures, on a ('batch', 'wave') mesh, and must match the
single-device result.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu import parallel, pipeline
from picaso_tpu.climate import core, fused
from picaso_tpu.climate.api import _ClimateState
from picaso_tpu.opacities.ck import synthetic_ck_table

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


@pytest.fixture(scope='module')
def climate_problem():
    nlevel = 41
    ck = synthetic_ck_table()
    opa = jdi.opannection(ck_table=ck, method='preweighted')
    case = jdi.inputs(calculation='brown', climate=True)
    case.phase_angle(0)
    case.gravity(gravity=100.0, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.effective_temp(700.0)
    case.setup_nostar()
    case.setup_climate()
    pressure = np.logspace(-4, 2.5, nlevel)
    guess = np.clip(700.0 * (pressure / 10.0) ** 0.12, 250.0, 2800.0)
    case.inputs_climate(temp_guess=guess, pressure=pressure,
                        rcb_guess=nlevel - 8, rfacv=0.0)
    opa.relative_flux = np.ones(len(ck.wno))
    tidal = core.tidal_flux(700.0, nlevel)
    state = _ClimateState(case, opa, tidal, rfaci=1.0, rfacv=0.0,
                          tmin=80.0, tmax=4000.0, verbose=False)
    zones = core.zone_maps([0, nlevel - 8, nlevel - 2, 0, 0, 0], 1, nlevel)
    config = state.fused_config(it_max=1, egp_stepmax=False)
    temps = np.stack([guess, guess * 1.02]).astype(np.float64)
    return state, zones, config, temps


def _climate_step(state, zones, config):
    def step(temps, data, ckarr):
        def one(t):
            t_new, conv, dtdp, fnil, fnvl, fpit = fused.profile_step(
                t, zones, data, state.chem_grid, ckarr, state.geom,
                state.adiabat, config)
            return t_new, fnil
        return jax.vmap(one)(temps)
    return jax.jit(step)


def test_sharded_climate_matches_single_device(climate_problem):
    state, zones, config, temps = climate_problem
    step = _climate_step(state, zones, config)

    t_ref, f_ref = step(jnp.asarray(temps), state.data, state.ck.arrays)
    t_ref, f_ref = np.asarray(t_ref), np.asarray(f_ref)

    mesh = parallel.make_mesh(n_wave=4, n_batch=2)
    temps_s, data_s, ckarr_s = parallel.shard_climate(
        temps, state.data, state.ck.arrays, mesh)
    t_sh, f_sh = step(temps_s, data_s, ckarr_s)

    assert np.isfinite(t_ref).all()
    np.testing.assert_allclose(np.asarray(t_sh), t_ref, rtol=5e-5,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(f_sh), f_ref,
                               rtol=5e-4, atol=5e-4 * np.abs(f_ref).max())


def _sliced_ck(stride=4):
    """synthetic_ck_table with every ``stride``-th wavelength bin — the
    196-bin grid is fixed by the bundled continuum DB, and the full-solve
    equality test doesn't need all of it."""
    from picaso_tpu.opacities.ck import CKTable

    ck = synthetic_ck_table()
    a = ck.arrays
    n = len(np.asarray(a.wno))
    # trim so the sliced bin count divides the 4-way wave mesh
    sl = np.s_[:(n // (4 * stride)) * 4 * stride:stride]
    arrays = a._replace(wno=a.wno[sl], delta_wno=a.delta_wno[sl],
                        ln_kappa=a.ln_kappa[:, :, sl, :],
                        cont_opa=a.cont_opa[:, :, sl])
    return CKTable(arrays, ck.molecules, ck.full_abunds, ck.gauss_pts,
                   ck.temps, ck.pressures, wno=ck.wno[sl],
                   delta_wno=ck.delta_wno[sl], gauss_wts=ck.gauss_wts)


def _rce_case(ck, nlevel=41):
    opa = jdi.opannection(ck_table=ck, method='preweighted')
    case = jdi.inputs(calculation='brown', climate=True)
    case.phase_angle(0)
    case.gravity(gravity=100.0, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.effective_temp(700.0)
    case.setup_nostar()
    case.setup_climate()
    pressure = np.logspace(-4, 2.5, nlevel)
    guess = np.clip(700.0 * (pressure / 10.0) ** 0.12, 250.0, 2800.0)
    case.inputs_climate(temp_guess=guess, pressure=pressure,
                        rcb_guess=nlevel - 8, rfacv=0.0)
    return case, opa


@pytest.mark.slow
def test_full_climate_solve_sharded_equals_single():
    """The WHOLE run_climate (both profile passes + find_strat) under a
    wave-sharded mesh converges to the single-device answer — the
    whole-solve extension of the per-step equality above."""
    ck = _sliced_ck()
    case, opa = _rce_case(ck)
    ref = case.climate(opa, verbose=False)

    mesh = parallel.make_mesh(n_wave=4, n_batch=2)
    case2, opa2 = _rce_case(ck)
    got = case2.climate(opa2, verbose=False, mesh=mesh)

    assert ref['converged'] and got['converged']
    assert got['cvz_locs'] == ref['cvz_locs']
    np.testing.assert_allclose(got['temperature'], ref['temperature'],
                               rtol=1e-4, atol=0.05)


@pytest.fixture(scope='module')
def forward_problem():
    from picaso_tpu.opacities import factory

    nwno = 256
    wno = np.linspace(2000.0, 18000.0, nwno)
    grid = factory.synthetic_opacity_grid(wno, ntemp=6, npress=5)
    nlevel = 25
    pressure = np.logspace(-6, 2, nlevel)
    temperature = 1000.0 * (pressure / 10.0) ** 0.1 + 300.0
    mix = {'H2': np.zeros(nlevel) + 0.85, 'He': np.zeros(nlevel) + 0.14,
           'H2O': np.zeros(nlevel) + 5e-4, 'CH4': np.zeros(nlevel) + 3e-4}
    scene, config = pipeline.scene_from_arrays(
        pressure, temperature, mix, grid, gravity=2500.0,
        radius=7.1e9, mass=1.9e30, rstar=6.96e10)
    return scene, grid, config


def test_mesh_aware_nested_sampler_matches_single(forward_problem):
    """nested_sample with a mesh-sharded likelihood (live points over
    'batch', wavelengths over 'wave' via parallel.sharded_loglike)
    reproduces the single-device posterior: same seed, same dead points,
    same evidence — the SPMD replacement for the reference's MPI
    likelihood pool (driver.py:406-427)."""
    from picaso_tpu.sampler import nested_sample

    scene, grid, config = forward_problem
    truth = 1.02
    nwno = len(np.asarray(grid.wno))

    def model_batch(scales, grid_in):
        def one(s):
            sc = scene._replace(tlevel=scene.tlevel * s[0],
                                tlayer=scene.tlayer * s[0])
            return pipeline.forward(sc, grid_in, config)['albedo']
        return jax.vmap(one)(scales)

    y = np.asarray(jax.jit(model_batch)(
        jnp.asarray([[truth]]), grid))[0]

    def prior(u):
        return 0.9 + 0.3 * u

    @jax.jit
    def ll_dev(scales, grid_in, y_in):
        alb = model_batch(scales, grid_in)
        return -0.5 * jnp.sum((alb - y_in[None]) ** 2, -1) / 1e-6

    ref = nested_sample(
        lambda x: np.asarray(ll_dev(jnp.asarray(x), grid, jnp.asarray(y))),
        prior, 1, nlive=50, seed=11, dlogz=0.5)

    mesh = parallel.make_mesh(n_wave=4, n_batch=2)
    grid_s = parallel.shard_grid(grid, mesh)
    y_s = jax.device_put(y, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec('wave')))
    ll_sharded = parallel.sharded_loglike(
        lambda x: ll_dev(x, grid_s, y_s), mesh)
    got = nested_sample(ll_sharded, prior, 1, nlive=50, seed=11,
                        dlogz=0.5)

    # same RNG path + (to fp tolerance) same likelihoods -> identical run
    assert got.logz == pytest.approx(ref.logz, abs=1e-6)
    np.testing.assert_allclose(got.samples, ref.samples, rtol=1e-10)
    mean_ref = float((ref.samples[:, 0] * ref.weights).sum())
    assert mean_ref == pytest.approx(truth, abs=5e-3)


def test_sharded_retrieval_likelihood_matches(forward_problem):
    """A batched chi^2 likelihood (live points x wavelengths) on the mesh
    equals the single-device evaluation — the retrieval scaling story."""
    scene, grid, config = forward_problem
    n_live = 4
    scenes = [scene._replace(tlevel=scene.tlevel * (1 + 0.01 * i),
                             tlayer=scene.tlayer * (1 + 0.01 * i))
              for i in range(n_live)]
    batch = pipeline.stack_scenes(scenes)
    nwno = len(np.asarray(grid.wno))
    y = np.float32(0.3 + 0.01 * np.random.default_rng(1)
                   .standard_normal(nwno))

    @jax.jit
    def loglike(batch, grid, y):
        out = pipeline.forward_batch(batch, grid, config)
        return -0.5 * jnp.sum((out['albedo'] - y[None]) ** 2, axis=-1)

    ref = np.asarray(loglike(batch, grid, jnp.asarray(y)))

    mesh = parallel.make_mesh(n_wave=4, n_batch=2)
    batch_s = parallel.shard_scene(batch, mesh, batched=True)
    grid_s = parallel.shard_grid(grid, mesh)
    y_s = jax.device_put(y, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec('wave')))
    got = np.asarray(loglike(batch_s, grid_s, y_s))

    assert np.isfinite(ref).all()
    np.testing.assert_allclose(got, ref, rtol=2e-5)
