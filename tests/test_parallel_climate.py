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
