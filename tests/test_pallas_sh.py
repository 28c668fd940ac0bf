"""SH4 Pallas megakernel vs the rt/sh.py scan path (interpret mode).

Same contract as tests/test_pallas_toon.py: the Pallas kernels must
reproduce the portable scan path's f32 numbers (identical arithmetic,
modulo f32 reassociation inside the staged Gauss-Jordan) on CPU in
interpret mode; on-hardware agreement is recorded by
scripts/tpu_parity.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope='module')
def problem():
    import bench
    from picaso_tpu.optics import combine_optics

    scene, grid, config = bench.build_problem(300, production=False,
                                              nlevel=31)
    config = dataclasses.replace(config, rt_method=1, stream=4,
                                 use_pallas=False)
    nwno = 300
    nlayer = 30
    taugas = np.asarray(jax.device_get(
        __import__('picaso_tpu.pipeline', fromlist=['gather_taugas'])
        .gather_taugas(scene, grid, config)), np.float32)
    from picaso_tpu.opacities import assemble
    tauray = np.asarray(jax.device_get(assemble.rayleigh_tau(
        scene.sigma_ray, scene.mix_ray, scene.colden, scene.mmw_layer)),
        np.float32)
    rf = np.full((nlayer, nwno), 0.99999, np.float32)
    props = combine_optics(jnp.asarray(taugas), jnp.asarray(tauray),
                           scene.cld_opd, scene.cld_w0, scene.cld_g0,
                           jnp.asarray(rf), delta_eddington=True,
                           stream=4)
    return scene, grid, config, taugas, tauray, rf, props


def test_reflected_sh4_pallas_matches_scan(problem):
    from picaso_tpu.rt.sh import reflected_sh
    from picaso_tpu.rt.pallas_sh import reflected_sh4_pallas

    scene, grid, config, taugas, tauray, rf, props = problem
    ref = reflected_sh(props, scene.surf_reflect, scene.ubar0,
                       scene.ubar1, scene.cos_theta, scene.F0PI,
                       stream=4, controls=config.controls,
                       precision='f32')
    out = reflected_sh4_pallas(
        jnp.asarray(taugas), jnp.asarray(tauray), scene.cld_opd,
        scene.cld_w0, scene.cld_g0, jnp.asarray(rf), scene.surf_reflect,
        scene.ubar0, scene.ubar1, scene.cos_theta, scene.F0PI,
        controls=config.controls, block_w=128, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * scale)


def test_reflected_sh4_pallas_many_angles(problem):
    """nang > 8 (3D disco-ball geometry): regression for the sweep
    scratch overflowing the reused a_s/c_s slab capacity."""
    from picaso_tpu import disco as disco_mod
    from picaso_tpu.optics import combine_optics
    from picaso_tpu.rt.sh import reflected_sh
    from picaso_tpu.rt.pallas_sh import reflected_sh4_pallas

    scene, grid, config, taugas, tauray, rf, props = problem
    g = disco_mod.make_geometry(1.0, num_gangle=4, num_tangle=3)
    dt = np.float32
    ub0 = np.asarray(g.ubar0, dt)
    ub1 = np.asarray(g.ubar1, dt)
    ct = np.asarray(g.cos_theta, dt)
    props12 = combine_optics(jnp.asarray(taugas), jnp.asarray(tauray),
                             scene.cld_opd, scene.cld_w0, scene.cld_g0,
                             jnp.asarray(rf), delta_eddington=True,
                             stream=4)
    ref = reflected_sh(props12, scene.surf_reflect, ub0, ub1, ct,
                       scene.F0PI, stream=4, controls=config.controls,
                       precision='f32')
    out = reflected_sh4_pallas(
        jnp.asarray(taugas), jnp.asarray(tauray), scene.cld_opd,
        scene.cld_w0, scene.cld_g0, jnp.asarray(rf), scene.surf_reflect,
        ub0, ub1, ct, scene.F0PI, controls=config.controls,
        block_w=128, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert out.shape == ref.shape == (4, 3, 300)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * scale)


def test_thermal_sh4_pallas_matches_scan(problem):
    from picaso_tpu.rt import toon
    from picaso_tpu.rt.sh import thermal_sh
    from picaso_tpu.rt.pallas_sh import thermal_sh4_pallas

    scene, grid, config, taugas, tauray, rf, props = problem
    ref, _ = thermal_sh(scene.tlevel, props, scene.plevel, scene.ubar1,
                        scene.surf_reflect, grid.wno, stream=4,
                        precision='f32')
    all_b = toon.blackbody(scene.tlevel, 1.0 / grid.wno).astype(
        jnp.float32)
    ptfac = scene.plevel[0] / (scene.plevel[1] - scene.plevel[0])
    out = thermal_sh4_pallas(
        all_b, jnp.asarray(taugas), jnp.asarray(tauray), scene.cld_opd,
        scene.cld_w0, scene.cld_g0, jnp.asarray(rf), ptfac,
        scene.surf_reflect, scene.ubar1, block_w=128, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * scale)


# ---------------------------------------------------------------------------
# 2-stream variants
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def problem2(problem):
    """Stream-2 optical properties on the same scene."""
    from picaso_tpu.optics import combine_optics

    scene, grid, config, taugas, tauray, rf, _ = problem
    config2 = dataclasses.replace(config, stream=2)
    props2 = combine_optics(jnp.asarray(taugas), jnp.asarray(tauray),
                            scene.cld_opd, scene.cld_w0, scene.cld_g0,
                            jnp.asarray(rf), delta_eddington=True,
                            stream=2)
    return scene, grid, config2, taugas, tauray, rf, props2


def test_reflected_sh2_pallas_matches_scan(problem2):
    from picaso_tpu.rt.sh import reflected_sh
    from picaso_tpu.rt.pallas_sh import reflected_sh2_pallas

    scene, grid, config, taugas, tauray, rf, props = problem2
    ref = reflected_sh(props, scene.surf_reflect, scene.ubar0,
                       scene.ubar1, scene.cos_theta, scene.F0PI,
                       stream=2, controls=config.controls,
                       precision='f32')
    out = reflected_sh2_pallas(
        jnp.asarray(taugas), jnp.asarray(tauray), scene.cld_opd,
        scene.cld_w0, scene.cld_g0, jnp.asarray(rf), scene.surf_reflect,
        scene.ubar0, scene.ubar1, scene.cos_theta, scene.F0PI,
        controls=config.controls, block_w=128, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * scale)


def test_reflected_sh2_pallas_many_angles(problem2):
    """nang > 8: sweep-scratch reuse regression, stream 2."""
    from picaso_tpu import disco as disco_mod
    from picaso_tpu.rt.sh import reflected_sh
    from picaso_tpu.rt.pallas_sh import reflected_sh2_pallas

    scene, grid, config, taugas, tauray, rf, props = problem2
    g = disco_mod.make_geometry(1.0, num_gangle=4, num_tangle=3)
    dt = np.float32
    ub0 = np.asarray(g.ubar0, dt)
    ub1 = np.asarray(g.ubar1, dt)
    ct = np.asarray(g.cos_theta, dt)
    ref = reflected_sh(props, scene.surf_reflect, ub0, ub1, ct,
                       scene.F0PI, stream=2, controls=config.controls,
                       precision='f32')
    out = reflected_sh2_pallas(
        jnp.asarray(taugas), jnp.asarray(tauray), scene.cld_opd,
        scene.cld_w0, scene.cld_g0, jnp.asarray(rf), scene.surf_reflect,
        ub0, ub1, ct, scene.F0PI, controls=config.controls,
        block_w=128, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert out.shape == ref.shape == (4, 3, 300)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * scale)


def test_thermal_sh2_pallas_matches_scan(problem2):
    from picaso_tpu.rt import toon
    from picaso_tpu.rt.sh import thermal_sh
    from picaso_tpu.rt.pallas_sh import thermal_sh2_pallas

    scene, grid, config, taugas, tauray, rf, props = problem2
    ref, _ = thermal_sh(scene.tlevel, props, scene.plevel, scene.ubar1,
                        scene.surf_reflect, grid.wno, stream=2,
                        precision='f32')
    all_b = toon.blackbody(scene.tlevel, 1.0 / grid.wno).astype(
        jnp.float32)
    ptfac = scene.plevel[0] / (scene.plevel[1] - scene.plevel[0])
    out = thermal_sh2_pallas(
        all_b, jnp.asarray(taugas), jnp.asarray(tauray), scene.cld_opd,
        scene.cld_w0, scene.cld_g0, jnp.asarray(rf), ptfac,
        scene.surf_reflect, scene.ubar1, block_w=128, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5 * scale)
