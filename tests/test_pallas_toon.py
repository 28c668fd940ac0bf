"""Parity of the Pallas megakernels (rt/pallas_toon.py) vs the scan path.

Runs in Pallas interpret mode on CPU so CI needs no TPU; the same kernels
compile with Mosaic on device (exercised by bench.py / __graft_entry__).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from picaso_tpu.rt.toon import (ScatteringControls, blackbody, reflected_1d,
                                thermal_1d)
from picaso_tpu.rt.pallas_toon import reflected_pallas, thermal_pallas


@pytest.fixture(scope='module')
def optics():
    rng = np.random.default_rng(7)
    nlayer, nwno = 20, 700   # nwno not a multiple of block_w -> pads
    dtau_og = rng.uniform(1e-4, 2.0, (nlayer, nwno))
    w0_og = rng.uniform(0.05, 0.95, (nlayer, nwno))
    cosb_og = rng.uniform(0.0, 0.9, (nlayer, nwno))
    ftau_cld = rng.uniform(0, 1, (nlayer, nwno))
    f = cosb_og ** 2
    w0 = w0_og * (1 - f) / (1 - w0_og * f)
    cosb = (cosb_og - f) / (1 - f)
    dtau = dtau_og * (1 - w0_og * f)
    tau = np.concatenate([np.zeros((1, nwno)), np.cumsum(dtau, 0)], 0)
    tau_og = np.concatenate([np.zeros((1, nwno)), np.cumsum(dtau_og, 0)], 0)
    return dict(dtau=dtau, tau=tau, w0=w0, cosb=cosb, gcos2=cosb ** 2,
                ftau_cld=ftau_cld, ftau_ray=1.0 - ftau_cld,
                dtau_og=dtau_og, tau_og=tau_og, w0_og=w0_og,
                cosb_og=cosb_og, nlayer=nlayer, nwno=nwno)


@pytest.mark.parametrize('single_phase', [1, 3])
def test_reflected_parity(optics, single_phase):
    o = optics
    nwno = o['nwno']
    rng = np.random.default_rng(1)
    ubar0 = jnp.asarray(rng.uniform(0.1, 1.0, (3, 1)))
    ubar1 = jnp.asarray(rng.uniform(0.1, 1.0, (3, 1)))
    surf = jnp.zeros(nwno)
    F0PI = jnp.ones(nwno)
    c = ScatteringControls(single_phase=single_phase)
    args = [jnp.asarray(o[k]) for k in
            ('dtau', 'tau', 'w0', 'cosb', 'gcos2', 'ftau_cld', 'ftau_ray',
             'dtau_og', 'tau_og', 'w0_og', 'cosb_og')]
    ref, _ = reflected_1d(*args, surf, ubar0, ubar1, 0.5, F0PI, c)
    out = reflected_pallas(*args, surf, ubar0, ubar1, 0.5, F0PI, c,
                           block_w=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-8)


@pytest.mark.parametrize('hard_surface', [False, True])
def test_thermal_parity(optics, hard_surface):
    o = optics
    nlayer, nwno = o['nlayer'], o['nwno']
    tlevel = jnp.asarray(np.linspace(400.0, 1600.0, nlayer + 1))
    plevel = jnp.asarray(np.logspace(-4, 2, nlayer + 1))
    wno = jnp.asarray(np.linspace(300.0, 20000.0, nwno))
    ubar1 = jnp.asarray(np.random.default_rng(2).uniform(0.1, 1, (3, 1)))
    surf = jnp.full(nwno, 0.1)
    dtau = jnp.asarray(o['dtau_og'])
    w0 = jnp.asarray(o['w0_og'])
    cosb = jnp.asarray(o['cosb_og'])

    ref_top, _ = thermal_1d(tlevel, dtau, w0, cosb, plevel, ubar1, surf,
                            wno, dwno=jnp.zeros(nwno),
                            hard_surface=hard_surface, calc_type=0)
    all_b = blackbody(tlevel, 1.0 / wno).astype(dtau.dtype)
    tau_top = dtau[0] * plevel[0] / (plevel[1] - plevel[0])
    out = thermal_pallas(all_b, dtau, w0, cosb, tau_top, surf, ubar1,
                         hard_surface=hard_surface, block_w=256,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_top),
                               rtol=2e-5, atol=1e-8)


def test_interp_tau_parity():
    """Gather-fused interp kernel == interp_molecular + molecular_tau."""
    from picaso_tpu.opacities.db import _find_indices, interp_molecular
    from picaso_tpu.opacities import assemble
    from picaso_tpu.opacities.factory import synthetic_opacity_grid
    from picaso_tpu.opacities.pallas_interp import interp_tau_pallas

    nwno, nlayer = 700, 12
    wno = np.linspace(1000.0, 15000.0, nwno)
    grid = synthetic_opacity_grid(wno, molecules=('H2O', 'CH4', 'CO'),
                                  ntemp=6, npress=5)
    rng = np.random.default_rng(3)
    tlayer = jnp.asarray(rng.uniform(200.0, 2400.0, nlayer))
    player = jnp.asarray(np.logspace(-5, 2, nlayer))
    colden = jnp.asarray(rng.uniform(1.0, 100.0, nlayer))
    mmw = jnp.asarray(rng.uniform(2.2, 2.4, nlayer))
    mix = jnp.asarray(rng.uniform(1e-6, 1e-3, (3, nlayer)))

    kappa = interp_molecular(grid, tlayer, player)
    ref = assemble.molecular_tau(kappa, mix, colden, mmw)

    t_w, p_w, idx = _find_indices(grid.pt, tlayer, player)
    mixcol = mix * colden[None, :] / mmw[None, :]
    out = interp_tau_pallas(grid.log_kappa, idx, t_w, p_w, mixcol,
                            block_w=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5)


def test_interp_tau_blocked_parity():
    """Blocked-layout gather kernel == XLA path (incl. a non-128-multiple
    nwno exercising the padded tail)."""
    from picaso_tpu.opacities.db import _find_indices, interp_molecular
    from picaso_tpu.opacities import assemble
    from picaso_tpu.opacities.factory import synthetic_opacity_grid
    from picaso_tpu.opacities.pallas_interp import (
        blocked_table, interp_tau_pallas_blocked)

    nwno, nlayer = 700, 12
    wno = np.linspace(1000.0, 15000.0, nwno)
    grid = synthetic_opacity_grid(wno, molecules=('H2O', 'CH4', 'CO'),
                                  ntemp=6, npress=5)
    rng = np.random.default_rng(3)
    tlayer = jnp.asarray(rng.uniform(200.0, 2400.0, nlayer))
    player = jnp.asarray(np.logspace(-5, 2, nlayer))
    colden = jnp.asarray(rng.uniform(1.0, 100.0, nlayer))
    mmw = jnp.asarray(rng.uniform(2.2, 2.4, nlayer))
    mix = jnp.asarray(rng.uniform(1e-6, 1e-3, (3, nlayer)))

    kappa = interp_molecular(grid, tlayer, player)
    ref = assemble.molecular_tau(kappa, mix, colden, mmw)

    t_w, p_w, idx, parity = _find_indices(grid.pt, tlayer, player,
                                          return_parity=True)
    mixcol = mix * colden[None, :] / mmw[None, :]
    blocked = blocked_table(grid.log_kappa, block_w=256)
    assert blocked.shape == (30, 3, 3, 256)
    out = interp_tau_pallas_blocked(blocked, idx, t_w, p_w, mixcol, nwno,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5)

    # parity slot-stabilization is a pure (row, weight) permutation: the
    # four slots still hold the same pairs, so the bilinear sum matches
    # up to f32 addition order
    out_st = interp_tau_pallas_blocked(blocked, idx, t_w, p_w, mixcol,
                                       nwno, parity=parity,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out_st), np.asarray(out),
                               rtol=5e-5)

    # every layer's slot set is a permutation of the corner set, and a
    # row repeated across layers keeps its slot (the DMA-elision
    # invariant)
    from picaso_tpu.opacities.pallas_interp import _parity_slots
    w4 = jnp.stack([(1 - t_w) * (1 - p_w), t_w * (1 - p_w),
                    t_w * p_w, (1 - t_w) * p_w], 0)
    idx_st, _ = _parity_slots(idx.astype(jnp.int32), w4, *parity)
    idx_np, st_np = np.asarray(idx), np.asarray(idx_st)
    for l in range(nlayer):
        assert sorted(idx_np[:, l]) == sorted(st_np[:, l])
    slot_of = {}
    for l in range(nlayer):
        for q in range(4):
            row = int(st_np[q, l])
            assert slot_of.setdefault(row, q) == q
    g2 = grid.with_blocked_table(block_w=256)
    assert g2.log_kappa_blocked is not None


@pytest.fixture(scope='module')
def raw_sources():
    """Per-source optical depths for the fused-optics kernels."""
    rng = np.random.default_rng(11)
    nlayer, nwno = 20, 700
    taugas = rng.uniform(1e-4, 1.5, (nlayer, nwno))
    tauray = rng.uniform(1e-5, 0.3, (nlayer, nwno))
    copd = rng.uniform(0.0, 1.0, (nlayer, nwno))
    cw0 = rng.uniform(0.3, 0.99, (nlayer, nwno))
    cg0 = rng.uniform(0.0, 0.9, (nlayer, nwno))
    rf = rng.uniform(0.9, 0.99999, (nlayer, nwno))
    return dict(taugas=taugas, tauray=tauray, copd=copd, cw0=cw0,
                cg0=cg0, rf=rf, nlayer=nlayer, nwno=nwno)


@pytest.mark.parametrize('delta_eddington', [True, False])
def test_reflected_fused_optics_parity(raw_sources, delta_eddington):
    """combine_optics + scan path == the fused-optics Pallas kernel."""
    from picaso_tpu.optics import combine_optics
    from picaso_tpu.rt.pallas_toon import reflected_pallas_fused

    s = raw_sources
    nwno = s['nwno']
    rng = np.random.default_rng(3)
    ubar0 = jnp.asarray(rng.uniform(0.1, 1.0, (3, 1)))
    ubar1 = jnp.asarray(rng.uniform(0.1, 1.0, (3, 1)))
    surf = jnp.zeros(nwno)
    F0PI = jnp.ones(nwno)
    c = ScatteringControls(single_phase=3)
    props = combine_optics(
        jnp.asarray(s['taugas']), jnp.asarray(s['tauray']),
        jnp.asarray(s['copd']), jnp.asarray(s['cw0']),
        jnp.asarray(s['cg0']), jnp.asarray(s['rf']),
        delta_eddington=delta_eddington, stream=2)
    ref, _ = reflected_1d(
        props.dtau, props.tau, props.w0, props.cosb, props.gcos2,
        props.ftau_cld, props.ftau_ray, props.dtau_og, props.tau_og,
        props.w0_og, props.cosb_og, surf, ubar0, ubar1, 0.5, F0PI, c)
    out = reflected_pallas_fused(
        jnp.asarray(s['taugas']), jnp.asarray(s['tauray']),
        jnp.asarray(s['copd']), jnp.asarray(s['cw0']),
        jnp.asarray(s['cg0']), jnp.asarray(s['rf']), surf, ubar0, ubar1,
        0.5, F0PI, c, stream=2, delta_eddington=delta_eddington,
        block_w=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-8)


def test_thermal_fused_optics_parity(raw_sources):
    from picaso_tpu.optics import combine_optics
    from picaso_tpu.rt.pallas_toon import thermal_pallas_fused

    s = raw_sources
    nlayer, nwno = s['nlayer'], s['nwno']
    tlevel = jnp.asarray(np.linspace(400.0, 1600.0, nlayer + 1))
    plevel = jnp.asarray(np.logspace(-4, 2, nlayer + 1))
    wno = jnp.asarray(np.linspace(300.0, 20000.0, nwno))
    ubar1 = jnp.asarray(np.random.default_rng(2).uniform(0.1, 1, (3, 1)))
    surf = jnp.full(nwno, 0.1)
    props = combine_optics(
        jnp.asarray(s['taugas']), jnp.asarray(s['tauray']),
        jnp.asarray(s['copd']), jnp.asarray(s['cw0']),
        jnp.asarray(s['cg0']), jnp.asarray(s['rf']))
    ref_top, _ = thermal_1d(tlevel, props.dtau_og, props.w0_no_raman,
                            props.cosb_og, plevel, ubar1, surf, wno,
                            dwno=jnp.zeros(nwno), hard_surface=False,
                            calc_type=0)
    all_b = blackbody(tlevel, 1.0 / wno).astype(jnp.float64)
    ptfac = plevel[0] / (plevel[1] - plevel[0])
    out = thermal_pallas_fused(
        all_b, jnp.asarray(s['taugas']), jnp.asarray(s['tauray']),
        jnp.asarray(s['copd']), jnp.asarray(s['cw0']),
        jnp.asarray(s['cg0']), ptfac, surf, ubar1, hard_surface=False,
        block_w=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_top),
                               rtol=2e-5, atol=1e-8)


def test_spectrum_dual_pass_fused_parity(raw_sources):
    """The dual-pass megakernel (both RT solves, one input read) matches
    the separate reflected + thermal fused kernels exactly in layout and
    to fp tolerance in value."""
    from picaso_tpu.rt.pallas_toon import (reflected_pallas_fused,
                                           spectrum_pallas_fused,
                                           thermal_pallas_fused)

    s = raw_sources
    nlayer, nwno = s['nlayer'], s['nwno']
    rng = np.random.default_rng(5)
    ubar0 = jnp.asarray(rng.uniform(0.1, 1.0, (3, 1)))
    ubar1 = jnp.asarray(rng.uniform(0.1, 1.0, (3, 1)))
    surf = jnp.zeros(nwno)
    F0PI = jnp.ones(nwno)
    tlevel = jnp.asarray(np.linspace(400.0, 1600.0, nlayer + 1))
    plevel = jnp.asarray(np.logspace(-4, 2, nlayer + 1))
    wno = jnp.asarray(np.linspace(300.0, 20000.0, nwno))
    all_b = blackbody(tlevel, 1.0 / wno)
    ptfac = plevel[0] / (plevel[1] - plevel[0])
    c = ScatteringControls(single_phase=3)
    args = (jnp.asarray(s['taugas']), jnp.asarray(s['tauray']),
            jnp.asarray(s['copd']), jnp.asarray(s['cw0']),
            jnp.asarray(s['cg0']))

    ref_xint = reflected_pallas_fused(
        *args, jnp.asarray(s['rf']), surf, ubar0, ubar1, 0.5, F0PI, c,
        stream=2, delta_eddington=True, block_w=256, interpret=True)
    ref_therm = thermal_pallas_fused(
        all_b, *args, ptfac, surf, ubar1, hard_surface=False,
        block_w=256, interpret=True)

    xint, therm = spectrum_pallas_fused(
        all_b, *args, jnp.asarray(s['rf']), ptfac, surf, ubar0, ubar1,
        0.5, F0PI, c, stream=2, delta_eddington=True,
        hard_surface=False, block_w=256, interpret=True)
    np.testing.assert_allclose(np.asarray(xint), np.asarray(ref_xint),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(therm), np.asarray(ref_therm),
                               rtol=2e-6)


def test_interp_tau_blocked_quantized_parity():
    """int16 fixed-point blocked table tracks the f32 XLA path to the
    ~1e-3 dex quantization error bound."""
    from picaso_tpu.opacities.db import _find_indices, interp_molecular
    from picaso_tpu.opacities import assemble
    from picaso_tpu.opacities.factory import synthetic_opacity_grid
    from picaso_tpu.opacities.pallas_interp import (
        blocked_table, interp_tau_pallas_blocked)

    nwno, nlayer = 700, 12
    wno = np.linspace(1000.0, 15000.0, nwno)
    grid = synthetic_opacity_grid(wno, molecules=('H2O', 'CH4', 'CO'),
                                  ntemp=6, npress=5)
    rng = np.random.default_rng(7)
    tlayer = jnp.asarray(rng.uniform(200.0, 2400.0, nlayer))
    player = jnp.asarray(np.logspace(-5, 2, nlayer))
    colden = jnp.asarray(rng.uniform(1.0, 100.0, nlayer))
    mmw = jnp.asarray(rng.uniform(2.2, 2.4, nlayer))
    mix = jnp.asarray(rng.uniform(1e-6, 1e-3, (3, nlayer)))

    kappa = interp_molecular(grid, tlayer, player)
    ref = np.asarray(assemble.molecular_tau(kappa, mix, colden, mmw))

    t_w, p_w, idx = _find_indices(grid.pt, tlayer, player)
    mixcol = mix * colden[None, :] / mmw[None, :]
    q, qp = blocked_table(grid.log_kappa, block_w=256, quantize=True)
    assert q.dtype == jnp.int16
    out = np.asarray(interp_tau_pallas_blocked(
        q, idx, t_w, p_w, mixcol, nwno, qparams=qp, interpret=True))
    # quantization step in log10 over the table range; mixing-sum error
    # is bounded by the per-molecule relative error
    step = float(qp[0])
    rtol = 10.0 ** (0.5 * step) - 1.0 + 1e-4
    np.testing.assert_allclose(out, ref, rtol=5 * rtol)

    g2 = grid.with_blocked_table(block_w=256, quantize=True)
    assert g2.log_kappa_blocked.dtype == jnp.int16
    assert g2.blocked_qparams is not None

    # missing qparams must be an explicit error
    with pytest.raises(ValueError):
        interp_tau_pallas_blocked(q, idx, t_w, p_w, mixcol, nwno,
                                  interpret=True)
