"""Diagnose the SH4 block-tridiagonal solve at f32 and test the
row-regrouping fix.

The round-3 grouping puts [interface-k pl-rows; interface-(k+1) mn-rows]
in block-row k, whose diagonal block degenerates for optically thin
layers (both halves measure the same flux combination as
exp(-lam dtau) -> 1, singular at f32).  The regrouped system pairs
[interface-k mn-rows; interface-(k+1) pl-rows] so every diagonal block
is the layer's "incoming-field" matrix [T[k,:h]; Fm[k,h:]] —
nonsingular for thin (det ~ Q1^2 - Q2^2 e^2) AND thick (diagonal)
layers.  Same equations, same unknowns, different block-row pairing.
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

from picaso_tpu.optics import RTProps, _cumtau
from picaso_tpu.rt import sh as sh_mod
from picaso_tpu.rt.toon import ScatteringControls
from picaso_tpu.constants import PI


def make_props(nlayer=90, nwno=64, seed=0):
    rng = np.random.default_rng(seed)
    base = np.logspace(-9, 2, nlayer)[:, None]
    dtau = base * 10 ** rng.uniform(-2, 2, (nlayer, nwno))
    w0 = np.clip(rng.uniform(0.3, 1.0, (nlayer, nwno)), None, 0.999999)
    # make a few columns fully conservative + thin (worst case)
    w0[:, :4] = 0.999999
    cosb = rng.uniform(0.0, 0.9, (nlayer, nwno))
    ftau_cld = rng.uniform(0.2, 1.0, (nlayer, nwno))
    ftau_ray = 1.0 - ftau_cld
    f_dm = cosb ** 2
    dtau_dedd = dtau * (1 - w0 * f_dm)
    w0_dedd = w0 * (1 - f_dm) / (1 - w0 * f_dm)
    cosb_dedd = (cosb - f_dm) / (1 - f_dm)
    arr = lambda x: jnp.asarray(x, jnp.float64)
    return RTProps(dtau=arr(dtau_dedd), tau=arr(_cumtau(dtau_dedd)),
                   w0=arr(w0_dedd), cosb=arr(cosb_dedd),
                   ftau_cld=arr(ftau_cld), ftau_ray=arr(ftau_ray),
                   gcos2=arr(0 * cosb), dtau_og=arr(dtau),
                   tau_og=arr(_cumtau(dtau)), w0_og=arr(w0),
                   cosb_og=arr(cosb), w0_no_raman=arr(w0),
                   f_deltaM=arr(f_dm))


def build_parts(props, stream=4, nang=6):
    """T, Fm, z terms straight from the rt.sh assembly (eager f64)."""
    controls = ScatteringControls()
    u0s = jnp.asarray(np.linspace(0.15, 0.95, nang))
    dtau, tau, w0 = props.dtau, props.tau, props.w0
    w_single = sh_mod._w_expansions(stream, 0, 1, props.cosb_og,
                                    props.ftau_cld, props.ftau_ray,
                                    props.f_deltaM, controls)
    w_multi = w_single
    a = jnp.stack([(2 * l + 1) - w0 * w_multi[l] for l in range(stream)])
    Pu0s = sh_mod.legP(-u0s[:, None, None])
    F0PI = jnp.ones(dtau.shape[1])
    b = jnp.stack([(F0PI * (w0 * w_single[l]))[None] * Pu0s[l] / (4 * PI)
                   for l in range(stream)])
    b_surface = jnp.zeros((nang, dtau.shape[1]))
    if stream == 4:
        T, Fm, z_down, z_up, btv, bsv, aux = sh_mod._sh4_system(
            w0, dtau, tau, a, b, 0.0, b_surface, -b_surface / 4, 0.0,
            u0s, 0)
    else:
        T, Fm, z_down, z_up, btv, bsv, aux = sh_mod._sh2_system(
            w0, dtau, tau, a, b, 0.0, b_surface, 0.0, u0s, 0)
    return [np.asarray(x) for x in (T, Fm, z_down, z_up, btv, bsv)]


def assemble_current(T, Fm, z_down, z_up, btv, bsv, surf_reflect=0.0):
    """Round-3 grouping (rt/sh.py::_solve_sh)."""
    n, s, _, nw = T.shape
    h = s // 2
    nr = z_down.shape[0]
    zero_blk = np.zeros((n - 1, h, s, nw))
    A = np.concatenate([np.zeros((1, s, s, nw)),
                        np.concatenate([Fm[:-1, h:], zero_blk], 1)], 0)
    B_first = np.concatenate([T[0, :h][None], Fm[0, :h][None]], 1)
    B_mid = np.concatenate([-T[1:-1, h:], Fm[1:-1, :h]], 1)
    B_last = np.concatenate([-T[-1, h:][None],
                             (Fm[-1, h:] - surf_reflect * Fm[-1, :h])[None]],
                            1)
    B = np.concatenate([B_first, B_mid, B_last], 0)
    C = np.concatenate([np.concatenate([zero_blk, -T[1:, :h]], 1),
                        np.zeros((1, s, s, nw))], 0)
    D_first = np.concatenate([btv - z_down[:, 0, :h],
                              z_down[:, 1, :h] - z_up[:, 0, :h]], 1)[:, None]
    D_mid = np.concatenate([z_down[:, 1:-1, h:] - z_up[:, :-2, h:],
                            z_down[:, 2:, :h] - z_up[:, 1:-1, :h]], 2)
    D_last = np.concatenate([z_down[:, -1, h:] - z_up[:, -2, h:],
                             bsv - z_up[:, -1, h:]
                             + surf_reflect * z_up[:, -1, :h]], 1)[:, None]
    D = np.concatenate([D_first, D_mid, D_last], 1)
    D = np.moveaxis(D, 0, 2)
    return A, B, C, D


def assemble_regrouped(T, Fm, z_down, z_up, btv, bsv, surf_reflect=0.0):
    """Incoming-field grouping: block-row k = [interface-k mn rows;
    interface-(k+1) pl rows] (interface 0 = top BC, n = bottom BC)."""
    n, s, _, nw = T.shape
    h = s // 2
    zero_blk = np.zeros((n - 1, h, s, nw))
    # A[k] (k>=1): [Fm[k-1,:h]; 0]
    A = np.concatenate([np.zeros((1, s, s, nw)),
                        np.concatenate([Fm[:-1, :h], zero_blk], 1)], 0)
    # B: first [T[0,:h]; Fm[0,h:]], mid [-T[k,:h]; Fm[k,h:]],
    # last [-T[-1,:h]; Fm[-1,h:] - refl*Fm[-1,:h]]
    B_first = np.concatenate([T[0, :h][None], Fm[0, h:][None]], 1)
    B_mid = np.concatenate([-T[1:-1, :h], Fm[1:-1, h:]], 1)
    B_last = np.concatenate([-T[-1, :h][None],
                             (Fm[-1, h:] - surf_reflect * Fm[-1, :h])[None]],
                            1)
    B = np.concatenate([B_first, B_mid, B_last], 0)
    # C[k] (k<n-1): [0; -T[k+1,h:]]
    C = np.concatenate([np.concatenate([zero_blk, -T[1:, h:]], 1),
                        np.zeros((1, s, s, nw))], 0)
    # D: row k = [interface-k mn rhs; interface-(k+1) pl rhs]
    D_first = np.concatenate([btv - z_down[:, 0, :h],
                              z_down[:, 1, h:] - z_up[:, 0, h:]], 1)[:, None]
    D_mid = np.concatenate([z_down[:, 1:-1, :h] - z_up[:, :-2, :h],
                            z_down[:, 2:, h:] - z_up[:, 1:-1, h:]], 2)
    D_last = np.concatenate([z_down[:, -1, :h] - z_up[:, -2, :h],
                             bsv - z_up[:, -1, h:]
                             + surf_reflect * z_up[:, -1, :h]], 1)[:, None]
    D = np.concatenate([D_first, D_mid, D_last], 1)
    D = np.moveaxis(D, 0, 2)
    return A, B, C, D


def np_solve(A, B, C, D, dtype):
    A, B, C, D = (x.astype(dtype) for x in (A, B, C, D))
    n, s, nr, nw = D.shape
    Cp = np.empty_like(B)
    Dp = np.empty_like(D)
    Bw = np.moveaxis(B, 3, 1)   # [n, nw, s, s]
    Aw = np.moveaxis(A, 3, 1)
    Cw = np.moveaxis(C, 3, 1)
    Dw = np.moveaxis(D, 3, 1)   # [n, nw, s, nr]
    Cpw = np.empty_like(Bw)
    Dpw = np.empty_like(Dw)
    Cpw[0] = np.linalg.solve(Bw[0], Cw[0])
    Dpw[0] = np.linalg.solve(Bw[0], Dw[0])
    for k in range(1, n):
        den = Bw[k] - Aw[k] @ Cpw[k - 1]
        Cpw[k] = np.linalg.solve(den, Cw[k])
        Dpw[k] = np.linalg.solve(den, Dw[k] - Aw[k] @ Dpw[k - 1])
    yw = np.empty_like(Dw)
    yw[-1] = Dpw[-1]
    for k in range(n - 2, -1, -1):
        yw[k] = Dpw[k] - Cpw[k] @ yw[k + 1]
    return np.moveaxis(yw, 1, 3)


def main():
    for stream in (4, 2):
        props = make_props()
        T, Fm, z_down, z_up, btv, bsv = build_parts(props, stream)
        n, s, _, nw = T.shape
        h = s // 2
        sysc = assemble_current(T, Fm, z_down, z_up, btv, bsv)
        sysr = assemble_regrouped(T, Fm, z_down, z_up, btv, bsv)

        y64c = np_solve(*sysc, np.float64)
        y64r = np_solve(*sysr, np.float64)
        scale = np.abs(y64c).max(axis=(0, 1, 2))
        agree = np.abs(y64r - y64c).max() / np.abs(y64c).max()
        print(f'--- SH{stream} --- regrouped-vs-current f64 agreement: '
              f'{agree:.2e}')
        try:
            y32c = np_solve(*sysc, np.float32).astype(np.float64)
            errc = np.abs(y32c - y64c).max(axis=(0, 1, 2)) / scale
            print('current   f32: max %.2e med %.2e' % (errc.max(),
                                                        np.median(errc)))
        except np.linalg.LinAlgError as e:
            print('current   f32: SINGULAR (%s)' % e)
        y32r = np_solve(*sysr, np.float32).astype(np.float64)
        errr = np.abs(y32r - y64c).max(axis=(0, 1, 2)) / scale
        print('regrouped f32: max %.2e med %.2e' % (errr.max(),
                                                    np.median(errr)))


if __name__ == '__main__':
    main()
