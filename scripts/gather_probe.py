"""Gather-stage boundedness + DMA-elision probe (TPU diagnosis).

Questions this answers, at production shape (16 mol, ragged 1060 PT
grid, nwno=50000, nlevel=91):
  1. What does the blocked gather cost today (f32 and int16)?  If int16
     ~halves the time, the stage is bandwidth-bound and byte dedup pays.
  2. Does Mosaic's pipeline skip re-fetching an input block whose index
     map output is unchanged between consecutive grid steps?  Tested
     with a layer-innermost grid and (a) constant idx (every step maps
     to the same row -> maximal elision opportunity) and (b) the real
     profile with greedy slot stabilization (adjacent layers share
     ~70-85%% of their 4 neighbor rows once slots are matched).
  3. How many distinct row fetches does a real profile actually need
     (the byte floor for a dedup kernel)?

Usage: python scripts/gather_probe.py [nwno] [n_iter]
"""
import sys
import time
from functools import partial

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from picaso_tpu import pipeline
from picaso_tpu.constants import AVOGADRO, PCONV
from picaso_tpu.opacities.db import _find_indices

_LN10 = float(np.log(10.0))
_LOG_AVO = float(np.log10(AVOGADRO))


def _swapped_kernel(idx_ref, w_ref, mix_ref, k0_ref, k1_ref, k2_ref,
                    k3_ref, out_ref, *, nmol):
    l = pl.program_id(1)
    logk = (w_ref[0, l] * k0_ref[0, 0] + w_ref[1, l] * k1_ref[0, 0]
            + w_ref[2, l] * k2_ref[0, 0] + w_ref[3, l] * k3_ref[0, 0])
    kappa = jnp.exp(_LN10 * (logk + _LOG_AVO))
    acc = mix_ref[0, l] * kappa[0:1, :]
    for m in range(1, nmol):
        acc = acc + mix_ref[m, l] * kappa[m:m + 1, :]
    out_ref[...] = acc.reshape(1, 1, -1)


@partial(jax.jit, static_argnames=('nwno',))
def interp_tau_swapped(blocked, idx, w4, mixcol, nwno):
    """Layer-innermost grid: consecutive steps share b and step l, so a
    slot whose row id repeats maps to an UNCHANGED block index -> the
    pipeline may skip its copy."""
    npt, nwb, nmol, block_w = blocked.shape
    nlayer = idx.shape[1]
    w4 = w4.astype(blocked.dtype)
    mixcol = mixcol.astype(blocked.dtype)
    idx = idx.astype(jnp.int32)

    def make_spec(q):
        return pl.BlockSpec((1, 1, nmol, block_w),
                            lambda b, l, idx_ref, *rest:
                            (idx_ref[q, l], b, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nwb, nlayer),
        in_specs=[make_spec(0), make_spec(1), make_spec(2), make_spec(3)],
        out_specs=pl.BlockSpec((1, 1, block_w),
                               lambda b, l, *refs: (l, 0, b)),
    )
    out = pl.pallas_call(
        partial(_swapped_kernel, nmol=nmol),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nlayer, 1, nwb * block_w),
                                       blocked.dtype),
    )(idx, w4, mixcol, blocked, blocked, blocked, blocked)
    return out.reshape(nlayer, -1)[:, :nwno]


def stabilize_slots(idx, w4):
    """Permute each layer's 4 (row, weight) pairs so slot q keeps the
    same row id as the previous layer wherever the sets overlap."""
    idx = idx.copy()
    w4 = w4.copy()
    nlayer = idx.shape[1]
    for l in range(1, nlayer):
        prev = idx[:, l - 1]
        cur = idx[:, l].copy()
        cw = w4[:, l].copy()
        assign = [-1] * 4
        used = [False] * 4
        placed = [False] * 4
        for j in range(4):
            for i in range(4):
                if not used[i] and cur[j] == prev[i]:
                    assign[i] = j
                    used[i] = True
                    placed[j] = True
                    break
        for j in range(4):
            if not placed[j]:
                i = used.index(False)
                assign[i] = j
                used[i] = True
        idx[:, l] = cur[assign]
        w4[:, l] = cw[assign]
    return idx, w4


def fetch_stats(idx):
    nlayer = idx.shape[1]
    changes = 4 + int((idx[:, 1:] != idx[:, :-1]).sum())
    uniq = len(np.unique(idx))
    return changes, 4 * nlayer, uniq


def main():
    nwno = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    t0 = time.perf_counter()

    def mark(m):
        print(f'[+{time.perf_counter() - t0:6.1f}s] {m}', flush=True)

    scene, grid, config = bench.build_problem(nwno)
    bench._warm_tunnel()
    mark('built problem')

    nlayer = scene.tlayer.shape[0]
    mix_cols = scene.mix[jnp.asarray(
        [dict(config.mix_index)[grid.molecules[i]]
         for i in config.mol_indices])]
    t_w, p_w, idx = _find_indices(grid.pt, scene.tlayer,
                                  scene.player / PCONV)
    colw = scene.colden / scene.mmw_layer
    mixcol = jnp.zeros((len(grid.molecules), nlayer), scene.mix.dtype)
    for j, i in enumerate(config.mol_indices):
        mixcol = mixcol.at[i].set(mix_cols[j] * colw)
    w4 = jnp.stack([(1 - t_w) * (1 - p_w), t_w * (1 - p_w),
                    t_w * p_w, (1 - t_w) * p_w], 0)

    idx_np = np.asarray(idx)
    w4_np = np.asarray(w4)
    f0, tot, uniq = fetch_stats(idx_np)
    idx_st, w4_st = stabilize_slots(idx_np, w4_np)
    f1, _, _ = fetch_stats(idx_st)
    # sanity: stabilized == original result (same (row, weight) pairs)
    mark(f'fetch stats: naive={tot} slot-repeat-dedup raw={f0} '
         f'stabilized={f1} distinct-rows={uniq}')

    blocked = grid.log_kappa_blocked
    npt, nwb, nmol, block_w = blocked.shape
    mark(f'blocked table {blocked.shape} {blocked.dtype}')
    row_mb = nmol * block_w * 4 / 1e6
    mark(f'per-fetch DMA {row_mb:.2f} MB; naive bytes/spectrum '
         f'{tot * nwb * row_mb / 1e3:.2f} GB; stabilized floor '
         f'{f1 * nwb * row_mb / 1e3:.2f} GB; distinct floor '
         f'{uniq * nwb * row_mb / 1e3:.2f} GB')

    def timeit(label, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - ts) / n_iter * 1e3
        mark(f'{label}: {dt:.3f} ms')
        return dt

    gather = jax.jit(pipeline.gather_taugas, static_argnames=('config',))
    t_cur = timeit('current blocked gather (f32)', gather, scene, grid,
                   config)

    # int16 variant
    gq = grid._replace(log_kappa_blocked=None).with_blocked_table(
        quantize=True)
    jax.block_until_ready(gq.log_kappa_blocked)
    t_q = timeit('current blocked gather (int16)', gather, scene, gq,
                 config)

    # swapped grid, raw idx
    t_sw = timeit('swapped grid (raw idx)', interp_tau_swapped, blocked,
                  idx, w4, mixcol, nwno)
    # swapped grid, stabilized slots
    t_st = timeit('swapped grid (stabilized)', interp_tau_swapped,
                  blocked, jnp.asarray(idx_st), jnp.asarray(w4_st),
                  mixcol, nwno)
    # parity check
    ref = np.asarray(gather(scene, grid, config))
    got = np.asarray(interp_tau_swapped(blocked, jnp.asarray(idx_st),
                                        jnp.asarray(w4_st), mixcol, nwno))
    err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-30))
    mark(f'stabilized parity vs current: max rel {err:.2e}')
    # swapped grid, constant idx (elision upper bound)
    idx_const = jnp.zeros_like(idx)
    t_c = timeit('swapped grid (constant idx)', interp_tau_swapped,
                 blocked, idx_const, w4, mixcol, nwno)
    mark(f'summary ms: cur={t_cur:.2f} int16={t_q:.2f} raw-swap={t_sw:.2f} '
         f'stab-swap={t_st:.2f} const-swap={t_c:.2f}')


if __name__ == '__main__':
    main()
