"""Pallas TPU gather-fused molecular opacity interpolation.

The XLA path (db.interp_molecular + assemble.molecular_tau) materializes
the gathered [nmol, 4, nlayer, nwno] neighbor array plus the
[nmol, nlayer, nwno] cross sections (~1.5 GB of HBM traffic at the bench
shape; measured 5.7-6.4 ms).  This kernel uses scalar-prefetched
neighbor indices so each grid step DMAs the four (T, P) neighbor rows of
the opacity table straight from HBM into VMEM, does the bilinear
combination in log space, exponentiates, applies the per-(molecule,
layer) mixing-ratio column weights, and writes only the final
taugas [nlayer, nwno] — one read of the needed table rows, one small
write.

Arithmetic is identical to db.interp_molecular (optics.py:2241-2308 of
the reference) followed by assemble.molecular_tau; parity is asserted by
tests/test_pallas_toon.py::test_interp_tau_parity.

Performance record (production shape: 16 mols x 1060-pt ragged grid x
nwno=50k x 90 layers, TPU v5e, f32):
  - this kernel: 13.3 ms (~115 GB/s effective for the gathered rows)
  - XLA gather path (interp_molecular + molecular_tau): ~44 ms
  - sequential full-table read on the same device: 450 GB/s, so the gap
    is the gathered-row access pattern (16 strided 64 KB chunks at
    ~212 MB stride per block), not DMA concurrency: a manual
    double-buffered streaming variant with 8 outstanding DMAs measured
    the same 13.4 ms.
  - a distinct-row dedup rewrite (adjacent layers share ~80% of their
    neighbor rows) would cut bytes ~5x, but single-row DMA into VMEM
    collides with Mosaic's (8, 128) tiling rules — the unit-axis
    workaround mislays out the staging buffer on hardware (correct under
    interpret).  Revisit when Mosaic supports sub-tile row staging or
    via a [npt, nwno, 8-row-tile] table layout.

Round-4 update (blocked layout, scripts/gather_probe.py): the dedup IS
realized in interp_tau_pallas_blocked without any staging tricks, by
(a) making the LAYER axis the innermost grid dimension and (b) fixing
each neighbor row's slot to its OWN grid parity, slot = 2*(t%2)+(p%2)
(_parity_slots), so a row shared by consecutive layers always sits in
the same slot.  Mosaic's pipeline skips the copy for an input whose
block index is unchanged between consecutive grid steps, so the fetched
rows drop from 4*nlayer=360 to the 73 distinct rows of the whole
profile (1.16 -> 0.23 GB).  The remaining stage time is the kernel's
own VPU compute (the exp + bilinear/mix arithmetic: int16 halving of
the bytes moves the time < 8%, and an all-constant index — zero DMA
after the first step — still costs ~1.5 ms), i.e. the gather stage is
compute-bound, not HBM-bound.  (A first attempt chained slot ids with
a 90-step lax.scan of [4]-wide ops; its sequential dispatch cost ~2 ms
per forward — parity is equivalent for elision and free.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import AVOGADRO

__all__ = ['interp_tau_pallas']

_LN10 = float(np.log(10.0))
_LOG_AVO = float(np.log10(AVOGADRO))


def _kernel(idx_ref, w_ref, mix_ref, k0_ref, k1_ref, k2_ref, k3_ref,
            out_ref, *, nmol):
    l = pl.program_id(0)
    logk = (w_ref[0, l] * k0_ref[:, 0, 0, :]
            + w_ref[1, l] * k1_ref[:, 0, 0, :]
            + w_ref[2, l] * k2_ref[:, 0, 0, :]
            + w_ref[3, l] * k3_ref[:, 0, 0, :])
    kappa = jnp.exp(_LN10 * (logk + _LOG_AVO))   # [nmol, bw]
    acc = mix_ref[0, l] * kappa[0:1, :]
    for m in range(1, nmol):
        acc = acc + mix_ref[m, l] * kappa[m:m + 1, :]
    out_ref[...] = acc.reshape(1, 1, -1)


@partial(jax.jit, static_argnames=('block_w', 'interpret'))
def interp_tau_pallas(log_kappa, idx, t_w, p_w, mixcol, block_w=16384,
                      interpret=False):
    """taugas [nlayer, nwno] from the log-opacity table in one kernel.

    log_kappa: [nmol, npt, nwno] log10 cross sections (HBM resident);
    idx: [4, nlayer] int32 rows per layer in the neighbor order
    (ll, hl, hh, lh) of db._find_indices; t_w/p_w: [nlayer] bilinear
    weights; mixcol: [nmol, nlayer] mixing-ratio * colden / mmw column
    weights (assemble.molecular_tau's contraction).
    """
    nmol, npt, nwno = log_kappa.shape
    nlayer = idx.shape[1]
    w4 = jnp.stack([(1 - t_w) * (1 - p_w), t_w * (1 - p_w),
                    t_w * p_w, (1 - t_w) * p_w], 0).astype(log_kappa.dtype)
    mixcol = mixcol.astype(log_kappa.dtype)
    idx = idx.astype(jnp.int32)
    block_w = min(block_w, nwno)
    nwb = -(-nwno // block_w)
    # unit axes keep the block shapes legal under the Mosaic (8, 128)
    # tiling rule (second-to-last block dim == array dim == 1)
    kq = log_kappa.reshape(nmol, npt, 1, nwno)

    def make_spec(q):
        return pl.BlockSpec((nmol, 1, 1, block_w),
                            lambda l, b, idx_ref, w_ref, mix_ref:
                            (0, idx_ref[q, l], 0, b))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nlayer, nwb),
        in_specs=[make_spec(0), make_spec(1), make_spec(2), make_spec(3)],
        out_specs=pl.BlockSpec((1, 1, block_w),
                               lambda l, b, *refs: (l, 0, b)),
    )
    out = pl.pallas_call(
        partial(_kernel, nmol=nmol),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nlayer, 1, nwno), log_kappa.dtype),
        interpret=interpret,
    )(idx, w4, mixcol, kq, kq, kq, kq)
    return out.reshape(nlayer, nwno)


# ---------------------------------------------------------------------------
# wavelength-block-major table layout: contiguous row fetches
# ---------------------------------------------------------------------------

def blocked_table(log_kappa, block_w=16384, quantize=False):
    """Repack [nmol, npt, nwno] -> [npt, nwb, nmol, block_w] (padded with
    the 1e-50 floor).

    In the flat layout a (layer, wavelength-block) fetch is nmol strided
    chunks of block_w*4 bytes ~212 MB apart — measured ~115 GB/s
    effective on v5e (the whole-table sequential rate is 450 GB/s).  In
    the blocked layout each of the 4 neighbor-row fetches is ONE
    contiguous nmol*block_w*4-byte DMA.

    quantize=True additionally stores the table as int16 fixed point in
    log10 space (returns ``(qtable, qparams)`` with qparams=[scale,
    offset] f32).  The uniform log10 step over the table's full range is
    ~1e-3 dex (<0.3 % in opacity) — far below the (T, P)-grid
    interpolation error — and the gather stage's HBM traffic halves.
    """
    nmol, npt, nwno = log_kappa.shape
    # block_w is an upper bound: pick the number of blocks it implies,
    # then shrink the block to the smallest 128-multiple that still
    # covers nwno — otherwise a grid like nwno=50000 pads 4x16384 blocks
    # to 65536 lanes and 31% of the gather's HBM traffic (and VPU work)
    # is spent on padding
    block_w = max(128, min(block_w, nwno) // 128 * 128)
    nwb = -(-nwno // block_w)
    per_block = -(-nwno // nwb)
    block_w = -(-per_block // 128) * 128
    # the repacks run as ONE jitted program each: eager op-by-op
    # dispatch holds several table-sized temps at once (pad + reshape +
    # transpose copies), which OOMs a 16 GB chip next to the flat table
    # at production shape
    if quantize:
        return _repack_quantized(log_kappa, nwb, block_w)
    return _repack_f32(log_kappa, nwb, block_w)


@partial(jax.jit, static_argnames=('nwb', 'block_w'))
def _repack_f32(log_kappa, nwb, block_w):
    nmol, npt, nwno = log_kappa.shape
    lk = jnp.pad(log_kappa, ((0, 0), (0, 0), (0, nwb * block_w - nwno)),
                 constant_values=-50.0)
    return jnp.transpose(lk.reshape(nmol, npt, nwb, block_w),
                         (1, 2, 0, 3))


@partial(jax.jit, static_argnames=('nwb', 'block_w'))
def _repack_quantized(log_kappa, nwb, block_w):
    nmol, npt, nwno = log_kappa.shape
    # range over the unpadded table; the -50 padding clips to the bottom
    # code (those lanes are sliced off after the gather kernel anyway)
    lo = jnp.min(log_kappa).astype(jnp.float32)
    hi = jnp.max(log_kappa).astype(jnp.float32)
    scale = jnp.maximum(hi - lo, 1e-6) / 65534.0
    # quantize BEFORE pad/transpose so the big temps are int16
    q = jnp.clip(jnp.round((log_kappa - lo) / scale) - 32767.0,
                 -32767, 32767).astype(jnp.int16)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, nwb * block_w - nwno)),
                constant_values=np.int16(-32767))
    q = jnp.transpose(q.reshape(nmol, npt, nwb, block_w), (1, 2, 0, 3))
    # the kernel computes logk = (sum_i w_i q_i) * scale + offset with
    # sum w_i == 1, so fold the +32767 re-centering into the offset
    qparams = jnp.stack([scale, 32767.0 * scale + lo]).astype(jnp.float32)
    return q, qparams


def _parity_slots(idx, w4, t_par, p_par):
    """Assign each layer's four (row, weight) pairs to the slot given by
    the corner's OWN grid parity, slot = 2*(t%2) + (p%2): a physical
    (T, P) row then occupies the SAME slot in every layer that touches
    it (adjacent layers share most of their 4 bilinear rows — the
    profile walks the grid cell by cell).

    With the layer axis INNERMOST in the gather grid, a slot whose row
    id is unchanged between consecutive grid steps maps to an unchanged
    block index, and Mosaic's pipeline skips the re-fetch — measured at
    the production shape this cuts the fetched bytes 360 -> 73 rows
    (every distinct row exactly once; 1.16 -> 0.23 GB).

    Pure elementwise value-permutation (the first version chained slot
    ids layer-to-layer with a lax.scan of tiny [4]-wide steps, whose
    ~90-step sequential dispatch cost ~2 ms — a third of the whole
    forward; parity needs no chain and is free).  The (row, weight)
    pairs travel together, so the bilinear sum is unchanged up to f32
    addition order.

    ``idx``/``w4`` rows are corner-ordered (t_lo,p_lo), (t_hi,p_lo),
    (t_hi,p_hi), (t_lo,p_hi) (db._find_indices); ``t_par``/``p_par``
    are the base-corner parities t_lo % 2 / p_lo % 2.
    """
    a = t_par.astype(jnp.int32)
    b = p_par.astype(jnp.int32)
    slot = jnp.stack([2 * a + b,                  # (t_lo, p_lo)
                      2 * (1 - a) + b,            # (t_hi, p_lo)
                      2 * (1 - a) + (1 - b),      # (t_hi, p_hi)
                      2 * a + (1 - b)], 0)        # (t_lo, p_hi)
    onehot = (slot[:, None, :] == jnp.arange(4)[None, :, None])
    idx_st = (idx[:, None, :] * onehot).sum(0)
    w_st = (w4[:, None, :] * onehot).sum(0)
    return idx_st, w_st


def _blocked_kernel(idx_ref, w_ref, mix_ref, k0_ref, k1_ref, k2_ref,
                    k3_ref, out_ref, *, nmol):
    l = pl.program_id(1)
    logk = (w_ref[0, l] * k0_ref[0, 0] + w_ref[1, l] * k1_ref[0, 0]
            + w_ref[2, l] * k2_ref[0, 0] + w_ref[3, l] * k3_ref[0, 0])
    kappa = jnp.exp(_LN10 * (logk + _LOG_AVO))   # [nmol, bw]
    acc = mix_ref[0, l] * kappa[0:1, :]
    for m in range(1, nmol):
        acc = acc + mix_ref[m, l] * kappa[m:m + 1, :]
    out_ref[...] = acc.reshape(1, 1, -1)


def _blocked_kernel_q(idx_ref, w_ref, mix_ref, qp_ref, k0_ref, k1_ref,
                      k2_ref, k3_ref, out_ref, *, nmol):
    """int16 fixed-point variant: the four neighbor rows arrive quantized
    in log10 space; with the bilinear weights summing to 1 a single
    dequantize after the weighted sum is exact."""
    l = pl.program_id(1)
    f = jnp.float32
    qbar = (w_ref[0, l] * k0_ref[0, 0].astype(f)
            + w_ref[1, l] * k1_ref[0, 0].astype(f)
            + w_ref[2, l] * k2_ref[0, 0].astype(f)
            + w_ref[3, l] * k3_ref[0, 0].astype(f))
    logk = qbar * qp_ref[0] + qp_ref[1]
    kappa = jnp.exp(_LN10 * (logk + _LOG_AVO))   # [nmol, bw]
    acc = mix_ref[0, l] * kappa[0:1, :]
    for m in range(1, nmol):
        acc = acc + mix_ref[m, l] * kappa[m:m + 1, :]
    out_ref[...] = acc.reshape(1, 1, -1)


@partial(jax.jit, static_argnames=('nwno', 'interpret'))
def interp_tau_pallas_blocked(blocked, idx, t_w, p_w, mixcol, nwno,
                              qparams=None, parity=None, interpret=False):
    """taugas [nlayer, nwno] from a :func:`blocked_table` layout —
    identical arithmetic to :func:`interp_tau_pallas`.  An int16
    ``blocked`` (from ``blocked_table(..., quantize=True)``) requires the
    matching ``qparams`` and halves the gather's HBM traffic.  ``parity``
    is the (t_low % 2, p_low % 2) pair from ``_find_indices(...,
    return_parity=True)``: when given, the four (row, weight) pairs are
    slot-stabilized so Mosaic elides re-fetches of rows shared between
    consecutive layers (see :func:`_parity_slots`); without it the
    gather is still correct, just without the DMA dedup."""
    npt, nwb, nmol, block_w = blocked.shape
    nlayer = idx.shape[1]
    quantized = blocked.dtype == jnp.int16
    wdtype = jnp.float32 if quantized else blocked.dtype
    w4 = jnp.stack([(1 - t_w) * (1 - p_w), t_w * (1 - p_w),
                    t_w * p_w, (1 - t_w) * p_w], 0).astype(wdtype)
    mixcol = mixcol.astype(wdtype)
    idx = idx.astype(jnp.int32)
    if parity is not None:
        # slot-stabilized, layer-innermost grid: unchanged slot rows
        # between consecutive layers are not re-fetched (_parity_slots)
        idx, w4 = _parity_slots(idx, w4, *parity)

    nscalar = 4 if quantized else 3

    def make_spec(q):
        return pl.BlockSpec((1, 1, nmol, block_w),
                            lambda b, l, idx_ref, *rest:
                            (idx_ref[q, l], b, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nscalar,
        grid=(nwb, nlayer),
        in_specs=[make_spec(0), make_spec(1), make_spec(2), make_spec(3)],
        out_specs=pl.BlockSpec((1, 1, block_w),
                               lambda b, l, *refs: (l, 0, b)),
    )
    if quantized:
        if qparams is None:
            raise ValueError('int16 blocked table requires qparams')
        kernel = partial(_blocked_kernel_q, nmol=nmol)
        scalars = (idx, w4, mixcol, qparams.astype(jnp.float32))
    else:
        kernel = partial(_blocked_kernel, nmol=nmol)
        scalars = (idx, w4, mixcol)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nlayer, 1, nwb * block_w), wdtype),
        interpret=interpret,
    )(*scalars, blocked, blocked, blocked, blocked)
    return out.reshape(nlayer, -1)[:, :nwno]
