"""Probe: do the RT megakernels' sequential layer sweeps waste 7/8 of
the VPU on (1, N) row ops?

Mosaic tiles f32 as (8 sublanes, 128 lanes); a [1, nang*bw] row slice
occupies ceil(N/128) vregs each with ONE valid sublane.  If the sweep
loops are issue-bound, repacking the sweep scratch so a layer slice is
a dense (RB, 128) tile block should cut vreg issue ~8x.

Times two equivalent kernels over identical data:
  A. rows:   scratch [nlayer, N], sweep on [1, N] slices (today's layout)
  B. packed: scratch [nlayer, 8, N/8], sweep on [1, 8, N/8] slices

Each sweep step mimics the reflected back-substitution arithmetic
(2 reciprocals + ~6 mul/sub per step).

Usage: python scripts/sweep_layout_probe.py [N_per_block] [nlayer] [nblocks]
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


def _step_rows(i, carry, b_s, c_s, d_s, o_s, nlayer):
    as_n, ds_n = carry
    sl = pl.ds(nlayer - 1 - i, 1)
    x = 1.0 / (b_s[sl] - c_s[sl] * as_n)
    as_o = d_s[sl] * x
    ds_o = (d_s[sl] - c_s[sl] * ds_n) * x
    y = 1.0 / (b_s[sl] + c_s[sl] * as_o)
    as_o2 = d_s[sl] * y
    ds_o2 = (d_s[sl] - b_s[sl] * ds_o) * y
    o_s[sl] = ds_o2
    return (as_o2, ds_o2)


def _kernel(b_ref, c_ref, d_ref, out_ref, *, nlayer):
    b = b_ref[...]
    first = (b[:1] * 0 + 1.0, b[:1] * 0 + 0.5)
    step = partial(_step_rows, b_s=b_ref, c_s=c_ref, d_s=d_ref,
                   o_s=out_ref, nlayer=nlayer)
    jax.lax.fori_loop(0, nlayer, step, first)


def run(shape_in, shape_block, label, n_iter=50):
    nlayer = shape_in[0]
    key = jax.random.PRNGKey(0)
    mk = lambda k: 1.5 + 0.1 * jax.random.uniform(k, shape_in, jnp.float32)
    b, c, d = (mk(k) for k in jax.random.split(key, 3))

    nd = len(shape_in)
    index_map = (lambda i: (0, i)) if nd == 2 else (lambda i: (0, i, 0))
    grid = (shape_in[1] // shape_block[1],)
    spec = pl.BlockSpec(shape_block, index_map)

    f = pl.pallas_call(
        partial(_kernel, nlayer=nlayer),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape_in, jnp.float32),
    )
    f = jax.jit(f)
    out = f(b, c, d)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = f(b, c + 1e-6 * i, d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    lanes = int(np.prod(shape_in))
    print(f'{label:36s} {dt*1e3:8.3f} ms  ({lanes} elems)')
    return dt, np.asarray(out)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1920   # nang*bw today
    nlayer = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    nblocks = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    np.asarray(jnp.zeros(1))  # tunnel warmup

    total = N * nblocks
    ta, oa = run((nlayer, total), (nlayer, N), f'A rows [{nlayer},{N}]')
    # same data viewed packed: [nlayer, 8, N/8]
    tb, ob = run((nlayer, 8, total // 8), (nlayer, 8, N // 8),
                 f'B packed [{nlayer},8,{N//8}]')
    # wider packed block (2 dense vregs per slice)
    tc, oc = run((nlayer, 8, total // 8), (nlayer, 8, N // 4),
                 f'C packed wide [{nlayer},8,{N//4}]')
    print(f'packed speedup vs rows: {ta/tb:.2f}x (wide {ta/tc:.2f}x)')
    # correctness: same arithmetic on a permutation of the data — compare
    # the multiset statistics instead of elementwise
    print('means:', oa.mean(), ob.mean(), oc.mean())


main()
