"""Slot-stabilization cost probe for the blocked gather.

Times the full forward with (a) the current parity-based slot
stabilization, (b) stabilization bypassed (identity).  Historical
finding: the first greedy lax.scan version cost ~2 ms per forward
dispatch (113 vs 149 spectra/s) because its ~90 sequential [4]-wide
steps serialized on the VPU; the parity form is elementwise and free.
Usage: python scripts/stab_cost_probe.py [nwno] [n_iter]
"""
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax

import bench
from picaso_tpu import pipeline
from picaso_tpu.opacities import pallas_interp as pi


def rate(fn, scenes, n_iter):
    out = fn(scenes[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = fn(scenes[1 + i % (len(scenes) - 1)])
    jax.block_until_ready(out)
    return n_iter / (time.perf_counter() - t0)


def main():
    nwno = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    scene, grid, config = bench.build_problem(nwno)
    scenes = bench._perturbed(scene, n_iter + 1)
    bench._warm_tunnel()

    fwd = lambda s: pipeline.forward(s, grid, config)
    gat = lambda s: pipeline.gather_taugas(s, grid, config)

    r_f_stab = rate(fwd, scenes, n_iter)
    r_g_stab = rate(gat, scenes, n_iter)
    print(f'stabilized:  forward {r_f_stab:7.1f}/s   '
          f'gather {1e3 / r_g_stab:6.2f} ms')

    orig = pi._parity_slots
    pi._parity_slots = lambda idx, w4, a, b: (idx, w4)
    jax.clear_caches()
    try:
        r_f_id = rate(fwd, scenes, n_iter)
        r_g_id = rate(gat, scenes, n_iter)
        print(f'identity:    forward {r_f_id:7.1f}/s   '
              f'gather {1e3 / r_g_id:6.2f} ms')
    finally:
        pi._parity_slots = orig
        jax.clear_caches()


main()
