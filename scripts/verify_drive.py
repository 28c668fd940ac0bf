"""Verify drive: scan-vs-pallas forward agreement at production shape.

Exercises the slot-stabilized blocked gather (opacities/pallas_interp)
inside the full fused forward on the real TPU, plus the batched path.
"""
import dataclasses
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax

from bench import build_problem, _warm_tunnel, _perturbed
from picaso_tpu import pipeline


def main():
    scene, grid, config = build_problem(50_000)
    _warm_tunnel()
    t0 = time.perf_counter()

    cfg_scan = dataclasses.replace(config, use_pallas=False)
    out = pipeline.forward(scene, grid, cfg_scan)          # scan path
    out = {k: np.asarray(v) for k, v in out.items()}
    print(f'[{time.perf_counter()-t0:6.1f}s] scan path done:',
          sorted(out))

    cfg = dataclasses.replace(config, use_pallas=True)
    if grid.log_kappa_blocked is None:
        grid = grid.with_blocked_table()
    out_p = pipeline.forward(scene, grid, cfg)             # pallas path
    out_p = {k: np.asarray(v) for k, v in out_p.items()}
    print(f'[{time.perf_counter()-t0:6.1f}s] pallas path done')

    ok = True
    for k in out:
        a, b = out[k], out_p[k]
        nan_a, nan_b = np.isnan(a).sum(), np.isnan(b).sum()
        scale = np.maximum(np.abs(a), np.abs(a).max() * 1e-3)
        rel = np.max(np.abs(a - b) / scale)
        print(f'  {k}: nan(scan)={nan_a} nan(pallas)={nan_b} '
              f'max_rel={rel:.3e} range=[{b.min():.3e},{b.max():.3e}]')
        if nan_a or nan_b or rel > 5e-3:
            ok = False

    # batched path through the same pallas gather (vmapped kernel)
    scenes = _perturbed(scene, 4)
    batch = pipeline.stack_scenes(scenes)
    outb = pipeline.forward_batch(batch, grid, cfg)
    outb = {k: np.asarray(v) for k, v in outb.items()}
    for k in outb:
        n = np.isnan(outb[k]).sum()
        print(f'  batch {k}: shape={outb[k].shape} nan={n}')
        if n:
            ok = False
    # batch row 0 is scenes[0] == scene: must match the single dispatch
    for k in out_p:
        rel = np.max(np.abs(outb[k][0] - out_p[k])
                     / np.maximum(np.abs(out_p[k]),
                                  np.abs(out_p[k]).max() * 1e-3))
        print(f'  batch[0] vs single {k}: max_rel={rel:.3e}')
        if rel > 1e-5:
            ok = False

    print('VERIFY', 'PASS' if ok else 'FAIL')
    sys.exit(0 if ok else 1)


main()
