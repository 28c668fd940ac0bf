"""Verify drive: SH4 Pallas megakernel vs scan path on the real TPU."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

from bench import build_problem, _perturbed
from picaso_tpu import pipeline

scene, grid, config = build_problem(50_000, production=False)
cfg_pal = dataclasses.replace(config, rt_method=1, stream=4,
                              use_pallas=True)
cfg_scan = dataclasses.replace(config, rt_method=1, stream=4,
                               use_pallas=False)

out_p = pipeline.forward(scene, grid, cfg_pal)
jax.block_until_ready(out_p)
out_s = pipeline.forward(scene, grid, cfg_scan)
jax.block_until_ready(out_s)
ok = True
for k in out_s:
    a = np.asarray(out_p[k], np.float64)
    b = np.asarray(out_s[k], np.float64)
    assert np.isfinite(a).all(), f'{k}: pallas non-finite'
    sc = np.maximum(np.abs(b), np.abs(b).max() * 1e-9)
    mr = (np.abs(a - b) / sc).max()
    print(f'{k}: maxrel pallas-vs-scan {mr:.2e}')
    ok &= mr < 2e-3
scenes = _perturbed(scene, 5)
for s in scenes:  # warm all shapes through the tunnel
    jax.block_until_ready(pipeline.forward(s, grid, cfg_pal))
t0 = time.perf_counter()
for s in scenes:
    out = pipeline.forward(s, grid, cfg_pal)
jax.block_until_ready(out)
rate = len(scenes) / (time.perf_counter() - t0)
print(f'sh4 fullres pallas rate: {rate:.2f}/s   values_ok={bool(ok)}')
assert ok
