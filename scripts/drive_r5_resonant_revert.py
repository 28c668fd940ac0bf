"""Verify drive: scan vs pallas forward at production nwno on TPU
after the resonant-ratio revert."""
import dataclasses
import numpy as np
from bench import build_problem
from picaso_tpu import pipeline

scene, grid, config = build_problem(50_000)
config = dataclasses.replace(config, transmission=True)
out = pipeline.forward(scene, grid, config)
cfg = dataclasses.replace(config, use_pallas=True)
out_p = pipeline.forward(scene, grid, cfg)
for key in ('albedo', 'thermal', 'transit_depth'):
    a = np.asarray(out[key]); b = np.asarray(out_p[key])
    assert np.isnan(a).sum() == 0 and np.isnan(b).sum() == 0, key
    scale = np.maximum(np.abs(a), np.abs(a).max() * 1e-9)
    rel = np.abs(a - b) / scale
    print(f'{key}: range [{a.min():.4g}, {a.max():.4g}] '
          f'scan-vs-pallas max rel {rel.max():.3e} '
          f'median {np.median(rel):.3e}')
print('DRIVE OK')
