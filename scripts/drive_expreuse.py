"""Drive the e_u0dt exp-reuse change on the real TPU: scan-vs-pallas
agreement at production shape + headline rate before/after comparison."""
import dataclasses
import sys

import numpy as np

sys.path.insert(0, '.')

from bench import build_problem, _perturbed, _rate
from picaso_tpu import pipeline

scene, grid, config = build_problem(50_000)
out_p = pipeline.forward(scene, grid, config)          # pallas (default)
alb_p = np.asarray(out_p['albedo'])
th_p = np.asarray(out_p['thermal'])
cfg_s = dataclasses.replace(config, use_pallas=False)
out_s = pipeline.forward(scene, grid, cfg_s)           # scan path
alb_s = np.asarray(out_s['albedo'])
th_s = np.asarray(out_s['thermal'])

print('nan counts:', np.isnan(alb_p).sum(), np.isnan(th_p).sum(),
      np.isnan(alb_s).sum(), np.isnan(th_s).sum())
ra = np.max(np.abs(alb_p - alb_s) / (np.abs(alb_s) + 1e-9))
rt = np.max(np.abs(th_p - th_s) / (np.abs(th_s) + 1e-30))
print(f'scan-vs-pallas rel: albedo {ra:.2e} thermal {rt:.2e}')
print('albedo range', alb_p.min(), alb_p.max())

scenes = _perturbed(scene, 30)
rate = _rate(lambda s: pipeline.forward(s, grid, config), scenes, 30)
print(f'headline rate: {rate:.1f} spectra/s (best of 3 passes)')
