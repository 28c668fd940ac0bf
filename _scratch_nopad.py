import dataclasses, time
import numpy as np
import jax
from bench import build_problem
from picaso_tpu import pipeline

scene, grid, config = build_problem(50_000)
cfgp = dataclasses.replace(config, use_pallas=True)
cfgs = dataclasses.replace(config, use_pallas=False)
o1 = pipeline.forward(scene, grid, cfgs)
o2 = pipeline.forward(scene, grid, cfgp)
for k in o1:
    a, b = np.asarray(o1[k]), np.asarray(o2[k])
    m = ~(np.isnan(a) | np.isnan(b))
    s = np.abs(a[m]).max()
    print(k, 'nan scan/pal:', int(np.isnan(a).sum()), int(np.isnan(b).sum()),
          'p99 rel', float(np.percentile(np.abs(a-b)[m]/(np.abs(a[m])+1e-6*s), 99)), flush=True)

def timeit(fn, *a, n=12, **k):
    o = fn(*a, **k); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a, **k)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3
print('full pallas', timeit(pipeline.forward, scene, grid, cfgp), 'ms', flush=True)
