import dataclasses, time
import numpy as np
import jax
from bench import build_problem
from picaso_tpu import pipeline

scene, grid, config = build_problem(50_000)
cfg = dataclasses.replace(config, use_pallas=True)

def timeit(fn, *a, n=12, **k):
    o = fn(*a, **k); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a, **k)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3

full = timeit(pipeline.forward, scene, grid, cfg)
tr = timeit(pipeline.forward, scene, grid, dataclasses.replace(
    cfg, reflected=False, thermal=False, transmission=True))
ro = timeit(pipeline.forward, scene, grid, dataclasses.replace(
    cfg, thermal=False, transmission=False))
to = timeit(pipeline.forward, scene, grid, dataclasses.replace(
    cfg, reflected=False, transmission=False))
print(f'full={full:.2f} props+transit={tr:.2f} reflected-only={ro:.2f} thermal-only={to:.2f}')
