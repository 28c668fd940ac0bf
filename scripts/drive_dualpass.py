"""Drive the dual-pass RT megakernel on the real TPU.

Checks scan-vs-pallas agreement at production shape (nwno=50k) and
times the separate reflected+thermal kernels against the fused
dual-pass program the pipeline now dispatches.
"""
import dataclasses
import sys
import time

sys.path.insert(0, '.')

import numpy as np

import jax

from bench import build_problem
from picaso_tpu import pipeline


def rate(fn, scenes, n):
    out = fn(scenes[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(scenes[i % len(scenes)])
    jax.block_until_ready(out)
    return n / (time.perf_counter() - t0)


def perturbed(scene, n):
    from bench import _perturbed
    return _perturbed(scene, n)


def main():
    scene, grid, config = build_problem(50_000)
    assert config.reflected and config.thermal and config.use_pallas, (
        config.reflected, config.thermal, config.use_pallas)

    # value check: pallas dual-pass vs the XLA scan path
    cfg_scan = dataclasses.replace(config, use_pallas=False)
    print('compiling scan path...', flush=True)
    out_s = pipeline.forward(scene, grid, cfg_scan)
    jax.block_until_ready(out_s)
    print('compiling pallas dual-pass path...', flush=True)
    out_p = pipeline.forward(scene, grid, config)
    jax.block_until_ready(out_p)
    for k in ('albedo', 'thermal'):
        a = np.asarray(out_s[k])
        b = np.asarray(out_p[k])
        nan_a, nan_b = np.isnan(a).sum(), np.isnan(b).sum()
        scale = np.abs(a).max()
        err = np.abs(a - b).max() / scale
        print(f'{k}: nan scan={nan_a} pallas={nan_b} '
              f'rel_err={err:.2e} range=[{a.min():.3e},{a.max():.3e}]',
              flush=True)
        assert nan_a == 0 and nan_b == 0
        assert err < 1e-3, (k, err)

    # perf: fused dual-pass vs separate kernels (fuse_optics split path)
    scenes = perturbed(scene, 16)
    n = 60
    r_fused = rate(lambda s: pipeline.forward(s, grid, config), scenes, n)
    print(f'dual-pass fused: {r_fused:.1f} spectra/s', flush=True)
    print('compiling split path (separate kernels)...', flush=True)
    import picaso_tpu.rt.pallas_toon as pt
    cfg_split = dataclasses.replace(config)
    # monkeypatch: hide the dual-pass symbol so the pipeline takes the
    # separate-kernel branch?  pipeline branches on config flags only,
    # so instead time the separate kernels via reflected-only +
    # thermal-only configs (sum of passes = what r3 dispatched).
    cfg_r = dataclasses.replace(config, thermal=False)
    cfg_t = dataclasses.replace(config, reflected=False)
    r_refl = rate(lambda s: pipeline.forward(s, grid, cfg_r), scenes, n)
    r_therm = rate(lambda s: pipeline.forward(s, grid, cfg_t), scenes, n)
    serial = 1.0 / (1.0 / r_refl + 1.0 / r_therm)
    print(f'reflected-only {r_refl:.1f}/s, thermal-only {r_therm:.1f}/s '
          f'-> serial equivalent {serial:.1f}/s', flush=True)
    print(f'fused speedup vs split: {r_fused / serial:.3f}x', flush=True)


if __name__ == '__main__':
    main()
