"""TPU stage timing for the SH path: how much does the f64 block-Thomas
solve cost vs the rest, and what would full f32 buy?

Variants (accuracy ignored for the fake/f32 ones — timing only):
  a. current: full f64 pipeline (production path)
  b. fake-solve: f64 pipeline with block_tridiag_solve replaced by a
     cheap passthrough -> everything-but-the-solve time
  c. full f32 (bypass _require_f64) -> speed ceiling of an f32-stable
     reformulation
  d. f32 assembly + f64 solve
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_enable_x64', True)
import numpy as np

import bench
from picaso_tpu import pipeline
from picaso_tpu.rt import sh as sh_mod


def rate(scene, grid, config, stream, n=10):
    cfg = dataclasses.replace(config, rt_method=1, stream=stream,
                              use_pallas=False)
    scenes = bench._perturbed(scene, n)
    return bench._rate(lambda s: pipeline.forward(s, grid, cfg), scenes, n)


def main():
    scene, grid, config = bench.build_problem(2000, production=False)
    orig_solve = sh_mod.block_tridiag_solve
    orig_req = sh_mod._require_f64
    out = {}
    for stream in (4, 2):
        out[f'sh{stream}_current'] = rate(scene, grid, config, stream)

        def fake_solve(A, B, C, D, pivot=True):
            # same shapes/dtypes, trivial work
            return D / (1.0 + jnp.abs(B[:, :, 0:1] if False else 1.0))

        import jax.numpy as jnp
        sh_mod.block_tridiag_solve = lambda A, B, C, D, pivot=True: D * 0.5
        jax.clear_caches()
        out[f'sh{stream}_fake_solve'] = rate(scene, grid, config, stream)
        sh_mod.block_tridiag_solve = orig_solve

        sh_mod._require_f64 = lambda arrays: (arrays, lambda x: x)
        jax.clear_caches()
        out[f'sh{stream}_full_f32'] = rate(scene, grid, config, stream)

        sh_mod.block_tridiag_solve = (
            lambda A, B, C, D, pivot=True: orig_solve(
                A.astype(np.float64), B.astype(np.float64),
                C.astype(np.float64), D.astype(np.float64),
                pivot).astype(A.dtype))
        jax.clear_caches()
        out[f'sh{stream}_f32asm_f64solve'] = rate(scene, grid, config,
                                                  stream)
        sh_mod.block_tridiag_solve = orig_solve
        sh_mod._require_f64 = orig_req
        jax.clear_caches()

    for k, v in out.items():
        print(f'{k:28s} {v:8.2f} spectra/s')


if __name__ == '__main__':
    main()
