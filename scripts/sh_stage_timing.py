"""TPU stage timing for the SH path: how much does the f64 block-Thomas
solve cost vs the rest, and what would full f32 buy?

Variants (accuracy ignored for the fake/f32 ones — timing only):
  a. current: full f64 pipeline (production path)
  b. fake-solve: f64 pipeline with block_tridiag_solve replaced by a
     cheap passthrough -> everything-but-the-solve time.  The fake
     consumes one entry of each of A/B/C so XLA cannot dead-code-
     eliminate the block ASSEMBLY along with the solve (a pure D*0.5
     would time neither solve nor assembly).
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
import jax.numpy as jnp
import numpy as np

import bench
from picaso_tpu import pipeline
from picaso_tpu.rt import sh as sh_mod


def rate(scene, grid, config, stream, n=10, precision='f64'):
    cfg = dataclasses.replace(config, rt_method=1, stream=stream,
                              use_pallas=False, sh_precision=precision)
    scenes = bench._perturbed(scene, n)
    return bench._rate(lambda s: pipeline.forward(s, grid, cfg), scenes, n)


def main():
    scene, grid, config = bench.build_problem(2000, production=False)
    orig_solve = sh_mod.block_tridiag_solve
    out = {}
    try:
        for stream in (4, 2):
            out[f'sh{stream}_current_f64'] = rate(scene, grid, config,
                                                  stream)

            # the fake reads one lane-row of A/B/C so the assembly is
            # kept live (otherwise DCE also drops the assembly cost)
            sh_mod.block_tridiag_solve = (
                lambda A, B, C, D, pivot=True:
                D * 0.5 + (A[:, :1, 0] + B[:, :1, 0]
                           + C[:, :1, 0])[:, :, None] * 1e-30)
            jax.clear_caches()
            out[f'sh{stream}_fake_solve'] = rate(scene, grid, config,
                                                 stream)
            sh_mod.block_tridiag_solve = orig_solve
            jax.clear_caches()

            out[f'sh{stream}_full_f32'] = rate(scene, grid, config,
                                               stream, precision='f32')

            sh_mod.block_tridiag_solve = (
                lambda A, B, C, D, pivot=True: orig_solve(
                    A.astype(np.float64), B.astype(np.float64),
                    C.astype(np.float64), D.astype(np.float64),
                    pivot).astype(A.dtype))
            jax.clear_caches()
            out[f'sh{stream}_f32asm_f64solve'] = rate(
                scene, grid, config, stream, precision='f32')
            sh_mod.block_tridiag_solve = orig_solve
            jax.clear_caches()
    finally:
        sh_mod.block_tridiag_solve = orig_solve

    for k, v in out.items():
        print(f'{k:28s} {v:8.2f} spectra/s')


if __name__ == '__main__':
    main()
