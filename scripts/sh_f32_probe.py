"""Probe: how wrong is the SH path at f32, and which stage loses the
precision?

Runs the bench SH problem (nwno=2000) on CPU in an x64 process:
  1. f64 reference (precision='f64', classic grouping)
  2. f64 with the incoming grouping (sanity: same answer)
  3. full f32, incoming grouping (the production precision='f32' path)
  4. full f32, classic grouping (the reference's row pairing — its thin-
     layer diagonal blocks are exactly singular at f32)
  5. f32 assembly + f64 solve (incoming)
  6. f64 assembly + f32 solve (classic)
and prints max/median relative error of each vs (1).

Round-4 measured result (recorded in docs/architecture.md): with the
incoming grouping the f32 SOLVE loses nothing — (3) and (5) agree to the
last digit at ~6e-5 (SH2) / ~1.8e-3 (SH4) max albedo error, while the
classic grouping at f32 fails catastrophically (SH4 errors up to 1e4x).
"""
import dataclasses
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax

jax.config.update('jax_enable_x64', True)

import numpy as np
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from picaso_tpu import pipeline
from picaso_tpu.rt import sh as sh_mod


def run(scene, grid, config, stream, precision='f64'):
    cfg = dataclasses.replace(config, rt_method=1, stream=stream,
                              use_pallas=False, sh_precision=precision)
    out = pipeline.forward(scene, grid, cfg)
    alb = np.asarray(out['albedo'])
    therm = np.asarray(out['thermal'])
    return alb, therm


def relerr(a, b):
    denom = np.maximum(np.abs(b), np.abs(b).max() * 1e-6)
    e = np.abs(a - b) / denom
    return float(np.max(e)), float(np.median(e))


def main():
    scene, grid, config = bench.build_problem(2000, production=False)

    orig_grouping = sh_mod._default_grouping
    orig_solve = sh_mod.block_tridiag_solve

    def solve_f64(A, B, C, D, pivot=True):
        y = orig_solve(A.astype(np.float64), B.astype(np.float64),
                       C.astype(np.float64), D.astype(np.float64), pivot)
        return y.astype(A.dtype)

    def solve_f32(A, B, C, D, pivot=True):
        y = orig_solve(A.astype(np.float32), B.astype(np.float32),
                       C.astype(np.float32), D.astype(np.float32), pivot)
        return y.astype(A.dtype)

    for stream in (2, 4):
        ref_alb, ref_th = run(scene, grid, config, stream, 'f64')

        results = {}
        # restore the module on any mid-sweep failure (hazardous if this
        # script is ever imported rather than run standalone)
        try:
            # f64 with the incoming-field grouping (sanity: same answer)
            sh_mod._default_grouping = lambda dt: 'incoming'
            jax.clear_caches()
            results['f64_incoming'] = run(scene, grid, config, stream,
                                          'f64')
            sh_mod._default_grouping = orig_grouping
            jax.clear_caches()
            # full f32, incoming grouping (the production f32 path)
            results['f32_incoming'] = run(scene, grid, config, stream,
                                          'f32')
            # full f32, classic grouping
            sh_mod._default_grouping = lambda dt: 'classic'
            jax.clear_caches()
            results['f32_classic'] = run(scene, grid, config, stream,
                                         'f32')
            sh_mod._default_grouping = orig_grouping
            # f32 assembly + f64 solve (incoming grouping)
            sh_mod.block_tridiag_solve = solve_f64
            jax.clear_caches()
            results['f32_asm_f64_solve'] = run(scene, grid, config,
                                               stream, 'f32')
            # f64 assembly + f32 solve (classic grouping)
            sh_mod.block_tridiag_solve = solve_f32
            jax.clear_caches()
            results['f64_asm_f32_solve'] = run(scene, grid, config,
                                               stream, 'f64')
        finally:
            sh_mod.block_tridiag_solve = orig_solve
            sh_mod._default_grouping = orig_grouping
            jax.clear_caches()

        print(f'--- SH{stream} ---')
        for k, (alb, th) in results.items():
            ea = relerr(alb, ref_alb)
            et = relerr(th, ref_th)
            print(f'{k:22s} albedo max/med {ea[0]:.3e}/{ea[1]:.3e}  '
                  f'thermal max/med {et[0]:.3e}/{et[1]:.3e}')


if __name__ == '__main__':
    main()
