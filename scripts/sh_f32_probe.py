"""Probe: how wrong is the SH path at f32 with the round-3 scaled
formulation, and which stage loses the precision?

Runs the bench SH problem (nwno=2000) on CPU in an x64 process:
  1. f64 reference (current production path)
  2. full-f32 pipeline (bypass _require_f64)
  3. f32 assembly + f64 solve only
  4. f64 assembly + f32 solve only
and prints max/median relative error of each vs (1).
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


def run(scene, grid, config, stream):
    cfg = dataclasses.replace(config, rt_method=1, stream=stream,
                              use_pallas=False)
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

    orig_req = sh_mod._require_f64
    passthrough = lambda arrays: (arrays, lambda x: x)

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
        ref_alb, ref_th = run(scene, grid, config, stream)

        results = {}
        # f64 with the incoming-field grouping (sanity: same answer)
        sh_mod._GROUPING = 'incoming'
        jax.clear_caches()
        results['f64_incoming'] = run(scene, grid, config, stream)
        # full f32 with the incoming grouping (the candidate fast path)
        sh_mod._require_f64 = passthrough
        jax.clear_caches()
        results['f32_incoming'] = run(scene, grid, config, stream)
        sh_mod._GROUPING = 'classic'
        # full f32
        jax.clear_caches()
        results['full_f32'] = run(scene, grid, config, stream)
        # f32 assembly + f64 solve
        sh_mod.block_tridiag_solve = solve_f64
        jax.clear_caches()
        results['f32_asm_f64_solve'] = run(scene, grid, config, stream)
        # f64 assembly + f32 solve
        sh_mod._require_f64 = orig_req
        sh_mod.block_tridiag_solve = solve_f32
        jax.clear_caches()
        results['f64_asm_f32_solve'] = run(scene, grid, config, stream)
        sh_mod.block_tridiag_solve = orig_solve
        jax.clear_caches()

        print(f'--- SH{stream} ---')
        for k, (alb, th) in results.items():
            ea = relerr(alb, ref_alb)
            et = relerr(th, ref_th)
            print(f'{k:22s} albedo max/med {ea[0]:.3e}/{ea[1]:.3e}  '
                  f'thermal max/med {et[0]:.3e}/{et[1]:.3e}')


if __name__ == '__main__':
    main()
