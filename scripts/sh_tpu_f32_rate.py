"""TPU rate check: SH 2/4-stream at precision='f32' (in-process, no x64)
at nwno=2000 (the round-3 bench shape) and nwno=50000 (the headline
production resolution), reflected+thermal.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from picaso_tpu import pipeline


def main():
    for nwno, production, n in ((2000, False, 10), (50000, False, 5)):
        scene, grid, config = bench.build_problem(nwno,
                                                  production=production)
        for stream in (4, 2):
            cfg = dataclasses.replace(config, rt_method=1, stream=stream,
                                      use_pallas=False,
                                      sh_precision='f32')
            scenes = bench._perturbed(scene, n)
            try:
                r = bench._rate(lambda s: pipeline.forward(s, grid, cfg),
                                scenes, n)
                print(f'nwno={nwno} SH{stream} f32: {r:8.2f} spectra/s',
                      flush=True)
            except Exception as e:
                print(f'nwno={nwno} SH{stream} f32: FAILED '
                      f'{type(e).__name__}: {e}'[:300], flush=True)
        del scene, grid, scenes
        import jax
        jax.clear_caches()


if __name__ == '__main__':
    main()
