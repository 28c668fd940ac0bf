"""Quick single-vs-batched forward rate at production shape (TPU).

Usage: python scripts/batch_quick.py [nb] [nwno] [n_iter]
"""
import sys
import time

sys.path.insert(0, '.')

import jax

import bench
from picaso_tpu import pipeline


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nwno = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    t0 = time.perf_counter()

    def mark(m):
        print(f'[+{time.perf_counter() - t0:6.1f}s] {m}', flush=True)

    scene, grid, config = bench.build_problem(nwno)
    scenes = bench._perturbed(scene, max(n_iter, nb * 3))
    bench._warm_tunnel()
    mark('built problem')

    out = pipeline.forward(scenes[0], grid, config)
    jax.block_until_ready(out)
    mark('single compiled')
    ts = time.perf_counter()
    for i in range(n_iter):
        out = pipeline.forward(scenes[1 + i % n_iter], grid, config)
    jax.block_until_ready(out)
    r_single = n_iter / (time.perf_counter() - ts)
    mark(f'single: {r_single:.1f} spectra/s')

    batches = [pipeline.stack_scenes(scenes[i * nb:(i + 1) * nb])
               for i in range(3)]
    out = pipeline.forward_batch(batches[0], grid, config)
    jax.block_until_ready(out)
    mark('batched compiled')
    n_rep = max(4, n_iter // nb * 2)
    ts = time.perf_counter()
    for i in range(n_rep):
        out = pipeline.forward_batch(batches[1 + i % 2], grid, config)
    jax.block_until_ready(out)
    r_batch = n_rep * nb / (time.perf_counter() - ts)
    mark(f'batched nb={nb}: {r_batch:.1f} spectra/s '
         f'({r_batch / r_single:.3f}x single)')


if __name__ == '__main__':
    main()
