"""Diagnose the batched-forward (retrieval likelihood) throughput.

Round-3 bench: batched8_spectra_per_s = 122.6 < single 132.3.  This
script separates the candidate causes on real hardware:
  - vmap lowering penalty on the Pallas megakernels (grid-dim batching)
    vs a lax.map sequential-in-one-program batch;
  - per-stage behaviour: gather kernel and RT megakernels timed batched
    vs serial.

Run on the TPU: python scripts/batch_diag.py [nb] [nwno]
"""

import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp

import bench
from picaso_tpu import pipeline


def rate(fn, args_list, n_iter=None, per=1):
    n_iter = n_iter if n_iter is not None else len(args_list) - 1
    out = fn(args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list[1:n_iter + 1]:
        out = fn(a)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n_iter * per / dt, dt / n_iter


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nwno = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_iter = 10

    scene, grid, config = bench.build_problem(nwno)
    scenes = bench._perturbed(scene, max(n_iter, nb * 3))
    bench._warm_tunnel()

    # 1. serial single-dispatch rate
    r_single, t_single = rate(
        lambda s: pipeline.forward(s, grid, config), scenes, n_iter)
    print(f'single:        {r_single:8.1f} spectra/s   ({t_single*1e3:.2f} ms/call)')

    # 2. vmap batch (current forward_batch)
    batches = [pipeline.stack_scenes(scenes[i * nb:(i + 1) * nb])
               for i in range(3)]
    try:
        r_vmap, t_vmap = rate(
            lambda b: pipeline.forward_batch(b, grid, config), batches,
            2, per=nb)
        print(f'vmap nb={nb}:     {r_vmap:8.1f} spectra/s   ({t_vmap*1e3:.2f} ms/batch)')
    except Exception as e:
        print('vmap failed:', type(e).__name__, str(e)[:200])

    # 3. lax.map batch (sequential in ONE program; no Mosaic grid batching)
    from functools import partial

    @partial(jax.jit, static_argnames=('cfg',))
    def fwd_map(b, grid, cfg):
        axes = {}
        for name, val in b._asdict().items():
            rk = pipeline._SCALARISH_RANK.get(name)
            if rk is not None and (val is None or np.ndim(val) == rk):
                axes[name] = None
            else:
                axes[name] = 0
        # split batched leaves, close over constant ones
        batched = {k: v for k, v in b._asdict().items() if axes[k] == 0}
        const = {k: v for k, v in b._asdict().items() if axes[k] is None}

        def one(bd):
            return pipeline.forward(pipeline.SceneTensors(**bd, **const),
                                    grid, cfg)
        return jax.lax.map(one, batched)

    try:
        r_map, t_map = rate(
            lambda b: fwd_map(b, grid, config), batches, 2, per=nb)
        print(f'lax.map nb={nb}:  {r_map:8.1f} spectra/s   ({t_map*1e3:.2f} ms/batch)')
    except Exception as e:
        print('lax.map failed:', type(e).__name__, str(e)[:200])

    # 4. stage breakdown, serial vs vmapped
    from picaso_tpu.opacities.db import _find_indices
    from picaso_tpu.opacities.pallas_interp import interp_tau_pallas_blocked

    mixi = dict(config.mix_index)
    mol_rows = jnp.asarray([mixi[grid.molecules[i]]
                            for i in config.mol_indices])

    @jax.jit
    def gather(s):
        mix_cols = s.mix[mol_rows]
        t_w, p_w, idx = _find_indices(grid.pt, s.tlayer,
                                      s.player / 1e6)
        colw = s.colden / s.mmw_layer
        mixcol = jnp.zeros((len(grid.molecules), s.tlayer.shape[0]),
                           s.mix.dtype)
        for j, i in enumerate(config.mol_indices):
            mixcol = mixcol.at[i].set(mix_cols[j] * colw)
        return interp_tau_pallas_blocked(
            grid.log_kappa_blocked, idx, t_w, p_w, mixcol, nwno,
            qparams=grid.blocked_qparams)

    r_g, t_g = rate(gather, scenes, n_iter)
    print(f'gather serial: {r_g:8.1f} /s          ({t_g*1e3:.2f} ms)')

    axes_g = pipeline.SceneTensors(**{
        k: (None if pipeline._SCALARISH_RANK.get(k) is not None
            and np.ndim(getattr(batches[0], k))
            == pipeline._SCALARISH_RANK[k] else 0)
        for k in pipeline.SceneTensors._fields})
    gather_v = jax.jit(jax.vmap(gather, in_axes=(axes_g,)))
    try:
        r_gv, t_gv = rate(gather_v, batches, 2, per=nb)
        print(f'gather vmap:   {r_gv:8.1f} /s          ({t_gv*1e3:.2f} ms/batch)')
    except Exception as e:
        print('gather vmap failed:', type(e).__name__, str(e)[:200])

    # 5. reflected-only and thermal-only forwards, serial vs vmap
    import dataclasses
    for name, patch in (('reflected', dict(thermal=False)),
                        ('thermal', dict(reflected=False))):
        cfg1 = dataclasses.replace(config, **patch)
        r_s, t_s = rate(lambda s: pipeline.forward(s, grid, cfg1),
                        scenes, n_iter)
        try:
            r_v, t_v = rate(
                lambda b: pipeline.forward_batch(b, grid, cfg1),
                batches, 2, per=nb)
            note = f'vmap {r_v:8.1f}/s ({t_v*1e3:.2f} ms/batch)'
        except Exception as e:
            note = f'vmap failed: {type(e).__name__}'
        print(f'{name:10s} serial {r_s:8.1f}/s ({t_s*1e3:.2f} ms)  {note}')


if __name__ == '__main__':
    main()
