"""Stage-level profile of the SH4 reflected+thermal forward at full res.

Times, each as its own jitted program on the device (best-of-3 passes,
inputs perturbed per call to defeat the relay's dispatch dedupe):
  full      - pipeline.forward (rt_method=1, stream=4)
  refl      - reflected_sh alone
  therm     - thermal_sh alone
  assemble  - _w_expansions + beam sources + _sh4_system (T/Fm/z build)
  solve     - _solve_sh on pre-assembled blocks (block-Thomas, 5 RHS)
  intensity - the vmapped _sh_intensity TOA recursions on a solved X

Run from the repo root: ``python - < scripts/sh4_profile.py [nwno]``.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem, _perturbed
from picaso_tpu import pipeline
from picaso_tpu.optics import combine_optics
from picaso_tpu.rt import sh as sh_mod
from picaso_tpu.rt import toon

NWNO = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
N = 8

scene, grid, config = build_problem(NWNO, production=False)
config = dataclasses.replace(config, rt_method=1, stream=4,
                             use_pallas=False)
scenes = _perturbed(scene, N)


def timeit(name, fn, args_list):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for a in args_list[1:]:
            out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / (len(args_list) - 1)
    print(f'{name:10s} {ms:8.2f} ms')
    return ms


# ---- full forward ----
timeit('full', lambda s: pipeline.forward(s, grid, config), [(s,) for s in scenes])

# ---- build props once per perturbed scene (host-side prep, not timed) ----
def make_props(s):
    taugas = pipeline.gather_taugas(s, grid, config)
    from picaso_tpu.opacities import assemble
    tauray = assemble.rayleigh_tau(s.sigma_ray, s.mix_ray, s.colden,
                                   s.mmw_layer)
    rf = jnp.full(taugas.shape, 0.99999, s.cld_opd.dtype)
    return combine_optics(taugas.astype(s.cld_opd.dtype),
                          tauray.astype(s.cld_opd.dtype),
                          s.cld_opd, s.cld_w0, s.cld_g0, rf,
                          delta_eddington=config.delta_eddington,
                          stream=4)

props_list = [jax.tree_util.tree_map(jax.device_get, make_props(s))
              for s in scenes[:N + 1]]
props_list = [jax.tree_util.tree_map(jnp.asarray, p) for p in props_list]
s0 = scenes[0]

refl = jax.jit(lambda p: sh_mod.reflected_sh(
    p, s0.surf_reflect, s0.ubar0, s0.ubar1, s0.cos_theta, s0.F0PI,
    stream=4, controls=config.controls))
timeit('refl', refl, [(p,) for p in props_list])

therm = jax.jit(lambda p, t: sh_mod.thermal_sh(
    t, p, s0.plevel, s0.ubar1, s0.surf_reflect, grid.wno, stream=4))
timeit('therm', therm,
       [(p, s.tlevel) for p, s in zip(props_list, scenes)])

# ---- reflected sub-stages ----
u0s = jnp.reshape(s0.ubar0, (-1,))
u1s = jnp.reshape(s0.ubar1, (-1,))


def assemble_fn(p):
    w_single = sh_mod._w_expansions(4, 0, 1, p.cosb_og, p.ftau_cld,
                                    p.ftau_ray, p.f_deltaM,
                                    config.controls)
    w_multi = sh_mod._w_expansions(4, 0, 1, p.cosb_og, p.ftau_cld,
                                   p.ftau_ray, p.f_deltaM, config.controls)
    a = jnp.stack([(2 * l + 1) - p.w0 * w_multi[l] for l in range(4)])
    Pu0s = sh_mod.legP(-u0s[:, None, None])
    b = jnp.stack([(s0.F0PI * (p.w0 * w_single[l]))[None] * Pu0s[l]
                   / (4 * np.pi) for l in range(4)])
    b_surface = (s0.surf_reflect * u0s[:, None] * s0.F0PI
                 * jnp.exp(-p.tau[-1][None] / u0s[:, None]))
    return sh_mod._sh4_system(p.w0, p.dtau, p.tau, a, b, 0.0, b_surface,
                              -b_surface / 4, s0.surf_reflect, u0s, 0)


assemble_j = jax.jit(lambda p: assemble_fn(p)[:6])
timeit('assemble', assemble_j, [(p,) for p in props_list])

sys0 = assemble_fn(props_list[0])
T, Fm, z_down, z_up, btv, bsv = [jnp.asarray(x) for x in sys0[:6]]
solve_j = jax.jit(lambda T, Fm, zd, zu: sh_mod._solve_sh(
    T, Fm, zd, zu, btv, bsv, s0.surf_reflect, 4))
zd_list = [(T * (1 + 1e-6 * i), Fm, z_down, z_up) for i in range(N + 1)]
timeit('solve', solve_j, zd_list)

# ---- intensity ----
p0 = props_list[0]
w_single = sh_mod._w_expansions(4, 0, 1, p0.cosb_og, p0.ftau_cld,
                                p0.ftau_ray, p0.f_deltaM, config.controls)
aux = sys0[6]
X = sh_mod._solve_sh(T, Fm, z_down, z_up, btv, bsv, s0.surf_reflect, 4)
X = jnp.moveaxis(X, 2, 0)
eta = jnp.moveaxis(aux['eta'], 1, 0)
u0b = aux['u0b']
f20, f21, f22, f23 = aux['f2']
flux_bot = (f20[-1] * X[:, -1, 0] + f21[-1] * X[:, -1, 1]
            + f22[-1] * X[:, -1, 2] + f23[-1] * X[:, -1, 3]
            + aux['z1pl_up'][:, -1])


def intensity_fn(X, p):
    def per_angle(Xr, etar, u0br, u0, u1, fb):
        return sh_mod._sh_intensity(
            p, Xr, etar, u0br, u0, u1, s0.cos_theta, s0.F0PI, 4, aux,
            w_single, w_single, config.controls, 0, 1, 0, fb)
    return jax.vmap(per_angle)(X, eta, u0b, u0s, u1s, flux_bot)


intensity_j = jax.jit(intensity_fn)
timeit('intensity', intensity_j,
       [(X * (1 + 1e-6 * i), p0) for i in range(N + 1)])
print('done')
