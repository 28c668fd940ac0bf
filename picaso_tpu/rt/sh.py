"""Spherical-harmonics radiative transfer (Rooney et al. 2023a,b), 2 & 4
stream.

TPU redesign of the reference SH path (``fluxes.py:2675-3628``): the
reference assembles 5/11-diagonal banded matrices and calls
``scipy.linalg.solve_banded`` once per wavelength (the #2 hot loop).  Here
the same systems are assembled directly in *block-tridiagonal* form (s x s
blocks, s = stream) and solved by a block-Thomas ``lax.scan`` whose per-step
small solves are batched across the whole wavelength axis — one fused XLA
program, no per-wavelength Python.

Matrix elements, eigenvalues (lam1/lam2), eta/Del source terms, boundary
conditions, and the source-function TOA intensity recursions follow
fluxes.py:3189-3333 (2-stream), :3336-3607 (4-stream), :2787-2976 (reflected
driver) and :3052-3186 (thermal driver) exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import PI
from .toon import ScatteringControls, blackbody, _dither_u0

__all__ = ['block_tridiag_solve', 'reflected_sh', 'thermal_sh', 'legP']

_CLIP = 35.0
# The SH mode-coefficient system is a two-point BVP whose blocks go
# singular as lam*dtau -> 0 (growing/decaying exponential modes
# degenerate for optically thin layers): its condition number scales
# like 1/dtau^2, so BOTH the assembly and the block-Thomas solve need
# float64 — measured at f32 on the production-shaped bench problem the
# albedo error is O(10-100%) broadband, and the earlier exponent-floor
# mitigation merely traded NaNs for quietly-wrong answers.  The
# reference only ever runs this path in float64 scipy
# (fluxes.py:3610-3628).  The public entry points below therefore
# promote f32 inputs to f64 internally (TPUs execute emulated f64
# correctly — slower, but right) and cast back; if x64 is disabled,
# they raise with instructions instead of returning garbage.
_THIN32 = 0.0


def _thin_floor(dtype):
    return _THIN32 if dtype == jnp.float32 else 0.0


def _require_f64(arrays):
    """Promote a pytree of SH inputs to f64 (see conditioning note above).

    Returns (promoted_pytree, restore) where restore(x) casts outputs
    back to the original dtype.
    """
    leaves = jax.tree_util.tree_leaves(arrays)
    dt = jnp.result_type(*[x.dtype for x in leaves
                           if hasattr(x, 'dtype')])
    if dt == jnp.float64:
        return arrays, lambda x: x
    if not jax.config.jax_enable_x64:
        raise ValueError(
            'The SH 2/4-stream solver needs float64: its layer-mode '
            'system is ill-conditioned (cond ~ 1/dtau^2 for thin '
            'layers) and f32 yields O(1) spectral errors. Enable it '
            'with jax.config.update("jax_enable_x64", True) — float64 '
            'executes correctly (emulated) on TPU — or use the Toon89 '
            'path (rt_method="toon") which is f32-stable.')
    promoted = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
        else x, arrays)
    return promoted, lambda x: jax.tree_util.tree_map(
        lambda y: y.astype(dt), x)


def legP(mu, nmax=4):
    """Legendre polynomials P_0..P_{nmax-1} (fluxes.py:3639-3647)."""
    polys = [jnp.ones_like(mu) if hasattr(mu, 'shape') else 1.0, mu,
             (3 * mu ** 2 - 1) / 2, (5 * mu ** 3 - 3 * mu) / 2]
    return polys[:nmax]


def _clip(x):
    return jnp.clip(x, -_CLIP, _CLIP)


def _scaled_bet(exptrm_lam, trans_u1, beta, dtau, eps=1e-4):
    """Growing-mode source integral with the per-layer scaling applied.

    The unscaled form (1 - e^{-beta*dtau})/beta * X2 (fluxes.py:2930-2940,
    beta = 1/u1 - lam) overflows when lam*dtau > ~35; with the scaled
    coefficient X2' = X2/e^{-lam*dtau} it becomes
    (e^{-lam*dtau} - e^{-dtau/u1})/beta — two decaying exponentials and a
    removable beta -> 0 singularity (limit dtau*e^{-lam*dtau})."""
    num = exptrm_lam - trans_u1
    limit = dtau * exptrm_lam * (1.0 - 0.5 * beta * dtau)
    safe = jnp.where(jnp.abs(beta) < eps, 1.0, beta)
    return jnp.where(jnp.abs(beta) < eps, limit, num / safe)


def _gauss_solve(A, B):
    """Batched s x s solve A @ X = B via explicit partial-pivot Gaussian
    elimination (A [..., s, s], B [..., s, k]).

    Written in plain jnp arithmetic because lax.linalg LU has no float64
    lowering on TPU — and the SH solve must run in f64 there (see the
    conditioning note at the top of this module).  s is 2 or 4, so the
    unrolled loop stays tiny.
    """
    s = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)            # [..., s, s+k]
    ar = jnp.arange(s)
    for i in range(s):
        # partial pivot: row j >= i maximizing |M[..., j, i]|
        col = jnp.abs(M[..., :, i])
        col = jnp.where(ar >= i, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)                # [...]
        perm = jnp.where(ar == i, p[..., None],
                         jnp.where(ar == p[..., None], i, ar))
        M = jnp.take_along_axis(M, perm[..., None], axis=-2)
        piv = M[..., i:i + 1, :] / M[..., i:i + 1, i:i + 1]
        fac = M[..., :, i:i + 1]
        elim = jnp.where((ar != i)[..., None], fac * piv, 0.0)
        M = M - elim
        M = M.at[..., i, :].set(piv[..., 0, :])
    return M[..., s:]


def block_tridiag_solve(A, B, C, D, refine=1):
    """Solve the block-tridiagonal system with s x s blocks.

    A, B, C: [n, s, s, nwno] (A[0] and C[-1] ignored); D: [n, s, nwno].
    Block-Thomas forward elimination + back substitution; the s x s solves
    batch over the wavelength axis via :func:`_gauss_solve` (explicit
    pivoted elimination — f64-capable on TPU, unlike lax.linalg LU).
    ``refine`` steps of iterative refinement (residual re-solve through
    the same sweep) tighten the block recursion further; the reference
    leans on float64 scipy here (fluxes.py:3610-3628).
    Returns y [n, s, nwno].
    """
    # reorder to [n, nwno, s, s] for batched small solves
    A = jnp.moveaxis(A, -1, 1)
    B = jnp.moveaxis(B, -1, 1)
    C = jnp.moveaxis(C, -1, 1)
    D = jnp.moveaxis(D, -1, 1)[..., None]    # [n, nwno, s, 1]

    def fwd(carry, row):
        Cp_prev, Dp_prev = carry
        Ak, Bk, Ck, Dk = row
        denom = Bk - Ak @ Cp_prev
        Cp = _gauss_solve(denom, Ck)
        Dp = _gauss_solve(denom, Dk - Ak @ Dp_prev)
        return (Cp, Dp), (Cp, Dp)

    def back(y_next, row):
        Cp_k, Dp_k = row
        y_k = Dp_k - Cp_k @ y_next
        return y_k, y_k

    def solve_rhs(Dv):
        Cp0 = _gauss_solve(B[0], C[0])
        Dp0 = _gauss_solve(B[0], Dv[0])
        (_, _), (Cp_rest, Dp_rest) = jax.lax.scan(
            fwd, (Cp0, Dp0), (A[1:], B[1:], C[1:], Dv[1:]))
        Cp = jnp.concatenate([Cp0[None], Cp_rest], axis=0)
        Dp = jnp.concatenate([Dp0[None], Dp_rest], axis=0)
        y_last = Dp[-1]
        _, ys = jax.lax.scan(back, y_last, (Cp[:-1], Dp[:-1]),
                             reverse=True)
        return jnp.concatenate([ys, y_last[None]], axis=0)  # [n,nw,s,1]

    def matvec(y):
        mid = B @ y
        lo = jnp.concatenate([jnp.zeros_like(y[:1]),
                              A[1:] @ y[:-1]], axis=0)
        hi = jnp.concatenate([C[:-1] @ y[1:],
                              jnp.zeros_like(y[:1])], axis=0)
        return mid + lo + hi

    # TPU matmuls default to bf16 inputs — fatal for the elimination's
    # s x s products; force full f32 within the solver
    with jax.default_matmul_precision('highest'):
        y = solve_rhs(D)
        for _ in range(refine):
            y = y + solve_rhs(D - matvec(y))
    return jnp.moveaxis(y[..., 0], 1, -1)             # [n, s, nwno]


# ---------------------------------------------------------------------------
# 2-stream pieces (fluxes.py:3189-3333)
# ---------------------------------------------------------------------------

def _sh2_system(w0, dtau, tau, a, b, b_top, b_surface, surf_reflect, ubar0,
                calculation, b0=None, b1=None):
    nlayer, nwno = dtau.shape
    lam = jnp.sqrt(a[0] * a[1])
    if calculation == 0:
        # beam resonance lam*u0 -> 1 (Del -> 0): the eta particular
        # solution diverges non-removably (fluxes.py:3243-3247 is
        # unguarded f64); dither u0 elementwise off the eigenvalue like
        # the Toon path (toon._dither_u0) and use the dithered angle
        # consistently in Del, eta, and the exp(-tau/u0) attenuation.
        u0b = _dither_u0(lam, ubar0)
        Del = (1.0 / u0b) ** 2 - a[0] * a[1]
        eta = jnp.stack([(b[1] / u0b - a[1] * b[0]) / Del,
                         (b[0] / u0b - a[0] * b[1]) / Del])
    else:
        u0b = jnp.full_like(dtau, 1.0)
        eta = jnp.zeros((2, nlayer, nwno), dtau.dtype)

    exptrm = jnp.exp(-jnp.clip(lam * dtau, _thin_floor(dtau.dtype), _CLIP))
    q = lam / a[1]
    Q1 = (0.5 + q) * 2 * PI
    Q2 = (0.5 - q) * 2 * PI
    Q1mn, Q2mn = Q1 * exptrm, Q2 * exptrm

    if calculation == 0:
        zmn = (0.5 * eta[0] - eta[1]) * 2 * PI
        zpl = (0.5 * eta[0] + eta[1]) * 2 * PI
        zmn_up, zpl_up = (zmn * jnp.exp(-tau[1:] / u0b),
                          zpl * jnp.exp(-tau[1:] / u0b))
        zmn_down, zpl_down = (zmn * jnp.exp(-tau[:-1] / u0b),
                              zpl * jnp.exp(-tau[:-1] / u0b))
    else:
        pref = (1 - w0) / a[0] * 2 * PI
        zmn_down = pref * (b0 / 2 - b1 / a[1])
        zmn_up = pref * (b0 / 2 - b1 / a[1] + b1 * dtau / 2)
        zpl_down = pref * (b0 / 2 + b1 / a[1])
        zpl_up = pref * (b0 / 2 + b1 / a[1] + b1 * dtau / 2)

    # per-layer top (T) and bottom (f) matrices; rows: [mn-rows, pl-rows].
    # The growing-mode coefficient is SCALED per layer (X2' = X2/exptrm,
    # i.e. the exp(+lam*t) mode is measured from the layer bottom): the
    # reference's unscaled system (fluxes.py:3260-3276) carries
    # exp(+lam*dtau) entries spanning e^{+-35}, which is fine in its
    # float64 numpy but destroys the f32 block elimination on TPU.  With
    # the scaling every matrix entry is O(Q), and consumers multiply the
    # solved X2' by bounded decaying exponentials only.
    def rows(m00, m01, m10, m11):
        return jnp.stack([jnp.stack([m00, m01], 1),
                          jnp.stack([m10, m11], 1)], 1)  # [n, 2, 2, nw]

    T = rows(Q1, Q2mn, Q2, Q1mn)
    Fm = rows(Q1mn, Q2, Q2mn, Q1)
    z_down = jnp.stack([zmn_down, zpl_down], 1)  # [n, 2, nw]
    z_up = jnp.stack([zmn_up, zpl_up], 1)
    b_top_vec = jnp.stack([jnp.broadcast_to(b_top, (nwno,))], 0)
    b_surf_vec = jnp.stack([b_surface], 0)

    aux = dict(lam=lam, q=q, eta=eta, Q1=Q1, Q2=Q2,
               zpl_up=zpl_up, exptrm=exptrm, u0b=u0b)
    return T, Fm, z_down, z_up, b_top_vec, b_surf_vec, aux


# ---------------------------------------------------------------------------
# 4-stream pieces (fluxes.py:3336-3607)
# ---------------------------------------------------------------------------

def _sh4_system(w0, dtau, tau, a, b, b_top, b_surface, b_surface_sh4,
                surf_reflect, ubar0, calculation, b0=None, b1=None):
    nlayer, nwno = dtau.shape
    beta = a[0] * a[1] + 4 * a[0] * a[3] / 9 + a[2] * a[3] / 9
    gama = a[0] * a[1] * a[2] * a[3] / 9
    root = jnp.sqrt(beta ** 2 - 4 * gama)
    lam1 = jnp.sqrt((beta + root) / 2)
    lam2 = jnp.sqrt((beta - root) / 2)

    if calculation == 0:
        # dither off BOTH eigenvalue resonances (see _sh2_system)
        u0b = _dither_u0(lam2, _dither_u0(lam1, ubar0))
        u0i = 1.0 / u0b
        Del = 9 * (u0i ** 4 - beta * u0i ** 2 + gama)
        Dels0 = ((a[1] * b[0] - b[1] * u0i) * (a[2] * a[3] - 9 * u0i ** 2)
                 + 2 * (a[3] * b[2] - 2 * a[3] * b[0] - 3 * b[3] * u0i)
                 * u0i ** 2)
        Dels1 = ((a[0] * b[1] - b[0] * u0i) * (a[2] * a[3] - 9 * u0i ** 2)
                 - 2 * a[0] * (a[3] * b[2] - 3 * b[3] * u0i) * u0i)
        Dels2 = ((a[3] * b[2] - 3 * b[3] * u0i) * (a[0] * a[1] - u0i ** 2)
                 - 2 * a[3] * (a[0] * b[1] - b[0] * u0i) * u0i)
        Dels3 = ((a[2] * b[3] - 3 * b[2] * u0i) * (a[0] * a[1] - u0i ** 2)
                 + 2 * (3 * a[0] * b[1] - 2 * a[0] * b[3] - 3 * b[0] * u0i)
                 * u0i ** 2)
        eta = jnp.stack([Dels0 / Del, Dels1 / Del, Dels2 / Del,
                         Dels3 / Del])
        z1pl = (eta[0] / 2 + eta[1] + 5 * eta[2] / 8) * 2 * PI
        z1mn = (eta[0] / 2 - eta[1] + 5 * eta[2] / 8) * 2 * PI
        z2pl = (-eta[0] / 8 + 5 * eta[2] / 8 + eta[3]) * 2 * PI
        z2mn = (-eta[0] / 8 + 5 * eta[2] / 8 - eta[3]) * 2 * PI
    else:
        eta = jnp.zeros((4, nlayer, nwno), dtau.dtype)

    thin = _thin_floor(dtau.dtype)
    exptrm1 = jnp.exp(-jnp.clip(lam1 * dtau, thin, _CLIP))
    exptrm2 = jnp.exp(-jnp.clip(lam2 * dtau, thin, _CLIP))

    R1, R2 = -a[0] / lam1, -a[0] / lam2
    Q1 = 0.5 * (a[0] * a[1] / lam1 ** 2 - 1)
    Q2 = 0.5 * (a[0] * a[1] / lam2 ** 2 - 1)
    S1 = -3 / (2 * a[3]) * (a[0] * a[1] / lam1 - lam1)
    S2 = -3 / (2 * a[3]) * (a[0] * a[1] / lam2 - lam2)

    p1pl = (0.5 + R1 + 5 * Q1 / 8) * 2 * PI
    p2pl = (0.5 + R2 + 5 * Q2 / 8) * 2 * PI
    q1pl = (-0.125 + 5 * Q1 / 8 + S1) * 2 * PI
    q2pl = (-0.125 + 5 * Q2 / 8 + S2) * 2 * PI
    p1mn = (0.5 - R1 + 5 * Q1 / 8) * 2 * PI
    p2mn = (0.5 - R2 + 5 * Q2 / 8) * 2 * PI
    q1mn = (-0.125 + 5 * Q1 / 8 - S1) * 2 * PI
    q2mn = (-0.125 + 5 * Q2 / 8 - S2) * 2 * PI

    # growing modes scaled per layer (X2' = X2/exptrm1, X4' = X4/exptrm2;
    # see the _sh2_system comment): every entry stays O(p, q)
    f00, f01, f02, f03 = (p1mn * exptrm1, p1pl,
                          p2mn * exptrm2, p2pl)
    f10, f11, f12, f13 = (q1mn * exptrm1, q1pl,
                          q2mn * exptrm2, q2pl)
    f20, f21, f22, f23 = (p1pl * exptrm1, p1mn,
                          p2pl * exptrm2, p2mn)
    f30, f31, f32, f33 = (q1pl * exptrm1, q1mn,
                          q2pl * exptrm2, q2mn)

    if calculation == 0:
        ex_up = jnp.exp(-_clip(tau[1:] / u0b))
        ex_dn = jnp.exp(-_clip(tau[:-1] / u0b))
        z1mn_up, z2mn_up = z1mn * ex_up, z2mn * ex_up
        z1pl_up, z2pl_up = z1pl * ex_up, z2pl * ex_up
        z1mn_down, z2mn_down = z1mn * ex_dn, z2mn * ex_dn
        z1pl_down, z2pl_down = z1pl * ex_dn, z2pl * ex_dn
    else:
        u0b = jnp.full_like(dtau, 1.0)
        pref = (1 - w0) / a[0] * 2 * PI
        pref2 = -0.5 * (1 - w0) / (4 * a[0]) * 2 * PI
        z1mn_up = pref * (b0 / 2 - b1 / a[1] + b1 * dtau / 2)
        z2mn_up = pref2 * (b0 + b1 * dtau)
        z1pl_up = pref * (b0 / 2 + b1 / a[1] + b1 * dtau / 2)
        z2pl_up = pref2 * (b0 + b1 * dtau)
        z1mn_down = pref * (b0 / 2 - b1 / a[1])
        z2mn_down = pref2 * b0
        z1pl_down = pref * (b0 / 2 + b1 / a[1])
        z2pl_down = pref2 * b0

    def rows4(r0, r1, r2, r3):
        return jnp.stack([jnp.stack(r0, 1), jnp.stack(r1, 1),
                          jnp.stack(r2, 1), jnp.stack(r3, 1)], 1)

    T = rows4((p1mn, p1pl * exptrm1, p2mn, p2pl * exptrm2),
              (q1mn, q1pl * exptrm1, q2mn, q2pl * exptrm2),
              (p1pl, p1mn * exptrm1, p2pl, p2mn * exptrm2),
              (q1pl, q1mn * exptrm1, q2pl, q2mn * exptrm2))
    Fm = rows4((f00, f01, f02, f03), (f10, f11, f12, f13),
               (f20, f21, f22, f23), (f30, f31, f32, f33))
    z_down = jnp.stack([z1mn_down, z2mn_down, z1pl_down, z2pl_down], 1)
    z_up = jnp.stack([z1mn_up, z2mn_up, z1pl_up, z2pl_up], 1)
    nw = dtau.shape[1]
    b_top_vec = jnp.stack([jnp.broadcast_to(b_top, (nw,)),
                           jnp.broadcast_to(-b_top / 4.0
                                            if not hasattr(b_top, 'shape')
                                            else -b_top / 4.0, (nw,))], 0)
    b_surf_vec = jnp.stack([b_surface, b_surface_sh4], 0)

    # eigenvector matrix for the source-function technique
    ones = jnp.ones_like(R1)
    A = jnp.stack([jnp.stack([ones, ones, ones, ones]),
                   jnp.stack([R1, -R1, R2, -R2]),
                   jnp.stack([Q1, Q1, Q2, Q2]),
                   jnp.stack([S1, -S1, S2, -S2])])   # [4, 4, n, nw]
    aux = dict(lam1=lam1, lam2=lam2, eta=eta, A=A,
               z1pl_up=z1pl_up, f2=(f20, f21, f22, f23),
               exptrm1=exptrm1, exptrm2=exptrm2, u0b=u0b)
    return T, Fm, z_down, z_up, b_top_vec, b_surf_vec, aux


def _solve_sh(T, Fm, z_down, z_up, b_top_vec, b_surf_vec, surf_reflect,
              stream):
    """Assemble block-tridiagonal system and solve for X [n, s, nw]."""
    n, s, _, nw = T.shape
    h = s // 2
    zero_blk = jnp.zeros((n - 1, h, s, nw), T.dtype)

    # A blocks: rows [f_pl_rows[k-1]; 0] for k>=1
    A = jnp.concatenate([
        jnp.zeros((1, s, s, nw), T.dtype),
        jnp.concatenate([Fm[:-1, h:], zero_blk], axis=1)], axis=0)
    # B blocks
    B_first = jnp.concatenate([T[0, :h][None], Fm[0, :h][None]], axis=1)
    B_mid = jnp.concatenate([-T[1:-1, h:], Fm[1:-1, :h]], axis=1) \
        if n > 2 else jnp.zeros((0, s, s, nw), T.dtype)
    B_last = jnp.concatenate([
        -T[-1, h:][None],
        (Fm[-1, h:] - surf_reflect * Fm[-1, :h])[None]], axis=1)
    B = jnp.concatenate([B_first, B_mid, B_last], axis=0)
    # C blocks: rows [0; -T_mn_rows[k+1]]
    C = jnp.concatenate([
        jnp.concatenate([zero_blk, -T[1:, :h]], axis=1),
        jnp.zeros((1, s, s, nw), T.dtype)], axis=0)

    # D blocks
    D_first = jnp.concatenate([
        (b_top_vec - z_down[0, :h])[None],
        (z_down[1, :h] - z_up[0, :h])[None]], axis=1)
    if n > 2:
        D_mid = jnp.concatenate([
            z_down[1:-1, h:] - z_up[:-2, h:],
            z_down[2:, :h] - z_up[1:-1, :h]], axis=1)
    else:
        D_mid = jnp.zeros((0, s, nw), T.dtype)
    D_last = jnp.concatenate([
        (z_down[-1, h:] - z_up[-2, h:])[None],
        (b_surf_vec - z_up[-1, h:]
         + surf_reflect * z_up[-1, :h])[None]], axis=1)
    D = jnp.concatenate([D_first, D_mid, D_last], axis=0)

    return block_tridiag_solve(A, B, C, D)


def _w_expansions(stream, w_form, rayleigh_on, cosb_og, ftau_cld, ftau_ray,
                  f_deltaM, controls: ScatteringControls):
    """Legendre expansion weights w_l (fluxes.py:2803-2840)."""
    nlayer, nwno = cosb_og.shape
    w = [jnp.ones((nlayer, nwno), cosb_og.dtype) for _ in range(stream)]
    if w_form == 1:  # OTHG
        for l in range(1, stream):
            wl = (2 * l + 1) * cosb_og ** l
            w[l] = (wl - (2 * l + 1) * f_deltaM) / (1 - f_deltaM)
    elif w_form == 0:  # TTHG
        g_forward = controls.constant_forward * cosb_og
        g_back = controls.constant_back * cosb_og
        f = controls.frac_a + controls.frac_b * g_back ** controls.frac_c
        fdm = f_deltaM * (f * controls.constant_forward ** stream
                          + (1 - f) * controls.constant_back ** stream)
        for l in range(1, stream):
            wl = (2 * l + 1) * (f * g_forward ** l + (1 - f) * g_back ** l)
            w[l] = (wl - (2 * l + 1) * fdm) / (1 - fdm)
    # isotropic (2): weights stay at ones, matching the reference init
    w = jnp.stack(w)
    if rayleigh_on == 1:
        w = w.at[1:].mul(ftau_cld)
        if stream == 4:
            w = w.at[2].add(0.5 * ftau_ray)
    return w


def _reflected_sh_one_angle(props, surf_reflect, u0, u1, cos_theta, F0PI,
                            stream, controls, w_single_form, w_multi_form,
                            psingle_form, w_single_rayleigh,
                            w_multi_rayleigh, psingle_rayleigh, single_form,
                            b_top):
    dtau, tau, w0 = props.dtau, props.tau, props.w0
    cosb_og, w0_og = props.cosb_og, props.w0_og
    dtau_og, tau_og = props.dtau_og, props.tau_og
    ftau_cld, ftau_ray, f_deltaM = (props.ftau_cld, props.ftau_ray,
                                    props.f_deltaM)
    nlayer, nwno = dtau.shape

    Pu0 = legP(-u0)
    Pu1 = legP(u1)

    w_single = _w_expansions(stream, w_single_form, w_single_rayleigh,
                             cosb_og, ftau_cld, ftau_ray, f_deltaM,
                             controls)
    w_multi = _w_expansions(stream, w_multi_form, w_multi_rayleigh,
                            cosb_og, ftau_cld, ftau_ray, f_deltaM, controls)

    a = jnp.stack([(2 * l + 1) - w0 * w_multi[l] for l in range(stream)])
    b = jnp.stack([(F0PI * (w0 * w_single[l])) * Pu0[l] / (4 * PI)
                   for l in range(stream)])

    b_surface = 0.0 + surf_reflect * u0 * F0PI * jnp.exp(-tau[-1] / u0)
    b_surface_sh4 = -(0.0 + surf_reflect * u0 * F0PI
                      * jnp.exp(-tau[-1] / u0)) / 4

    if stream == 2:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh2_system(
            w0, dtau, tau, a, b, b_top, b_surface, surf_reflect, u0, 0)
    else:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh4_system(
            w0, dtau, tau, a, b, b_top, b_surface, b_surface_sh4,
            surf_reflect, u0, 0)
    X = _solve_sh(T, Fm, z_down, z_up, btv, bsv, surf_reflect, stream)

    # flux at bottom for the intensity recursion base (X[:, 1] is the
    # per-layer SCALED growing-mode coefficient — see _sh2_system)
    if stream == 2:
        Q2mn = aux['Q2'] * aux['exptrm']
        flux_bot = (Q2mn[-1] * X[-1, 0] + aux['Q1'][-1] * X[-1, 1]
                    + aux['zpl_up'][-1])
    else:
        f20, f21, f22, f23 = aux['f2']
        flux_bot = (f20[-1] * X[-1, 0] + f21[-1] * X[-1, 1]
                    + f22[-1] * X[-1, 2] + f23[-1] * X[-1, 3]
                    + aux['z1pl_up'][-1])

    # pair the eta source integrals with the DITHERED beam angle used in
    # the solve (aux['u0b']) so near-resonance cancellations stay exact
    u0b = aux['u0b']
    mus = (u1 + u0b) / (u1 * u0b)
    exptrm_mus = (1 - jnp.exp(-_clip(mus * dtau))) / mus
    exptau_mu = jnp.exp(-_clip(tau[:-1] / u0b))
    expon1 = exptrm_mus * exptau_mu

    eta = aux['eta']
    trans_u1 = jnp.exp(-_clip(dtau / u1))
    if stream == 2:
        lam, q = aux['lam'], aux['q']
        alpha = 1 / u1 + lam
        beta_ = 1 / u1 - lam
        exptrm_alp = (1 - jnp.exp(-_clip(alpha * dtau))) / alpha
        exptrm_bet = _scaled_bet(aux['exptrm'], trans_u1, beta_, dtau)
        Aint0 = X[:, 0] * (w_multi[0] - w_multi[1] * Pu1[1] * q) * exptrm_alp
        Aint1 = X[:, 1] * (w_multi[0] + w_multi[1] * Pu1[1] * q) * exptrm_bet
        Nint0 = w_multi[0] * (eta[0] * expon1)
        Nint1 = w_multi[1] * Pu1[1] * (eta[1] * expon1)
        multi_scat = Aint0 + Nint0 + Aint1 + Nint1
    else:
        lam1, lam2, A4 = aux['lam1'], aux['lam2'], aux['A']
        alpha1, alpha2 = 1 / u1 + lam1, 1 / u1 + lam2
        beta1, beta2 = 1 / u1 - lam1, 1 / u1 - lam2
        e = [(1 - jnp.exp(-_clip(alpha1 * dtau))) / alpha1 * X[:, 0],
             _scaled_bet(aux['exptrm1'], trans_u1, beta1, dtau) * X[:, 1],
             (1 - jnp.exp(-_clip(alpha2 * dtau))) / alpha2 * X[:, 2],
             _scaled_bet(aux['exptrm2'], trans_u1, beta2, dtau) * X[:, 3]]
        exptrm = jnp.stack(e)
        Aint = sum(w_multi[j] * Pu1[j] * A4[j] for j in range(4)) * exptrm
        Nints = sum(w_multi[j] * Pu1[j] * eta[j] * expon1 for j in range(4))
        multi_scat = Aint[0] + Aint[1] + Aint[2] + Aint[3] + Nints

    # single scattering phase function
    p_single = jnp.zeros_like(cosb_og)
    if single_form == 0:
        if psingle_form == 1:  # OTHG
            p_single = (1 - cosb_og ** 2) / (jnp.sqrt(
                1 + cosb_og ** 2 + 2 * cosb_og * cos_theta) ** 3)
        elif psingle_form == 0:  # TTHG
            g_forward = controls.constant_forward * cosb_og
            g_back = controls.constant_back * cosb_og
            f = controls.frac_a + controls.frac_b * g_back ** controls.frac_c
            p_single = (f * (1 - g_forward ** 2)
                        / jnp.sqrt((1 + g_forward ** 2
                                    + 2 * g_forward * cos_theta) ** 3)
                        + (1 - f) * (1 - g_back ** 2)
                        / jnp.sqrt((1 + g_back ** 2
                                    + 2 * g_back * cos_theta) ** 3))
        if psingle_rayleigh == 1:
            p_single = (ftau_cld * p_single
                        + ftau_ray * (0.75 * (1 + cos_theta ** 2.0)))
    else:  # legendre form
        for l in range(stream):
            p_single = p_single + w_single[l] * Pu0[l] * Pu1[l]

    exptrm_mus1 = jnp.exp(-_clip(mus * dtau_og))
    intgrl_per_layer = (w0 * multi_scat
                        + w0_og * F0PI / (4 * PI) * p_single
                        * (1 - exptrm_mus1) * jnp.exp(-tau_og[:-1] / u0)
                        / mus)

    xint_bottom = flux_bot / PI
    trans = jnp.exp(-dtau / u1)

    def ascend(x_below, row):
        t_i, s_i = row
        x = x_below * t_i + s_i / u1
        return x, None

    xint_top, _ = jax.lax.scan(ascend, xint_bottom,
                               (trans, intgrl_per_layer), reverse=True)
    return xint_top


@partial(jax.jit, static_argnames=('stream', 'controls', 'w_single_form',
                                   'w_multi_form', 'psingle_form',
                                   'w_single_rayleigh', 'w_multi_rayleigh',
                                   'psingle_rayleigh', 'single_form'))
def reflected_sh(props, surf_reflect, ubar0, ubar1, cos_theta, F0PI,
                 stream=2, controls=ScatteringControls(), w_single_form=0,
                 w_multi_form=0, psingle_form=0, w_single_rayleigh=1,
                 w_multi_rayleigh=1, psingle_rayleigh=1, single_form=0,
                 b_top=0.0):
    """Reflected light, SH 2/4-stream; replaces fluxes.py:2675-2976.

    Returns xint_at_top [ng, nt, nwno].
    """
    ng, nt = ubar0.shape
    ((props, surf_reflect, ubar0, ubar1, F0PI),
     restore) = _require_f64((props, surf_reflect, ubar0, ubar1, F0PI))

    def per_angle(u0, u1):
        return _reflected_sh_one_angle(
            props, surf_reflect, u0, u1, cos_theta, F0PI, stream, controls,
            w_single_form, w_multi_form, psingle_form, w_single_rayleigh,
            w_multi_rayleigh, psingle_rayleigh, single_form, b_top)

    xint = jax.vmap(per_angle)(ubar0.reshape(-1), ubar1.reshape(-1))
    return restore(xint.reshape(ng, nt, -1))


@partial(jax.jit, static_argnames=('stream', 'hard_surface'))
def thermal_sh(tlevel, props, plevel, ubar1, surf_reflect, wno, stream=2,
               hard_surface=False):
    """Thermal emission, SH 2/4-stream; replaces fluxes.py:2979-3186.

    Returns (flux_at_top [ng, nt, nwno], None).
    """
    out_dtype = props.dtau.dtype
    ((tlevel, props, plevel, ubar1, surf_reflect),
     _restore) = _require_f64((tlevel, props, plevel, ubar1, surf_reflect))
    dtau, tau, w0 = props.dtau, props.tau, props.w0
    cosb, cosb_og = props.cosb, props.cosb_og
    nlayer, nwno = dtau.shape
    mu1 = 0.5

    all_b = blackbody(tlevel, 1.0 / wno).astype(dtau.dtype)
    b0 = all_b[:-1]
    b1 = (all_b[1:] - b0) / dtau

    tau_top = dtau[0] * plevel[0] / (plevel[1] - plevel[0])
    b_top = PI * (1.0 - jnp.exp(-tau_top / mu1)) * all_b[0]
    if hard_surface:
        b_surface = PI * all_b[-1]
    else:
        b_surface = PI * (all_b[-1] + b1[-1] * mu1)
    b_surface_sh4 = -PI * all_b[-1] / 4

    # delta-corrected fraction (fluxes.py:3072-3075)
    ff = jnp.where(jnp.all(cosb == cosb_og), 0.0 * cosb_og,
                   cosb_og ** stream)
    w_multi = jnp.stack([(2 * l + 1) * (cosb_og ** l - ff) / (1 - ff)
                         for l in range(stream)])
    a = jnp.stack([(2 * l + 1) - w0 * w_multi[l] for l in range(stream)])
    bb = jnp.zeros((stream, nlayer, nwno), dtau.dtype)

    if stream == 2:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh2_system(
            w0, dtau, tau, a, bb, b_top, b_surface, surf_reflect, 0.0, 1,
            b0=b0, b1=b1)
    else:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh4_system(
            w0, dtau, tau, a, bb, b_top, b_surface, b_surface_sh4,
            surf_reflect, 0.0, 1, b0=b0, b1=b1)
    X = _solve_sh(T, Fm, z_down, z_up, btv, bsv, surf_reflect, stream)

    def per_angle(u1):
        Pu1 = legP(u1)
        expdtau = jnp.exp(-_clip(dtau / u1))
        if stream == 2:
            lam, q = aux['lam'], aux['q']
            alpha = 1 / u1 + lam
            beta_ = 1 / u1 - lam
            exptrm_alp = (1 - jnp.exp(-_clip(alpha * dtau))) / alpha
            exptrm_bet = _scaled_bet(aux['exptrm'], expdtau, beta_, dtau)
            Aint0 = (X[:, 0] * (w_multi[0] - w_multi[1] * Pu1[1] * q)
                     * exptrm_alp)
            Aint1 = (X[:, 1] * (w_multi[0] + w_multi[1] * Pu1[1] * q)
                     * exptrm_bet)
            Nint0 = w_multi[0] * ((1 - w0) * u1 / a[0]
                                  * (b0 * (1 - expdtau)
                                     + b1 * (u1 - (dtau + u1) * expdtau)))
            Nint1 = w_multi[1] * Pu1[1] * ((1 - w0) * u1 / a[0]
                                           * (b1 * (1 - expdtau) / a[1]))
            multi_scat = Aint0 + Nint0 + Aint1 + Nint1
        else:
            lam1, lam2, A4 = aux['lam1'], aux['lam2'], aux['A']
            alpha1, alpha2 = 1 / u1 + lam1, 1 / u1 + lam2
            beta1, beta2 = 1 / u1 - lam1, 1 / u1 - lam2
            e = [(1 - jnp.exp(-_clip(alpha1 * dtau))) / alpha1 * X[:, 0],
                 _scaled_bet(aux['exptrm1'], expdtau, beta1, dtau)
                 * X[:, 1],
                 (1 - jnp.exp(-_clip(alpha2 * dtau))) / alpha2 * X[:, 2],
                 _scaled_bet(aux['exptrm2'], expdtau, beta2, dtau)
                 * X[:, 3]]
            exptrm = jnp.stack(e)
            Aint = sum(w_multi[j] * Pu1[j] * A4[j]
                       for j in range(4)) * exptrm
            Nint0 = w_multi[0] * ((1 - w0) * u1 / a[0]
                                  * (b0 * (1 - expdtau)
                                     + b1 * (u1 - (dtau + u1) * expdtau)))
            Nint1 = w_multi[1] * u1 * ((1 - w0) * u1 / a[0]
                                       * (b1 * (1 - expdtau) / a[1]))
            multi_scat = (Aint[0] + Aint[1] + Aint[2] + Aint[3]
                          + Nint0 + Nint1)

        intgrl_per_layer = (w0 * multi_scat * 2 * PI
                            + 2 * PI * (1 - w0) * u1
                            * (b0 * (1 - expdtau)
                               + b1 * (u1 - (dtau + u1) * expdtau)))

        if hard_surface:
            xint_bottom = all_b[-1] * 2 * PI
        else:
            xint_bottom = (all_b[-1] + b1[-1] * u1) * 2 * PI

        def ascend(x_below, row):
            t_i, s_i = row
            return x_below * t_i + s_i / u1, None

        xint_top, _ = jax.lax.scan(ascend, xint_bottom,
                                   (expdtau, intgrl_per_layer),
                                   reverse=True)
        return xint_top

    ng, nt = ubar1.shape
    flux = jax.vmap(per_angle)(ubar1.reshape(-1))
    return flux.reshape(ng, nt, nwno).astype(out_dtype), None
