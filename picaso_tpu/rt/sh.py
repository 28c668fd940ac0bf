"""Spherical-harmonics radiative transfer (Rooney et al. 2023a,b), 2 & 4
stream.

TPU redesign of the reference SH path (``fluxes.py:2675-3628``): the
reference assembles 5/11-diagonal banded matrices and calls
``scipy.linalg.solve_banded`` once per wavelength (the #2 hot loop).  Here
the same systems are assembled directly in *block-tridiagonal* form (s x s
blocks, s = stream) and solved by a block-Thomas ``lax.scan``.

Two TPU-shaped design decisions make this path fast (round 3; the round-2
version ran the whole pipeline per disk angle and kept the s x s blocks in
the minor-most array dims):

1. **The block matrix is angle-independent.**  Only the beam source terms
   (eta, z+-, b_surface) depend on the incidence angle ubar0
   (fluxes.py:3243-3259 — lam/Q/R/S/p/q are functions of w0/dtau alone), so
   :func:`reflected_sh` factors the system ONCE and carries all disk angles
   as extra right-hand sides through a single elimination sweep.
2. **Wavelength stays in the vector-lane dimension.**  The per-step s x s
   pivoted Gauss-Jordan solves are fully unrolled over the (tiny, static)
   block indices, so every arithmetic op is an elementwise [nwno] vector op
   at full lane utilization — no [..., 4, 4] minor dims, no gather-based
   pivoting (partial pivoting is a chain of |.|-compare row swaps via
   ``jnp.where``).

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
# Precision (round-4 measurement, scripts/sh_f32_probe.py): the SH
# mode-coefficient system is a two-point BVP whose CLASSIC block-row
# pairing (the reference's banded layout) yields diagonal blocks that go
# exactly singular at f32 for optically thin layers (exp(-lam dtau)
# rounds to 1.0; measured full-f32 SH4 albedo errors up to 1e4x).  With
# the 'incoming'-field row pairing (see _solve_sh) every pivot block
# stays nonsingular and THE F32 SOLVE LOSES NOTHING: measured against
# the f64 reference on the bench problem, full-f32-incoming matches
# f32-assembly+f64-solve to the last digit — max relative error 6e-5
# (SH2) / 1.8e-3 (SH4) albedo, ~2e-3 thermal, median ~5e-4 — i.e. the
# residual error is f32 assembly/intensity rounding, not the solve, and
# it sits well inside the reference's own golden tolerance (atol 0.01).
# The reference only ever runs this path in float64 scipy
# (fluxes.py:3610-3628).  Entry points accept precision='auto' (f64
# when x64 is enabled — bit-compatible with the oracles — else f32
# with the incoming grouping), 'f64' (raises if x64 is off), or 'f32'.


def _promote(arrays, precision):
    """Cast a pytree of SH inputs per the requested precision.

    Returns (cast_pytree, restore) where restore(x) casts outputs back
    to the inputs' original dtype.  See the precision note above.
    """
    leaves = jax.tree_util.tree_leaves(arrays)
    dt = jnp.result_type(*[x.dtype for x in leaves
                           if hasattr(x, 'dtype')])
    if precision == 'auto':
        precision = 'f64' if jax.config.jax_enable_x64 else 'f32'
    if precision == 'f64' and not jax.config.jax_enable_x64:
        raise ValueError(
            "SH precision='f64' requires float64: enable it with "
            'jax.config.update("jax_enable_x64", True) — float64 '
            'executes correctly (double-single emulated) on TPU — or '
            "use precision='auto'/'f32' (incoming-grouping f32 path, "
            'max relative error ~2e-3; see rt/sh.py precision note).')
    target = jnp.float64 if precision == 'f64' else jnp.float32
    cast = jax.tree_util.tree_map(
        lambda x: x.astype(target)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
        else x, arrays)
    if target == dt:
        return cast, lambda x: x
    return cast, lambda x: jax.tree_util.tree_map(
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
    (e^{-lam*dtau} - e^{-dtau/u1})/beta.  That difference of NEARBY
    decaying exponentials cancels catastrophically at f32 around the
    removable beta -> 0 resonance, so for |beta*dtau| < 1 it is
    evaluated in the exactly-equivalent departure form
    e^{-lam*dtau} * (-expm1(-beta*dtau))/beta (zero cancellation; the
    |beta| < eps Taylor limit covers the 0/0 point).  For
    |beta*dtau| >= 1 the exponentials differ by >= a factor e and the
    plain clipped difference is already accurate (and overflow-safe
    where the expm1 form is not)."""
    bd = beta * dtau
    near = jnp.abs(bd) < 1.0
    em = -jnp.expm1(-jnp.clip(bd, -1.0, 1.0))
    safe = jnp.where(jnp.abs(beta) < eps, 1.0, beta)
    quotient = jnp.where(jnp.abs(beta) < eps,
                         dtau * (1.0 - 0.5 * bd),
                         jnp.where(near, em, 1.0) / safe)
    # |bd| >= 1 implies beta != 0, but guard the division anyway
    far = (exptrm_lam - trans_u1) / jnp.where(beta == 0.0, 1.0, beta)
    return jnp.where(near, exptrm_lam * quotient, far)


# ---------------------------------------------------------------------------
# lanes-last block-tridiagonal solver
# ---------------------------------------------------------------------------

def _gj_solve(M, s, ncols, pivot):
    """In-place Gauss-Jordan on an s x (s+ncols) augmented row list.

    ``M`` is a list of s rows, each a list of s+ncols elementwise arrays
    (lanes-last).  Partial pivoting is a chain of compare-and-swap row
    exchanges on |column i| — running max, no gathers.  Returns the
    solution columns (list of s rows x ncols).
    """
    ntot = s + ncols
    for i in range(s):
        if pivot:
            for r in range(i + 1, s):
                swap = jnp.abs(M[r][i]) > jnp.abs(M[i][i])
                for c in range(i, ntot):
                    top, bot = M[i][c], M[r][c]
                    M[i][c] = jnp.where(swap, bot, top)
                    M[r][c] = jnp.where(swap, top, bot)
        inv = 1.0 / M[i][i]
        for c in range(i + 1, ntot):
            M[i][c] = M[i][c] * inv
        for r in range(s):
            if r == i:
                continue
            fac = M[r][i]
            for c in range(i + 1, ntot):
                M[r][c] = M[r][c] - fac * M[i][c]
    return [row[s:] for row in M]


def _rows(x, s, ncols):
    """[s, ncols, ...] array -> list-of-lists of lanes-last slices."""
    return [[x[i, j] for j in range(ncols)] for i in range(s)]


def _stack(rows):
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)


def block_tridiag_solve(A, B, C, D, pivot=True):
    """Solve the block-tridiagonal system with s x s blocks, lanes-last.

    A, B, C: [n, s, s, nw] (A[0] and C[-1] ignored); D: [n, s, nw] for a
    single right-hand side or [n, s, nr, nw] for nr of them.  One
    block-Thomas forward elimination serves every RHS (the Cp recursion —
    the expensive part — is shared).  The per-step s x s solves are
    unrolled pivoted Gauss-Jordan on [nw]-vector entries (see module
    docstring).  Returns y with D's shape.
    """
    single = D.ndim == 3
    if single:
        D = D[:, :, None, :]
    n, s, nr = D.shape[0], D.shape[1], D.shape[2]

    def first(B0, C0, D0):
        M = [[B0[i, j] for j in range(s)]
             + [C0[i, j] for j in range(s)]
             + [D0[i, r] for r in range(nr)] for i in range(s)]
        sol = _gj_solve(M, s, s + nr, pivot)
        Cp = _stack([row[:s] for row in sol])
        Dp = _stack([row[s:] for row in sol])
        return Cp, Dp

    def fwd(carry, row):
        Cp_prev, Dp_prev = carry
        Ak, Bk, Ck, Dk = row
        # denom = Bk - Ak @ Cp_prev ; rhs_D = Dk - Ak @ Dp_prev (unrolled)
        M = []
        for i in range(s):
            r = []
            for j in range(s):
                acc = Bk[i, j]
                for k in range(s):
                    acc = acc - Ak[i, k] * Cp_prev[k, j]
                r.append(acc)
            for j in range(s):
                r.append(Ck[i, j])
            for q in range(nr):
                acc = Dk[i, q]
                for k in range(s):
                    acc = acc - Ak[i, k] * Dp_prev[k, q]
                r.append(acc)
            M.append(r)
        sol = _gj_solve(M, s, s + nr, pivot)
        Cp = _stack([row[:s] for row in sol])
        Dp = _stack([row[s:] for row in sol])
        return (Cp, Dp), (Cp, Dp)

    def back(y_next, row):
        Cp_k, Dp_k = row
        rows = []
        for i in range(s):
            rr = []
            for q in range(nr):
                acc = Dp_k[i, q]
                for j in range(s):
                    acc = acc - Cp_k[i, j] * y_next[j, q]
                rr.append(acc)
            rows.append(rr)
        y_k = _stack(rows)
        return y_k, y_k

    Cp0, Dp0 = first(B[0], C[0], D[0])
    (_, _), (Cp_rest, Dp_rest) = jax.lax.scan(
        fwd, (Cp0, Dp0), (A[1:], B[1:], C[1:], D[1:]))
    Cp = jnp.concatenate([Cp0[None], Cp_rest], axis=0)
    Dp = jnp.concatenate([Dp0[None], Dp_rest], axis=0)
    y_last = Dp[-1]
    _, ys = jax.lax.scan(back, y_last, (Cp[:-1], Dp[:-1]), reverse=True)
    y = jnp.concatenate([ys, y_last[None]], axis=0)   # [n, s, nr, nw]
    return y[:, :, 0, :] if single else y


# ---------------------------------------------------------------------------
# 2-stream pieces (fluxes.py:3189-3333)
# ---------------------------------------------------------------------------

def _sh2_system(w0, dtau, tau, a, b, b_top, b_surface, surf_reflect, ubar0,
                calculation, b0=None, b1=None):
    """2-stream SH block system.

    For reflected light (``calculation=0``) ``ubar0`` is a vector of nr
    beam angles and ``b``/``b_surface`` carry a leading/first nr axis; the
    source terms (eta, z+-) gain an nr axis while the matrix blocks (T,
    Fm) stay angle-independent.  Thermal (``calculation=1``) has nr=1.
    """
    nlayer, nwno = dtau.shape
    lam = jnp.sqrt(a[0] * a[1])
    if calculation == 0:
        # beam resonance lam*u0 -> 1 (Del -> 0): the eta particular
        # solution diverges non-removably (fluxes.py:3243-3247 is
        # unguarded f64); dither u0 elementwise off the eigenvalue like
        # the Toon path (toon._dither_u0) and use the dithered angle
        # consistently in Del, eta, and the exp(-tau/u0) attenuation.
        u0b = _dither_u0(lam, ubar0[:, None, None])     # [nr, n, nw]
        Del = (1.0 / u0b) ** 2 - a[0] * a[1]
        eta = jnp.stack([(b[1] / u0b - a[1] * b[0]) / Del,
                         (b[0] / u0b - a[0] * b[1]) / Del])
    else:
        u0b = jnp.ones((1, nlayer, nwno), dtau.dtype)
        eta = jnp.zeros((2, 1, nlayer, nwno), dtau.dtype)

    exptrm = jnp.exp(-jnp.clip(lam * dtau, 0.0, _CLIP))
    q = lam / a[1]
    Q1 = (0.5 + q) * 2 * PI
    Q2 = (0.5 - q) * 2 * PI
    Q1mn, Q2mn = Q1 * exptrm, Q2 * exptrm

    if calculation == 0:
        zmn = (0.5 * eta[0] - eta[1]) * 2 * PI           # [nr, n, nw]
        zpl = (0.5 * eta[0] + eta[1]) * 2 * PI
        zmn_up, zpl_up = (zmn * jnp.exp(-tau[1:] / u0b),
                          zpl * jnp.exp(-tau[1:] / u0b))
        zmn_down, zpl_down = (zmn * jnp.exp(-tau[:-1] / u0b),
                              zpl * jnp.exp(-tau[:-1] / u0b))
    else:
        pref = (1 - w0) / a[0] * 2 * PI
        zmn_down = (pref * (b0 / 2 - b1 / a[1]))[None]
        zmn_up = (pref * (b0 / 2 - b1 / a[1] + b1 * dtau / 2))[None]
        zpl_down = (pref * (b0 / 2 + b1 / a[1]))[None]
        zpl_up = (pref * (b0 / 2 + b1 / a[1] + b1 * dtau / 2))[None]

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
    z_down = jnp.stack([zmn_down, zpl_down], 2)  # [nr, n, 2, nw]
    z_up = jnp.stack([zmn_up, zpl_up], 2)
    nr = z_down.shape[0]
    b_top_vec = jnp.broadcast_to(b_top, (nr, 1, nwno))
    b_surf_vec = jnp.reshape(b_surface, (nr, 1, nwno))

    aux = dict(lam=lam, q=q, eta=eta, Q1=Q1, Q2=Q2,
               zpl_up=zpl_up, exptrm=exptrm, u0b=u0b)
    return T, Fm, z_down, z_up, b_top_vec, b_surf_vec, aux


# ---------------------------------------------------------------------------
# 4-stream pieces (fluxes.py:3336-3607)
# ---------------------------------------------------------------------------

def _sh4_system(w0, dtau, tau, a, b, b_top, b_surface, b_surface_sh4,
                surf_reflect, ubar0, calculation, b0=None, b1=None):
    """4-stream SH block system; angle/source layout as :func:`_sh2_system`."""
    nlayer, nwno = dtau.shape
    beta = a[0] * a[1] + 4 * a[0] * a[3] / 9 + a[2] * a[3] / 9
    gama = a[0] * a[1] * a[2] * a[3] / 9
    root = jnp.sqrt(beta ** 2 - 4 * gama)
    lam1 = jnp.sqrt((beta + root) / 2)
    lam2 = jnp.sqrt((beta - root) / 2)

    if calculation == 0:
        # dither off BOTH eigenvalue resonances (see _sh2_system)
        u0v = ubar0[:, None, None]                       # [nr, 1, 1]
        u0b = _dither_u0(lam2, _dither_u0(lam1, u0v))    # [nr, n, nw]
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
                         Dels3 / Del])                   # [4, nr, n, nw]
        z1pl = (eta[0] / 2 + eta[1] + 5 * eta[2] / 8) * 2 * PI
        z1mn = (eta[0] / 2 - eta[1] + 5 * eta[2] / 8) * 2 * PI
        z2pl = (-eta[0] / 8 + 5 * eta[2] / 8 + eta[3]) * 2 * PI
        z2mn = (-eta[0] / 8 + 5 * eta[2] / 8 - eta[3]) * 2 * PI
    else:
        eta = jnp.zeros((4, 1, nlayer, nwno), dtau.dtype)

    exptrm1 = jnp.exp(-jnp.clip(lam1 * dtau, 0.0, _CLIP))
    exptrm2 = jnp.exp(-jnp.clip(lam2 * dtau, 0.0, _CLIP))

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
        u0b = jnp.ones((1, nlayer, nwno), dtau.dtype)
        pref = (1 - w0) / a[0] * 2 * PI
        pref2 = -0.5 * (1 - w0) / (4 * a[0]) * 2 * PI
        z1mn_up = (pref * (b0 / 2 - b1 / a[1] + b1 * dtau / 2))[None]
        z2mn_up = (pref2 * (b0 + b1 * dtau))[None]
        z1pl_up = (pref * (b0 / 2 + b1 / a[1] + b1 * dtau / 2))[None]
        z2pl_up = (pref2 * (b0 + b1 * dtau))[None]
        z1mn_down = (pref * (b0 / 2 - b1 / a[1]))[None]
        z2mn_down = (pref2 * b0)[None]
        z1pl_down = (pref * (b0 / 2 + b1 / a[1]))[None]
        z2pl_down = (pref2 * b0)[None]

    def rows4(r0, r1, r2, r3):
        return jnp.stack([jnp.stack(r0, 1), jnp.stack(r1, 1),
                          jnp.stack(r2, 1), jnp.stack(r3, 1)], 1)

    T = rows4((p1mn, p1pl * exptrm1, p2mn, p2pl * exptrm2),
              (q1mn, q1pl * exptrm1, q2mn, q2pl * exptrm2),
              (p1pl, p1mn * exptrm1, p2pl, p2mn * exptrm2),
              (q1pl, q1mn * exptrm1, q2pl, q2mn * exptrm2))
    Fm = rows4((f00, f01, f02, f03), (f10, f11, f12, f13),
               (f20, f21, f22, f23), (f30, f31, f32, f33))
    z_down = jnp.stack([z1mn_down, z2mn_down, z1pl_down, z2pl_down], 2)
    z_up = jnp.stack([z1mn_up, z2mn_up, z1pl_up, z2pl_up], 2)
    nr = z_down.shape[0]
    bt = jnp.broadcast_to(jnp.asarray(b_top), (nr, nwno))
    b_top_vec = jnp.stack([bt, -bt / 4.0], 1)            # [nr, 2, nw]
    b_surf_vec = jnp.stack([jnp.reshape(b_surface, (nr, nwno)),
                            jnp.reshape(b_surface_sh4, (nr, nwno))], 1)

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


def _default_grouping(dtype):
    """Row-pairing choice by working precision (see _solve_sh)."""
    return 'classic' if dtype == jnp.float64 else 'incoming'


def _solve_sh(T, Fm, z_down, z_up, b_top_vec, b_surf_vec, surf_reflect,
              stream, grouping=None):
    """Assemble the block-tridiagonal system and solve for X.

    T, Fm: [n, s, s, nw] (angle-independent); z_down/z_up: [nr, n, s, nw];
    b_top_vec/b_surf_vec: [nr, h, nw].  One factorization, nr right-hand
    sides.  Returns X [n, s, nr, nw].

    ``grouping`` picks between two equivalent block-row pairings of the
    same equation set (top BC, n-1 interface-continuity row pairs,
    bottom BC); None = by dtype (classic at f64 for bit-compatibility
    with the dense oracles, incoming at f32):

    - 'classic' (the reference's banded layout, fluxes.py:3260-3320):
      block-row k = [interface-k pl-rows; interface-(k+1) mn-rows].  Its
      diagonal block for an optically THIN layer pairs two copies of the
      same flux functional (exp(-lam dtau) -> 1), which is exactly
      singular at f32.
    - 'incoming': block-row k = [interface-k mn-rows;
      interface-(k+1) pl-rows], making every diagonal block the layer's
      incoming-field matrix [T[k,:h]; Fm[k,h:]] — nonsingular for thin
      (det ~ Q1^2 - Q2^2 e^2) AND thick (block-diagonal) layers, so the
      block-Thomas elimination never meets a degenerate pivot block
      (measured: full-f32 solve error indistinguishable from f64-solve
      at f32 assembly; scripts/sh_f32_probe.py).
    """
    n, s, _, nw = T.shape
    h = s // 2
    nr = z_down.shape[0]
    zero_blk = jnp.zeros((n - 1, h, s, nw), T.dtype)
    if grouping is None:
        grouping = _default_grouping(T.dtype)

    if grouping == 'incoming':
        # A blocks: rows [f_mn_rows[k-1]; 0] for k>=1
        A = jnp.concatenate([
            jnp.zeros((1, s, s, nw), T.dtype),
            jnp.concatenate([Fm[:-1, :h], zero_blk], axis=1)], axis=0)
        B_first = jnp.concatenate([T[0, :h][None], Fm[0, h:][None]],
                                  axis=1)
        B_mid = jnp.concatenate([-T[1:-1, :h], Fm[1:-1, h:]], axis=1) \
            if n > 2 else jnp.zeros((0, s, s, nw), T.dtype)
        B_last = jnp.concatenate([
            -T[-1, :h][None],
            (Fm[-1, h:] - surf_reflect * Fm[-1, :h])[None]], axis=1)
        B = jnp.concatenate([B_first, B_mid, B_last], axis=0)
        # C blocks: rows [0; -T_pl_rows[k+1]]
        C = jnp.concatenate([
            jnp.concatenate([zero_blk, -T[1:, h:]], axis=1),
            jnp.zeros((1, s, s, nw), T.dtype)], axis=0)

        D_first = jnp.concatenate([
            b_top_vec - z_down[:, 0, :h],
            z_down[:, 1, h:] - z_up[:, 0, h:]], axis=1)[:, None]
        if n > 2:
            D_mid = jnp.concatenate([
                z_down[:, 1:-1, :h] - z_up[:, :-2, :h],
                z_down[:, 2:, h:] - z_up[:, 1:-1, h:]], axis=2)
        else:
            D_mid = jnp.zeros((nr, 0, s, nw), T.dtype)
        D_last = jnp.concatenate([
            z_down[:, -1, :h] - z_up[:, -2, :h],
            (b_surf_vec - z_up[:, -1, h:]
             + surf_reflect * z_up[:, -1, :h])], axis=1)[:, None]
        D = jnp.concatenate([D_first, D_mid, D_last], axis=1)
        D = jnp.moveaxis(D, 0, 2)                   # [n, s, nr, nw]
        return block_tridiag_solve(A, B, C, D)

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

    # D blocks, per RHS: [nr, n, s, nw]
    D_first = jnp.concatenate([
        b_top_vec - z_down[:, 0, :h],
        z_down[:, 1, :h] - z_up[:, 0, :h]], axis=1)[:, None]
    if n > 2:
        D_mid = jnp.concatenate([
            z_down[:, 1:-1, h:] - z_up[:, :-2, h:],
            z_down[:, 2:, :h] - z_up[:, 1:-1, :h]], axis=2)
    else:
        D_mid = jnp.zeros((nr, 0, s, nw), T.dtype)
    D_last = jnp.concatenate([
        z_down[:, -1, h:] - z_up[:, -2, h:],
        (b_surf_vec - z_up[:, -1, h:]
         + surf_reflect * z_up[:, -1, :h])], axis=1)[:, None]
    D = jnp.concatenate([D_first, D_mid, D_last], axis=1)
    D = jnp.moveaxis(D, 0, 2)                       # [n, s, nr, nw]

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


def _sh_intensity(props, X, eta, u0b, u0, u1, cos_theta, F0PI, stream, aux,
                  w_single, w_multi, controls, psingle_form,
                  psingle_rayleigh, single_form, flux_bot):
    """TOA intensity recursion for ONE outgoing angle (fluxes.py:2900-2972).

    X [n, s, nw] and eta/u0b carry this angle's solved coefficients and
    dithered beam angle; ``u0`` is the raw (undithered) incidence cosine
    used in the single-scattering attenuation, matching the reference.
    """
    dtau, tau = props.dtau, props.tau
    w0, cosb_og, w0_og = props.w0, props.cosb_og, props.w0_og
    dtau_og, tau_og = props.dtau_og, props.tau_og
    ftau_cld, ftau_ray = props.ftau_cld, props.ftau_ray
    Pu0 = legP(-u0)
    Pu1 = legP(u1)

    # pair the eta source integrals with the DITHERED beam angle used in
    # the solve (u0b) so near-resonance cancellations stay exact; the
    # (1 - e^{-x})/x quotients use expm1 so thin layers (x -> 0, where
    # e^{-x} rounds to 1.0 at f32) keep full relative accuracy
    mus = (u1 + u0b) / (u1 * u0b)
    exptrm_mus = -jnp.expm1(-_clip(mus * dtau)) / mus
    exptau_mu = jnp.exp(-_clip(tau[:-1] / u0b))
    expon1 = exptrm_mus * exptau_mu

    trans_u1 = jnp.exp(-_clip(dtau / u1))
    if stream == 2:
        lam, q = aux['lam'], aux['q']
        alpha = 1 / u1 + lam
        beta_ = 1 / u1 - lam
        exptrm_alp = -jnp.expm1(-_clip(alpha * dtau)) / alpha
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
        e = [-jnp.expm1(-_clip(alpha1 * dtau)) / alpha1 * X[:, 0],
             _scaled_bet(aux['exptrm1'], trans_u1, beta1, dtau) * X[:, 1],
             -jnp.expm1(-_clip(alpha2 * dtau)) / alpha2 * X[:, 2],
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

    em_mus1 = -jnp.expm1(-_clip(mus * dtau_og))
    intgrl_per_layer = (w0 * multi_scat
                        + w0_og * F0PI / (4 * PI) * p_single
                        * em_mus1 * jnp.exp(-tau_og[:-1] / u0)
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
                                   'psingle_rayleigh', 'single_form',
                                   'precision'))
def reflected_sh(props, surf_reflect, ubar0, ubar1, cos_theta, F0PI,
                 stream=2, controls=ScatteringControls(), w_single_form=0,
                 w_multi_form=0, psingle_form=0, w_single_rayleigh=1,
                 w_multi_rayleigh=1, psingle_rayleigh=1, single_form=0,
                 b_top=0.0, precision='auto'):
    """Reflected light, SH 2/4-stream; replaces fluxes.py:2675-2976.

    The block matrix is factored once; all ng x nt disk angles ride the
    same elimination as extra right-hand sides (see module docstring).
    ``precision``: 'auto' | 'f64' | 'f32' (see the module precision
    note).  Returns xint_at_top [ng, nt, nwno].
    """
    ng, nt = ubar0.shape
    ((props, surf_reflect, ubar0, ubar1, F0PI),
     restore) = _promote((props, surf_reflect, ubar0, ubar1, F0PI),
                         precision)

    dtau, tau, w0 = props.dtau, props.tau, props.w0
    cosb_og = props.cosb_og
    ftau_cld, ftau_ray, f_deltaM = (props.ftau_cld, props.ftau_ray,
                                    props.f_deltaM)
    u0s = ubar0.reshape(-1)                              # [nr]
    u1s = ubar1.reshape(-1)

    w_single = _w_expansions(stream, w_single_form, w_single_rayleigh,
                             cosb_og, ftau_cld, ftau_ray, f_deltaM,
                             controls)
    w_multi = _w_expansions(stream, w_multi_form, w_multi_rayleigh,
                            cosb_og, ftau_cld, ftau_ray, f_deltaM, controls)

    a = jnp.stack([(2 * l + 1) - w0 * w_multi[l] for l in range(stream)])
    # beam sources for every angle: b[l] has shape [nr, nlayer, nwno]
    Pu0s = legP(-u0s[:, None, None])
    # NB: the beam source expands in the SINGLE-scattering moments while
    # the sink term a uses the multi-scattering ones (fluxes.py:2859-2860)
    b = jnp.stack([(F0PI * (w0 * w_single[l]))[None] * Pu0s[l] / (4 * PI)
                   for l in range(stream)])
    b_surface = (0.0 + surf_reflect * u0s[:, None] * F0PI
                 * jnp.exp(-tau[-1][None] / u0s[:, None]))   # [nr, nw]
    b_surface_sh4 = -b_surface / 4

    if stream == 2:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh2_system(
            w0, dtau, tau, a, b, b_top, b_surface, surf_reflect, u0s, 0)
    else:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh4_system(
            w0, dtau, tau, a, b, b_top, b_surface, b_surface_sh4,
            surf_reflect, u0s, 0)
    X = _solve_sh(T, Fm, z_down, z_up, btv, bsv, surf_reflect, stream)
    X = jnp.moveaxis(X, 2, 0)                            # [nr, n, s, nw]

    # flux at bottom for the intensity recursion base (X[:, 1] is the
    # per-layer SCALED growing-mode coefficient — see _sh2_system)
    if stream == 2:
        Q2mn = aux['Q2'] * aux['exptrm']
        flux_bot = (Q2mn[-1] * X[:, -1, 0] + aux['Q1'][-1] * X[:, -1, 1]
                    + aux['zpl_up'][:, -1])
    else:
        f20, f21, f22, f23 = aux['f2']
        flux_bot = (f20[-1] * X[:, -1, 0] + f21[-1] * X[:, -1, 1]
                    + f22[-1] * X[:, -1, 2] + f23[-1] * X[:, -1, 3]
                    + aux['z1pl_up'][:, -1])

    eta = jnp.moveaxis(aux['eta'], 1, 0)                 # [nr, stream, n, nw]
    u0b = aux['u0b']                                     # [nr, n, nw]

    def per_angle(Xr, etar, u0br, u0, u1, fb):
        return _sh_intensity(props, Xr, etar, u0br, u0, u1, cos_theta,
                             F0PI, stream, aux, w_single, w_multi, controls,
                             psingle_form, psingle_rayleigh, single_form,
                             fb)

    xint = jax.vmap(per_angle)(X, eta, u0b, u0s, u1s, flux_bot)
    return restore(xint.reshape(ng, nt, -1))


@partial(jax.jit, static_argnames=('stream', 'hard_surface', 'precision'))
def thermal_sh(tlevel, props, plevel, ubar1, surf_reflect, wno, stream=2,
               hard_surface=False, precision='auto'):
    """Thermal emission, SH 2/4-stream; replaces fluxes.py:2979-3186.

    ``precision``: 'auto' | 'f64' | 'f32' (see the module precision
    note).  Returns (flux_at_top [ng, nt, nwno], None).
    """
    out_dtype = props.dtau.dtype
    ((tlevel, props, plevel, ubar1, surf_reflect),
     _restore) = _promote((tlevel, props, plevel, ubar1, surf_reflect),
                          precision)
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
    bb = jnp.zeros((stream, 1, nlayer, nwno), dtau.dtype)

    if stream == 2:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh2_system(
            w0, dtau, tau, a, bb, b_top, b_surface, surf_reflect,
            jnp.ones((1,), dtau.dtype), 1, b0=b0, b1=b1)
    else:
        T, Fm, z_down, z_up, btv, bsv, aux = _sh4_system(
            w0, dtau, tau, a, bb, b_top, b_surface, b_surface_sh4,
            surf_reflect, jnp.ones((1,), dtau.dtype), 1, b0=b0, b1=b1)
    X = _solve_sh(T, Fm, z_down, z_up, btv, bsv, surf_reflect,
                  stream)[:, :, 0, :]                    # [n, s, nw]

    def per_angle(u1):
        Pu1 = legP(u1)
        # em = 1 - e^{-dtau/u1} via expm1: exact for optically thin
        # layers where the plain difference rounds to 0 at f32
        em = -jnp.expm1(-_clip(dtau / u1))
        expdtau = 1.0 - em
        if stream == 2:
            lam, q = aux['lam'], aux['q']
            alpha = 1 / u1 + lam
            beta_ = 1 / u1 - lam
            exptrm_alp = -jnp.expm1(-_clip(alpha * dtau)) / alpha
            exptrm_bet = _scaled_bet(aux['exptrm'], expdtau, beta_, dtau)
            Aint0 = (X[:, 0] * (w_multi[0] - w_multi[1] * Pu1[1] * q)
                     * exptrm_alp)
            Aint1 = (X[:, 1] * (w_multi[0] + w_multi[1] * Pu1[1] * q)
                     * exptrm_bet)
            Nint0 = w_multi[0] * ((1 - w0) * u1 / a[0]
                                  * (b0 * em
                                     + b1 * (u1 - (dtau + u1) * expdtau)))
            Nint1 = w_multi[1] * Pu1[1] * ((1 - w0) * u1 / a[0]
                                           * (b1 * em / a[1]))
            multi_scat = Aint0 + Nint0 + Aint1 + Nint1
        else:
            lam1, lam2, A4 = aux['lam1'], aux['lam2'], aux['A']
            alpha1, alpha2 = 1 / u1 + lam1, 1 / u1 + lam2
            beta1, beta2 = 1 / u1 - lam1, 1 / u1 - lam2
            e = [-jnp.expm1(-_clip(alpha1 * dtau)) / alpha1 * X[:, 0],
                 _scaled_bet(aux['exptrm1'], expdtau, beta1, dtau)
                 * X[:, 1],
                 -jnp.expm1(-_clip(alpha2 * dtau)) / alpha2 * X[:, 2],
                 _scaled_bet(aux['exptrm2'], expdtau, beta2, dtau)
                 * X[:, 3]]
            exptrm = jnp.stack(e)
            Aint = sum(w_multi[j] * Pu1[j] * A4[j]
                       for j in range(4)) * exptrm
            Nint0 = w_multi[0] * ((1 - w0) * u1 / a[0]
                                  * (b0 * em
                                     + b1 * (u1 - (dtau + u1) * expdtau)))
            Nint1 = w_multi[1] * u1 * ((1 - w0) * u1 / a[0]
                                       * (b1 * em / a[1]))
            multi_scat = (Aint[0] + Aint[1] + Aint[2] + Aint[3]
                          + Nint0 + Nint1)

        intgrl_per_layer = (w0 * multi_scat * 2 * PI
                            + 2 * PI * (1 - w0) * u1
                            * (b0 * em
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
