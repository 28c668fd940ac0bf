"""Pallas TPU megakernels for the SH 2- and 4-stream reflected + thermal solves.

The XLA SH path (:mod:`picaso_tpu.rt.sh`) is a faithful TPU redesign of
the reference's banded solves (fluxes.py:2675-3628), but at production
resolution it is dominated by the block-Thomas ``lax.scan``: every one
of the ~90 sequential steps round-trips its [4, 4+nr, nwno] carries and
stacked outputs through HBM, and the assembled system (T/Fm/z, ~2 GB at
nwno = 5e4) is materialized between the assembly and solve stages —
measured 7.5 spectra/s vs 163/s for the Toon megakernel path.

These kernels apply the recipe that fixed Toon (rt/pallas_toon.py):
block the wavelength axis, build the optical properties AND the SH
coefficient/system rows per block in VMEM (vectorized over layers —
Mosaic lowers no dynamic_slice on values, so everything a fori_loop
touches is staged into VMEM scratch first), run the block-Thomas
elimination as a ``lax.fori_loop`` over scratch rows, and finish with
the source-function intensity sweeps on-chip.  HBM traffic drops to one
read of the 6 per-source input strips plus one [nang, nwno] write.

Math parity: coefficients, eta/z sources, the 'incoming' block-row
grouping (rt/sh.py::_solve_sh — every pivot block nonsingular at f32),
boundary rows, and the intensity recursions follow rt/sh.py line for
line (which in turn cites fluxes.py:3336-3607, :2787-2976, :3052-3186);
equality with the scan path is asserted by tests/test_pallas_sh.py in
interpret mode and on hardware by scripts/tpu_parity.py.

Block structure (either stream count, h = s/2): in the incoming
grouping the sub-diagonal block A[k] = [Fm[k-1, :h]; 0] and
super-diagonal C[k] = [0; -T[k+1, h:]] each have h zero rows, so the
Schur updates A @ Cp / A @ Dp touch only the top h rows of the working
matrix and C contributes only h*s nonzero entries — the per-step
Gauss-Jordan below exploits both (roughly half the multiply-adds of the
dense form).

s-row order everywhere: stream 4 is [z1mn, z2mn, z1pl, z2pl]
functionals, stream 2 is [zmn, zpl] (the rt/sh.py stack orders); mode
order [X1, X2', (X3, X4')] with the growing modes scaled per layer
(X2' = X2 e^{-lam dtau}; rt/sh.py scaling note).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PI
from .toon import ScatteringControls, _dither_u0
from .pallas_toon import _optics_block

__all__ = ['reflected_sh4_pallas', 'thermal_sh4_pallas',
           'reflected_sh2_pallas', 'thermal_sh2_pallas']

_CLIP = 35.0


def _clip(x):
    return jnp.clip(x, -_CLIP, _CLIP)


def _expm1(x):
    """exp(x) - 1 without the expm1 primitive (Mosaic has no lowering).

    |x| < 0.05: 4th-order Taylor (truncation < 5e-8 relative); else the
    plain difference, whose cancellation error (1 ulp of e^x against a
    value >= 0.0488) stays under ~2.5e-6 relative — together matching
    f32 expm1 to a few ulp everywhere.
    """
    small = jnp.abs(x) < 0.05
    xs = jnp.where(small, x, 0.0)
    series = xs * (1.0 + xs * (0.5 + xs * (1.0 / 6.0 + xs / 24.0)))
    return jnp.where(small, series, jnp.exp(x) - 1.0)


def _scaled_bet(exptrm_lam, trans_u1, beta, dtau, eps=1e-4):
    """Growing-mode source integral (rt/sh.py::_scaled_bet, same math)."""
    bd = beta * dtau
    near = jnp.abs(bd) < 1.0
    em = -_expm1(-jnp.clip(bd, -1.0, 1.0))
    safe = jnp.where(jnp.abs(beta) < eps, 1.0, beta)
    quotient = jnp.where(jnp.abs(beta) < eps,
                         dtau * (1.0 - 0.5 * bd),
                         jnp.where(near, em, 1.0) / safe)
    far = (exptrm_lam - trans_u1) / jnp.where(beta == 0.0, 1.0, beta)
    return jnp.where(near, exptrm_lam * quotient, far)


def _legP_scalar(mu):
    return (1.0, mu, (3 * mu ** 2 - 1) / 2, (5 * mu ** 3 - 3 * mu) / 2)


def _pow_noint(x, fc):
    if float(fc).is_integer():   # Mosaic has no powf
        return x ** int(fc)
    return jnp.exp(float(fc) * jnp.log(jnp.abs(x)))


def _w_expansions_blk(w_form, rayleigh_on, cosb_og, ftau_cld, ftau_ray,
                      f_deltaM, controls, stream=4):
    """rt/sh.py::_w_expansions on VMEM values (as a list)."""
    w = [jnp.ones_like(cosb_og) for _ in range(stream)]
    if w_form == 1:  # OTHG
        for l in range(1, stream):
            wl = (2 * l + 1) * cosb_og ** l
            w[l] = (wl - (2 * l + 1) * f_deltaM) / (1 - f_deltaM)
    elif w_form == 0:  # TTHG
        g_forward = controls.constant_forward * cosb_og
        g_back = controls.constant_back * cosb_og
        f = controls.frac_a + controls.frac_b * _pow_noint(
            g_back, controls.frac_c)
        fdm = f_deltaM * (f * controls.constant_forward ** stream
                          + (1 - f) * controls.constant_back ** stream)
        for l in range(1, stream):
            wl = (2 * l + 1) * (f * g_forward ** l + (1 - f) * g_back ** l)
            w[l] = (wl - (2 * l + 1) * fdm) / (1 - fdm)
    if rayleigh_on == 1:
        for l in range(1, stream):
            w[l] = w[l] * ftau_cld
        if stream == 4:   # rt/sh.py:568-571 — no l=2 moment at stream 2
            w[2] = w[2] + 0.5 * ftau_ray
    return w


def _sh2_coeffs(w0, dtau, w_multi):
    """Angle-independent SH2 coefficient set (rt/sh.py::_sh2_system)."""
    a = [(2 * l + 1) - w0 * w_multi[l] for l in range(2)]
    lam = jnp.sqrt(a[0] * a[1])
    exptrm = jnp.exp(-jnp.clip(lam * dtau, 0.0, _CLIP))
    q = lam / a[1]
    Q1 = (0.5 + q) * 2 * PI
    Q2 = (0.5 - q) * 2 * PI
    # T: boundary functionals at the layer TOP, Fm at the BOTTOM; the
    # growing mode is scaled per layer so exptrm lands on column 1 of T
    # and column 0 of Fm (rt/sh.py:295-308); row order [mn, pl]
    T = ((Q1, Q2 * exptrm), (Q2, Q1 * exptrm))
    Fm = ((Q1 * exptrm, Q2), (Q2 * exptrm, Q1))
    return dict(a=a, lam=lam, q=q, exptrm=exptrm, Q1=Q1, Q2=Q2,
                T=T, Fm=Fm)


def _sh4_coeffs(w0, dtau, w_multi):
    """Angle-independent SH4 eigen/coefficient set (rt/sh.py::_sh4_system)."""
    a = [(2 * l + 1) - w0 * w_multi[l] for l in range(4)]
    beta = a[0] * a[1] + 4 * a[0] * a[3] / 9 + a[2] * a[3] / 9
    gama = a[0] * a[1] * a[2] * a[3] / 9
    root = jnp.sqrt(beta ** 2 - 4 * gama)
    lam1 = jnp.sqrt((beta + root) / 2)
    lam2 = jnp.sqrt((beta - root) / 2)
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
    # T[k][i][j]: boundary functionals at the layer TOP; Fm at the
    # BOTTOM (growing modes carry the per-layer scaling, so the e1/e2
    # factors land on column 0/2 of Fm and column 1/3 of T)
    T = ((p1mn, p1pl * exptrm1, p2mn, p2pl * exptrm2),
         (q1mn, q1pl * exptrm1, q2mn, q2pl * exptrm2),
         (p1pl, p1mn * exptrm1, p2pl, p2mn * exptrm2),
         (q1pl, q1mn * exptrm1, q2pl, q2mn * exptrm2))
    Fm = ((p1mn * exptrm1, p1pl, p2mn * exptrm2, p2pl),
          (q1mn * exptrm1, q1pl, q2mn * exptrm2, q2pl),
          (p1pl * exptrm1, p1mn, p2pl * exptrm2, p2mn),
          (q1pl * exptrm1, q1mn, q2pl * exptrm2, q2mn))
    return dict(a=a, beta=beta, gama=gama, lam1=lam1, lam2=lam2,
                exptrm1=exptrm1, exptrm2=exptrm2,
                R1=R1, R2=R2, Q1=Q1, Q2=Q2, S1=S1, S2=S2,
                T=T, Fm=Fm)


def _gj_rows(M, s, ncols):
    """Pivoted Gauss-Jordan on s x (s+ncols) rows of elementwise arrays.

    Same compare-and-swap pivoting as rt/sh.py::_gj_solve; returns the
    solution columns (list of s rows x ncols)."""
    ntot = s + ncols
    for i in range(s):
        for r in range(i + 1, s):
            swap = jnp.abs(M[r][i]) > jnp.abs(M[i][i])
            for col in range(i, ntot):
                top, bot = M[i][col], M[r][col]
                M[i][col] = jnp.where(swap, bot, top)
                M[r][col] = jnp.where(swap, top, bot)
        inv = 1.0 / M[i][i]
        for col in range(i + 1, ntot):
            M[i][col] = M[i][col] * inv
        for r in range(s):
            if r == i:
                continue
            fac = M[r][i]
            for col in range(i + 1, ntot):
                M[r][col] = M[r][col] - fac * M[i][col]
    return [row[s:] for row in M]


def _zrow(x):
    return jnp.zeros_like(x[:1])


def _stage(ref, slabs, bw):
    """Write a list of [nlayer, bw] arrays into contiguous column slabs."""
    ref[...] = jnp.concatenate(slabs, axis=1)


def _solve_sh_staged(nlayer, nr, bw, dtype, tb_s, a_s, c_s, d_s, cp_s,
                     dp_s, s=4):
    """Block-Thomas on the staged 'incoming' system, all refs; h = s//2.

    tb_s [nlayer, s*s*bw]:  B[k] entries, slab s*i+j.
    a_s  [nlayer, h*s*bw]:  A[k] top-row entries (i in 0..h-1), slab s*i+j.
    c_s  [nlayer, h*s*bw]:  C[k] bottom-row entries (i in h..s-1),
                            slab s*(i-h)+j.
    d_s  [nlayer, s*nr*bw]: D rows, slab nr*i+r.
    cp_s/dp_s: Cp/Dp outputs (same slab layouts as tb_s/d_s); dp_s is
    overwritten with the solution y by the backward pass.
    """
    h = s // 2

    def rd(ref, k, slab):
        return ref[pl.ds(k, 1), slab * bw:(slab + 1) * bw]

    def step(k, first, last):
        # assemble M = [B - A@Cp_prev | C | D - A@Dp_prev] rows
        M = []
        for i in range(h):      # top rows: A is nonzero here
            row = []
            for j in range(s):
                acc = rd(tb_s, k, s * i + j)
                if not first:
                    for kk in range(s):
                        acc = acc - (rd(a_s, k, s * i + kk)
                                     * rd(cp_s, k - 1, s * kk + j))
                row.append(acc)
            for j in range(s):  # C top rows are zero
                row.append(jnp.zeros((1, bw), dtype))
            for r in range(nr):
                acc = rd(d_s, k, nr * i + r)
                if not first:
                    for kk in range(s):
                        acc = acc - (rd(a_s, k, s * i + kk)
                                     * rd(dp_s, k - 1, nr * kk + r))
                row.append(acc)
            M.append(row)
        for i in range(h, s):   # bottom rows: A is zero here
            row = [rd(tb_s, k, s * i + j) for j in range(s)]
            if last:
                row += [jnp.zeros((1, bw), dtype)] * s
            else:
                row += [rd(c_s, k, s * (i - h) + j) for j in range(s)]
            row += [rd(d_s, k, nr * i + r) for r in range(nr)]
            M.append(row)
        sol = _gj_rows(M, s, s + nr)
        cp_s[pl.ds(k, 1), :] = jnp.concatenate(
            [sol[i][j] for i in range(s) for j in range(s)], 1)
        dp_s[pl.ds(k, 1), :] = jnp.concatenate(
            [sol[i][s + r] for i in range(s) for r in range(nr)], 1)

    step(0, True, False)

    def fwd(k, _):
        step(k, False, False)
        return 0

    jax.lax.fori_loop(1, nlayer - 1, fwd, 0)
    step(nlayer - 1, False, True)

    def back(t, _):
        k = nlayer - 2 - t
        ys = []
        for i in range(s):
            for r in range(nr):
                acc = rd(dp_s, k, nr * i + r)
                for j in range(s):
                    acc = acc - (rd(cp_s, k, s * i + j)
                                 * rd(dp_s, k + 1, nr * j + r))
                ys.append(acc)
        dp_s[pl.ds(k, 1), :] = jnp.concatenate(ys, 1)
        return 0

    jax.lax.fori_loop(0, nlayer - 1, back, 0)


def _stage_system(c, z_down, z_up, btv, bsv, surf_reflect, nr, bw,
                  tb_s, a_s, c_s, d_s, s=4):
    """Vectorized staging of the incoming-grouping block rows; h = s//2.

    z_down/z_up: [nr][s rows][nlayer, bw] source values; btv/bsv:
    [h rows][nr][1, bw] boundary rows (top-BC rows sit at rows 0..h-1 of
    block-row 0, bottom-BC rows at rows h..s-1 of block-row n-1).
    """
    h = s // 2
    T, Fm = c['T'], c['Fm']
    # B rows: top i<h: +T[0] then -T[k>=1]; bottom i>=h: Fm (last row
    # gets the surf_reflect correction)
    slabs = []
    for i in range(h):
        for j in range(s):
            x = T[i][j]
            slabs.append(jnp.concatenate([x[:1], -x[1:]], 0))
    for i in range(h, s):
        for j in range(s):
            x = Fm[i][j]
            slabs.append(jnp.concatenate(
                [x[:-1], x[-1:] - surf_reflect * Fm[i - h][j][-1:]], 0))
    _stage(tb_s, slabs, bw)

    # A top rows: Fm[k-1, :h] (zero at k=0)
    slabs = []
    for i in range(h):
        for j in range(s):
            x = Fm[i][j]
            slabs.append(jnp.concatenate([_zrow(x), x[:-1]], 0))
    _stage(a_s, slabs, bw)

    # C bottom rows: -T[k+1, h:] (zero at k=n-1)
    slabs = []
    for i in range(h, s):
        for j in range(s):
            x = T[i][j]
            slabs.append(jnp.concatenate([-x[1:], _zrow(x)], 0))
    _stage(c_s, slabs, bw)

    # D rows
    slabs = [None] * (s * nr)
    for r in range(nr):
        zd, zu = z_down[r], z_up[r]
        for i in range(h):
            slabs[nr * i + r] = jnp.concatenate(
                [btv[i][r] - zd[i][:1], zd[i][1:] - zu[i][:-1]], 0)
        for i in range(h, s):
            slabs[nr * i + r] = jnp.concatenate(
                [zd[i][1:] - zu[i][:-1],
                 bsv[i - h][r] - zu[i][-1:]
                 + surf_reflect[-1:] * zu[i - h][-1:]], 0)
    _stage(d_s, slabs, bw)


def _eta_sources(c, u0, w0, w_single, F0PI):
    """Beam particular solution for one angle (rt/sh.py::_sh4_system)."""
    a = c['a']
    u0b = _dither_u0(c['lam2'], _dither_u0(c['lam1'], u0))
    u0i = 1.0 / u0b
    Del = 9 * (u0i ** 4 - c['beta'] * u0i ** 2 + c['gama'])
    Pu0 = _legP_scalar(-u0)
    b = [(F0PI * (w0 * w_single[l])) * Pu0[l] / (4 * PI) for l in range(4)]
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
    eta = [Dels0 / Del, Dels1 / Del, Dels2 / Del, Dels3 / Del]
    # z rows in [z1mn, z2mn, z1pl, z2pl] order (rt/sh.py z1pl/z1mn/...)
    z = [(eta[0] / 2 - eta[1] + 5 * eta[2] / 8) * 2 * PI,
         (-eta[0] / 8 + 5 * eta[2] / 8 - eta[3]) * 2 * PI,
         (eta[0] / 2 + eta[1] + 5 * eta[2] / 8) * 2 * PI,
         (-eta[0] / 8 + 5 * eta[2] / 8 + eta[3]) * 2 * PI]
    return eta, z, u0b


def _sh4_reflected_core(u0_ref, u1_ref, ct, dtau, tau, w0, cosb_og, w0_og,
                        dtau_og, tau_og, ftau_cld, ftau_ray, f_deltaM,
                        surf_reflect, F0PI, out_ref, scr, *, controls,
                        nang, b_top, w_single_form, w_multi_form,
                        psingle_form, w_single_rayleigh, w_multi_rayleigh,
                        psingle_rayleigh, single_form):
    nlayer, bw = dtau.shape
    nr = nang
    dtype = dtau.dtype
    (tb_s, a_s, c_s, d_s, cp_s, dp_s) = scr

    w_single = _w_expansions_blk(w_single_form, w_single_rayleigh,
                                 cosb_og, ftau_cld, ftau_ray, f_deltaM,
                                 controls)
    w_multi = _w_expansions_blk(w_multi_form, w_multi_rayleigh,
                                cosb_og, ftau_cld, ftau_ray, f_deltaM,
                                controls)
    c = _sh4_coeffs(w0, dtau, w_multi)

    # per-angle beam sources (values; staged into d_s by _stage_system)
    z_down, z_up, bsurf = [], [], []
    bt_row = jnp.full((1, bw), b_top, dtype)
    for ia in range(nang):
        u0 = u0_ref[ia]
        _, z, u0b = _eta_sources(c, u0, w0, w_single, F0PI)
        ex_dn = jnp.exp(-_clip(tau[:-1] / u0b))
        ex_up = jnp.exp(-_clip(tau[1:] / u0b))
        z_down.append([zj * ex_dn for zj in z])
        z_up.append([zj * ex_up for zj in z])
        bsurf.append(surf_reflect[-1:] * u0 * F0PI
                     * jnp.exp(-_clip(tau[-1:] / u0)))
    btv = [[bt_row] * nr, [-bt_row / 4.0] * nr]
    bsv = [bsurf, [-bs / 4.0 for bs in bsurf]]

    _stage_system(c, z_down, z_up, btv, bsv, surf_reflect, nr, bw,
                  tb_s, a_s, c_s, d_s)
    _solve_sh_staged(nlayer, nr, bw, dtype, tb_s, a_s, c_s, d_s,
                     cp_s, dp_s)

    # ---- intensity per angle; sweep scratch reuses a_s (dead) ----
    lam1, lam2 = c['lam1'], c['lam2']
    R1, R2, Q1, Q2, S1, S2 = (c['R1'], c['R2'], c['Q1'], c['Q2'],
                              c['S1'], c['S2'])
    one = jnp.ones_like(R1)
    A4 = ((one, one, one, one),
          (R1, -R1, R2, -R2),
          (Q1, Q1, Q2, Q2),
          (S1, -S1, S2, -S2))
    Fm = c['Fm']
    for ia in range(nang):
        u0 = u0_ref[ia]
        u1 = u1_ref[ia]
        eta, _, u0b = _eta_sources(c, u0, w0, w_single, F0PI)
        Pu0 = _legP_scalar(-u0)
        Pu1 = _legP_scalar(u1)

        Xm = [dp_s[:, (nr * m + ia) * bw:(nr * m + ia + 1) * bw]
              for m in range(4)]
        flux_bot = (Fm[2][0][-1:] * Xm[0][-1:] + Fm[2][1][-1:] * Xm[1][-1:]
                    + Fm[2][2][-1:] * Xm[2][-1:]
                    + Fm[2][3][-1:] * Xm[3][-1:] + z_up[ia][2][-1:])

        mus = (u1 + u0b) / (u1 * u0b)
        exptrm_mus = -_expm1(-_clip(mus * dtau)) / mus
        expon1 = exptrm_mus * jnp.exp(-_clip(tau[:-1] / u0b))
        trans_u1 = jnp.exp(-_clip(dtau / u1))
        alpha1, alpha2 = 1 / u1 + lam1, 1 / u1 + lam2
        beta1, beta2 = 1 / u1 - lam1, 1 / u1 - lam2
        e = [-_expm1(-_clip(alpha1 * dtau)) / alpha1 * Xm[0],
             _scaled_bet(c['exptrm1'], trans_u1, beta1, dtau) * Xm[1],
             -_expm1(-_clip(alpha2 * dtau)) / alpha2 * Xm[2],
             _scaled_bet(c['exptrm2'], trans_u1, beta2, dtau) * Xm[3]]
        multi_scat = None
        for mode in range(4):
            coeff = None
            for j in range(4):
                term = w_multi[j] * Pu1[j] * A4[j][mode]
                coeff = term if coeff is None else coeff + term
            t = coeff * e[mode]
            multi_scat = t if multi_scat is None else multi_scat + t
        for j in range(4):
            multi_scat = multi_scat + w_multi[j] * Pu1[j] * eta[j] * expon1

        p_single = jnp.zeros_like(cosb_og)
        if single_form == 0:
            if psingle_form == 1:  # OTHG
                p_single = (1 - cosb_og ** 2) / (jnp.sqrt(
                    1 + cosb_og ** 2 + 2 * cosb_og * ct) ** 3)
            elif psingle_form == 0:  # TTHG
                g_forward = controls.constant_forward * cosb_og
                g_back = controls.constant_back * cosb_og
                f = controls.frac_a + controls.frac_b * _pow_noint(
                    g_back, controls.frac_c)
                p_single = (f * (1 - g_forward ** 2)
                            / jnp.sqrt((1 + g_forward ** 2
                                        + 2 * g_forward * ct) ** 3)
                            + (1 - f) * (1 - g_back ** 2)
                            / jnp.sqrt((1 + g_back ** 2
                                        + 2 * g_back * ct) ** 3))
            if psingle_rayleigh == 1:
                p_single = (ftau_cld * p_single
                            + ftau_ray * (0.75 * (1 + ct * ct)))
        else:  # legendre form
            for l in range(4):
                p_single = p_single + w_single[l] * Pu0[l] * Pu1[l]

        em_mus1 = -_expm1(-_clip(mus * dtau_og))
        intgrl = (w0 * multi_scat
                  + w0_og * F0PI / (4 * PI) * p_single
                  * em_mus1 * jnp.exp(-_clip(tau_og[:-1] / u0)) / mus)

        # sweep scratch (both dead after the elimination): transmission
        # in a_s slab 0, source in c_s slab 0 — the per-angle sweeps are
        # sequential, so one slab serves every angle (nang unbounded)
        a_s[:, 0:bw] = trans_u1
        c_s[:, 0:bw] = intgrl / u1

        def ascend(i, x_below):
            k = pl.ds(nlayer - 1 - i, 1)
            return x_below * a_s[k, 0:bw] + c_s[k, 0:bw]

        xint_top = jax.lax.fori_loop(0, nlayer, ascend, flux_bot / PI)
        out_ref[ia:ia + 1, :] = xint_top


def _sh4_reflected_kernel(u0_ref, u1_ref, ct_ref, taugas_ref, tauray_ref,
                          copd_ref, cw0_ref, cg0_ref, rf_ref, sr_ref,
                          f0pi_ref, out_ref, *scr, controls, nang, b_top,
                          delta_eddington, w_single_form, w_multi_form,
                          psingle_form, w_single_rayleigh,
                          w_multi_rayleigh, psingle_rayleigh, single_form):
    (dtau, tau, w0, cosb, gcos2, ftau_cld, ftau_ray, dtau_og, tau_og,
     w0_og, cosb_og) = _optics_block(
        taugas_ref[...], tauray_ref[...], copd_ref[...], cw0_ref[...],
        cg0_ref[...], rf_ref[...], 4, delta_eddington)
    f_deltaM = (cosb_og ** 4 if delta_eddington
                else jnp.zeros_like(cosb_og))
    _sh4_reflected_core(
        u0_ref, u1_ref, ct_ref[0], dtau, tau, w0, cosb_og, w0_og, dtau_og,
        tau_og, ftau_cld, ftau_ray, f_deltaM, sr_ref[...], f0pi_ref[...],
        out_ref, scr, controls=controls, nang=nang, b_top=b_top,
        w_single_form=w_single_form, w_multi_form=w_multi_form,
        psingle_form=psingle_form, w_single_rayleigh=w_single_rayleigh,
        w_multi_rayleigh=w_multi_rayleigh,
        psingle_rayleigh=psingle_rayleigh, single_form=single_form)


@partial(jax.jit, static_argnames=('controls', 'b_top', 'delta_eddington',
                                   'w_single_form', 'w_multi_form',
                                   'psingle_form', 'w_single_rayleigh',
                                   'w_multi_rayleigh', 'psingle_rayleigh',
                                   'single_form', 'block_w', 'interpret'))
def reflected_sh4_pallas(taugas, tauray, cld_opd, cld_w0, cld_g0, rf,
                         surf_reflect, ubar0, ubar1, cos_theta, F0PI,
                         controls: ScatteringControls =
                         ScatteringControls(),
                         b_top: float = 0.0, delta_eddington: bool = True,
                         w_single_form: int = 0, w_multi_form: int = 0,
                         psingle_form: int = 0, w_single_rayleigh: int = 1,
                         w_multi_rayleigh: int = 1,
                         psingle_rayleigh: int = 1, single_form: int = 0,
                         block_w: int = 256, interpret: bool = False):
    """SH 4-stream reflected TOA intensity [ng, nt, nwno] — Pallas path.

    Fused-optics contract of reflected_pallas_fused: reads the 6
    per-source strips and builds optics + the SH system in VMEM.  Same
    physics as rt/sh.py::reflected_sh at precision='f32' (the incoming
    grouping IS this kernel's elimination order).
    """
    ng, nt = ubar0.shape
    nang = ng * nt
    nlayer, nwno = taugas.shape
    nblocks = -(-nwno // block_w)

    u0 = ubar0.reshape(-1).astype(taugas.dtype)
    u1 = ubar1.reshape(-1).astype(taugas.dtype)
    ct = jnp.asarray(cos_theta, taugas.dtype).reshape(1)

    layer_spec = pl.BlockSpec((nlayer, block_w), lambda i: (0, i))
    row_spec = pl.BlockSpec((1, block_w), lambda i: (0, i))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((nlayer, 16 * block_w), taugas.dtype),   # tb
               pltpu.VMEM((nlayer, 8 * block_w), taugas.dtype),    # a
               pltpu.VMEM((nlayer, 8 * block_w), taugas.dtype),    # c
               pltpu.VMEM((nlayer, 4 * nang * block_w), taugas.dtype),
               pltpu.VMEM((nlayer, 16 * block_w), taugas.dtype),   # cp
               pltpu.VMEM((nlayer, 4 * nang * block_w), taugas.dtype)]

    kernel = partial(_sh4_reflected_kernel, controls=controls, nang=nang,
                     b_top=float(b_top),
                     delta_eddington=bool(delta_eddington),
                     w_single_form=int(w_single_form),
                     w_multi_form=int(w_multi_form),
                     psingle_form=int(psingle_form),
                     w_single_rayleigh=int(w_single_rayleigh),
                     w_multi_rayleigh=int(w_multi_rayleigh),
                     psingle_rayleigh=int(psingle_rayleigh),
                     single_form=int(single_form))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[smem_spec, smem_spec, smem_spec, layer_spec, layer_spec,
                  layer_spec, layer_spec, layer_spec, layer_spec,
                  row_spec, row_spec],
        out_specs=pl.BlockSpec((nang, block_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nang, nwno), taugas.dtype),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(u0, u1, ct, taugas, tauray, cld_opd, cld_w0, cld_g0, rf,
      surf_reflect[None, :], F0PI[None, :])
    return out.reshape(ng, nt, nwno)


# ---------------------------------------------------------------------------
# thermal
# ---------------------------------------------------------------------------

def _sh4_thermal_core(u1_ref, all_b, dtau, w0, cosb_og, tau_top,
                      surf_reflect, out_ref, scr, *, nang, hard_surface,
                      delta_eddington):
    nlayer, bw = dtau.shape
    dtype = dtau.dtype
    (tb_s, a_s, c_s, d_s, cp_s, dp_s) = scr
    mu1 = 0.5

    b0 = all_b[:-1]
    b1 = (all_b[1:] - b0) / dtau

    # delta-corrected fraction (fluxes.py:3072-3075): zero when no
    # delta-Eddington scaling was applied (cosb == cosb_og statically)
    ff = cosb_og ** 4 if delta_eddington else jnp.zeros_like(cosb_og)
    w_multi = [(2 * l + 1) * (cosb_og ** l - ff) / (1 - ff)
               for l in range(4)]
    c = _sh4_coeffs(w0, dtau, w_multi)
    a = c['a']

    b_top = PI * (1.0 - jnp.exp(-tau_top / mu1)) * all_b[:1]
    if hard_surface:
        b_surface = PI * all_b[-1:]
    else:
        b_surface = PI * (all_b[-1:] + b1[-1:] * mu1)
    b_surface_sh4 = -PI * all_b[-1:] / 4

    # thermal sources (rt/sh.py::_sh4_system calculation=1), in
    # [z1mn, z2mn, z1pl, z2pl] order
    pref = (1 - w0) / a[0] * 2 * PI
    pref2 = -0.5 * (1 - w0) / (4 * a[0]) * 2 * PI
    z_down = [[pref * (b0 / 2 - b1 / a[1]),
               pref2 * b0,
               pref * (b0 / 2 + b1 / a[1]),
               pref2 * b0]]
    z_up = [[pref * (b0 / 2 - b1 / a[1] + b1 * dtau / 2),
             pref2 * (b0 + b1 * dtau),
             pref * (b0 / 2 + b1 / a[1] + b1 * dtau / 2),
             pref2 * (b0 + b1 * dtau)]]
    btv = [[b_top], [-b_top / 4.0]]
    bsv = [[b_surface], [b_surface_sh4]]

    _stage_system(c, z_down, z_up, btv, bsv, surf_reflect, 1, bw,
                  tb_s, a_s, c_s, d_s)
    _solve_sh_staged(nlayer, 1, bw, dtype, tb_s, a_s, c_s, d_s,
                     cp_s, dp_s)

    Xm = [dp_s[:, m * bw:(m + 1) * bw] for m in range(4)]
    lam1, lam2 = c['lam1'], c['lam2']
    R1, R2, Q1, Q2, S1, S2 = (c['R1'], c['R2'], c['Q1'], c['Q2'],
                              c['S1'], c['S2'])
    one = jnp.ones_like(R1)
    A4 = ((one, one, one, one),
          (R1, -R1, R2, -R2),
          (Q1, Q1, Q2, Q2),
          (S1, -S1, S2, -S2))

    for ia in range(nang):
        u1 = u1_ref[ia]
        Pu1 = _legP_scalar(u1)
        em = -_expm1(-_clip(dtau / u1))
        expdtau = 1.0 - em
        alpha1, alpha2 = 1 / u1 + lam1, 1 / u1 + lam2
        beta1, beta2 = 1 / u1 - lam1, 1 / u1 - lam2
        e = [-_expm1(-_clip(alpha1 * dtau)) / alpha1 * Xm[0],
             _scaled_bet(c['exptrm1'], expdtau, beta1, dtau) * Xm[1],
             -_expm1(-_clip(alpha2 * dtau)) / alpha2 * Xm[2],
             _scaled_bet(c['exptrm2'], expdtau, beta2, dtau) * Xm[3]]
        multi_scat = None
        for mode in range(4):
            coeff = None
            for j in range(4):
                term = w_multi[j] * Pu1[j] * A4[j][mode]
                coeff = term if coeff is None else coeff + term
            t = coeff * e[mode]
            multi_scat = t if multi_scat is None else multi_scat + t
        planck_int = (b0 * em + b1 * (u1 - (dtau + u1) * expdtau))
        Nint0 = w_multi[0] * ((1 - w0) * u1 / a[0] * planck_int)
        Nint1 = w_multi[1] * u1 * ((1 - w0) * u1 / a[0]
                                   * (b1 * em / a[1]))
        multi_scat = multi_scat + Nint0 + Nint1

        intgrl = (w0 * multi_scat * 2 * PI
                  + 2 * PI * (1 - w0) * u1 * planck_int)

        if hard_surface:
            xint_bottom = all_b[-1:] * 2 * PI
        else:
            xint_bottom = (all_b[-1:] + b1[-1:] * u1) * 2 * PI

        # sweep scratch (dead after the elimination): transmission in
        # a_s slab 0, source in c_s slab 0 — the per-angle sweeps are
        # sequential, so one slab serves every angle (nang unbounded)
        a_s[:, 0:bw] = expdtau
        c_s[:, 0:bw] = intgrl / u1

        def ascend(i, x_below):
            k = pl.ds(nlayer - 1 - i, 1)
            return x_below * a_s[k, 0:bw] + c_s[k, 0:bw]

        xint_top = jax.lax.fori_loop(0, nlayer, ascend, xint_bottom)
        out_ref[ia:ia + 1, :] = xint_top


def _sh4_thermal_kernel(u1_ref, allb_ref, taugas_ref, tauray_ref,
                        copd_ref, cw0_ref, cg0_ref, rf_ref, ptfac_ref,
                        sr_ref, out_ref, *scr, nang, hard_surface,
                        delta_eddington):
    (dtau, tau, w0, cosb, gcos2, ftau_cld, ftau_ray, dtau_og, tau_og,
     w0_og, cosb_og) = _optics_block(
        taugas_ref[...], tauray_ref[...], copd_ref[...], cw0_ref[...],
        cg0_ref[...], rf_ref[...], 4, delta_eddington)
    tau_top = dtau[:1] * ptfac_ref[...]
    _sh4_thermal_core(u1_ref, allb_ref[...], dtau, w0, cosb_og, tau_top,
                      sr_ref[...], out_ref, scr, nang=nang,
                      hard_surface=hard_surface,
                      delta_eddington=delta_eddington)


@partial(jax.jit, static_argnames=('hard_surface', 'delta_eddington',
                                   'block_w', 'interpret'))
def thermal_sh4_pallas(all_b, taugas, tauray, cld_opd, cld_w0, cld_g0, rf,
                       ptfac, surf_reflect, ubar1,
                       hard_surface: bool = False,
                       delta_eddington: bool = True,
                       block_w: int = 256, interpret: bool = False):
    """SH 4-stream thermal TOA flux [ng, nt, nwno] — Pallas path.

    ``all_b`` is the level Planck function (caller-computed, like
    thermal_pallas); optics fused in-kernel from the per-source strips.
    NOTE the thermal SH solve uses the DELTA-SCALED fields (dtau/w0 with
    delta-Eddington applied), matching rt/sh.py::thermal_sh's use of
    props.dtau/props.w0 — unlike the Toon thermal which uses OG fields.
    """
    ng, nt = ubar1.shape
    nang = ng * nt
    nlayer, nwno = taugas.shape
    nblocks = -(-nwno // block_w)

    u1 = ubar1.reshape(-1).astype(taugas.dtype)
    pt = jnp.broadcast_to(jnp.asarray(ptfac, taugas.dtype), (1, nwno))
    layer_spec = pl.BlockSpec((nlayer, block_w), lambda i: (0, i))
    level_spec = pl.BlockSpec((nlayer + 1, block_w), lambda i: (0, i))
    row_spec = pl.BlockSpec((1, block_w), lambda i: (0, i))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((nlayer, 16 * block_w), taugas.dtype),   # tb
               pltpu.VMEM((nlayer, 8 * block_w), taugas.dtype),    # a
               pltpu.VMEM((nlayer, 8 * block_w), taugas.dtype),    # c
               pltpu.VMEM((nlayer, 4 * block_w), taugas.dtype),    # d
               pltpu.VMEM((nlayer, 16 * block_w), taugas.dtype),   # cp
               pltpu.VMEM((nlayer, 4 * block_w), taugas.dtype)]    # dp

    kernel = partial(_sh4_thermal_kernel, nang=nang,
                     hard_surface=bool(hard_surface),
                     delta_eddington=bool(delta_eddington))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[smem_spec, level_spec, layer_spec, layer_spec,
                  layer_spec, layer_spec, layer_spec, layer_spec,
                  row_spec, row_spec],
        out_specs=pl.BlockSpec((nang, block_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nang, nwno), taugas.dtype),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(u1, all_b, taugas, tauray, cld_opd, cld_w0, cld_g0, rf, pt,
      surf_reflect[None, :])
    return out.reshape(ng, nt, nwno)


# ---------------------------------------------------------------------------
# 2-stream variants (rt/sh.py::_sh2_system / fluxes.py:3189-3333)
# ---------------------------------------------------------------------------

def _eta2_sources(c, u0, w0, w_single, F0PI):
    """Beam particular solution for one angle (rt/sh.py::_sh2_system).

    Returns eta/z rows in the [mn, pl] order of the stream-2 stack."""
    a = c['a']
    u0b = _dither_u0(c['lam'], u0)
    Del = (1.0 / u0b) ** 2 - a[0] * a[1]
    Pu0 = _legP_scalar(-u0)
    b = [(F0PI * (w0 * w_single[l])) * Pu0[l] / (4 * PI) for l in range(2)]
    eta = [(b[1] / u0b - a[1] * b[0]) / Del,
           (b[0] / u0b - a[0] * b[1]) / Del]
    z = [(0.5 * eta[0] - eta[1]) * 2 * PI,
         (0.5 * eta[0] + eta[1]) * 2 * PI]
    return eta, z, u0b


def _sh2_reflected_core(u0_ref, u1_ref, ct, dtau, tau, w0, cosb_og, w0_og,
                        dtau_og, tau_og, ftau_cld, ftau_ray, f_deltaM,
                        surf_reflect, F0PI, out_ref, scr, *, controls,
                        nang, b_top, w_single_form, w_multi_form,
                        psingle_form, w_single_rayleigh, w_multi_rayleigh,
                        psingle_rayleigh, single_form):
    nlayer, bw = dtau.shape
    nr = nang
    dtype = dtau.dtype
    (tb_s, a_s, c_s, d_s, cp_s, dp_s) = scr

    w_single = _w_expansions_blk(w_single_form, w_single_rayleigh,
                                 cosb_og, ftau_cld, ftau_ray, f_deltaM,
                                 controls, stream=2)
    w_multi = _w_expansions_blk(w_multi_form, w_multi_rayleigh,
                                cosb_og, ftau_cld, ftau_ray, f_deltaM,
                                controls, stream=2)
    c = _sh2_coeffs(w0, dtau, w_multi)

    # per-angle beam sources (values; staged into d_s by _stage_system)
    z_down, z_up, bsurf = [], [], []
    bt_row = jnp.full((1, bw), b_top, dtype)
    for ia in range(nang):
        u0 = u0_ref[ia]
        _, z, u0b = _eta2_sources(c, u0, w0, w_single, F0PI)
        ex_dn = jnp.exp(-_clip(tau[:-1] / u0b))
        ex_up = jnp.exp(-_clip(tau[1:] / u0b))
        z_down.append([zj * ex_dn for zj in z])
        z_up.append([zj * ex_up for zj in z])
        bsurf.append(surf_reflect[-1:] * u0 * F0PI
                     * jnp.exp(-_clip(tau[-1:] / u0)))
    btv = [[bt_row] * nr]
    bsv = [bsurf]

    _stage_system(c, z_down, z_up, btv, bsv, surf_reflect, nr, bw,
                  tb_s, a_s, c_s, d_s, s=2)
    _solve_sh_staged(nlayer, nr, bw, dtype, tb_s, a_s, c_s, d_s,
                     cp_s, dp_s, s=2)

    # ---- intensity per angle; sweep scratch reuses a_s (dead) ----
    lam, q = c['lam'], c['q']
    Fm = c['Fm']
    for ia in range(nang):
        u0 = u0_ref[ia]
        u1 = u1_ref[ia]
        eta, _, u0b = _eta2_sources(c, u0, w0, w_single, F0PI)
        Pu0 = _legP_scalar(-u0)
        Pu1 = _legP_scalar(u1)

        Xm = [dp_s[:, (nr * m + ia) * bw:(nr * m + ia + 1) * bw]
              for m in range(2)]
        # flux at bottom (rt/sh.py:725-728): pl row of Fm at layer n-1
        flux_bot = (Fm[1][0][-1:] * Xm[0][-1:] + Fm[1][1][-1:] * Xm[1][-1:]
                    + z_up[ia][1][-1:])

        mus = (u1 + u0b) / (u1 * u0b)
        exptrm_mus = -_expm1(-_clip(mus * dtau)) / mus
        expon1 = exptrm_mus * jnp.exp(-_clip(tau[:-1] / u0b))
        trans_u1 = jnp.exp(-_clip(dtau / u1))
        alpha, beta_ = 1 / u1 + lam, 1 / u1 - lam
        exptrm_alp = -_expm1(-_clip(alpha * dtau)) / alpha
        exptrm_bet = _scaled_bet(c['exptrm'], trans_u1, beta_, dtau)
        multi_scat = (
            Xm[0] * (w_multi[0] - w_multi[1] * Pu1[1] * q) * exptrm_alp
            + Xm[1] * (w_multi[0] + w_multi[1] * Pu1[1] * q) * exptrm_bet
            + w_multi[0] * (eta[0] * expon1)
            + w_multi[1] * Pu1[1] * (eta[1] * expon1))

        p_single = jnp.zeros_like(cosb_og)
        if single_form == 0:
            if psingle_form == 1:  # OTHG
                p_single = (1 - cosb_og ** 2) / (jnp.sqrt(
                    1 + cosb_og ** 2 + 2 * cosb_og * ct) ** 3)
            elif psingle_form == 0:  # TTHG
                g_forward = controls.constant_forward * cosb_og
                g_back = controls.constant_back * cosb_og
                f = controls.frac_a + controls.frac_b * _pow_noint(
                    g_back, controls.frac_c)
                p_single = (f * (1 - g_forward ** 2)
                            / jnp.sqrt((1 + g_forward ** 2
                                        + 2 * g_forward * ct) ** 3)
                            + (1 - f) * (1 - g_back ** 2)
                            / jnp.sqrt((1 + g_back ** 2
                                        + 2 * g_back * ct) ** 3))
            if psingle_rayleigh == 1:
                p_single = (ftau_cld * p_single
                            + ftau_ray * (0.75 * (1 + ct * ct)))
        else:  # legendre form
            for l in range(2):
                p_single = p_single + w_single[l] * Pu0[l] * Pu1[l]

        em_mus1 = -_expm1(-_clip(mus * dtau_og))
        intgrl = (w0 * multi_scat
                  + w0_og * F0PI / (4 * PI) * p_single
                  * em_mus1 * jnp.exp(-_clip(tau_og[:-1] / u0)) / mus)

        # sweep scratch (both dead after the elimination): transmission
        # in a_s slab 0, source in c_s slab 0 — the per-angle sweeps are
        # sequential, so one slab serves every angle (nang unbounded)
        a_s[:, 0:bw] = trans_u1
        c_s[:, 0:bw] = intgrl / u1

        def ascend(i, x_below):
            k = pl.ds(nlayer - 1 - i, 1)
            return x_below * a_s[k, 0:bw] + c_s[k, 0:bw]

        xint_top = jax.lax.fori_loop(0, nlayer, ascend, flux_bot / PI)
        out_ref[ia:ia + 1, :] = xint_top


def _sh2_reflected_kernel(u0_ref, u1_ref, ct_ref, taugas_ref, tauray_ref,
                          copd_ref, cw0_ref, cg0_ref, rf_ref, sr_ref,
                          f0pi_ref, out_ref, *scr, controls, nang, b_top,
                          delta_eddington, w_single_form, w_multi_form,
                          psingle_form, w_single_rayleigh,
                          w_multi_rayleigh, psingle_rayleigh, single_form):
    (dtau, tau, w0, cosb, gcos2, ftau_cld, ftau_ray, dtau_og, tau_og,
     w0_og, cosb_og) = _optics_block(
        taugas_ref[...], tauray_ref[...], copd_ref[...], cw0_ref[...],
        cg0_ref[...], rf_ref[...], 2, delta_eddington)
    f_deltaM = (cosb_og ** 2 if delta_eddington
                else jnp.zeros_like(cosb_og))
    _sh2_reflected_core(
        u0_ref, u1_ref, ct_ref[0], dtau, tau, w0, cosb_og, w0_og, dtau_og,
        tau_og, ftau_cld, ftau_ray, f_deltaM, sr_ref[...], f0pi_ref[...],
        out_ref, scr, controls=controls, nang=nang, b_top=b_top,
        w_single_form=w_single_form, w_multi_form=w_multi_form,
        psingle_form=psingle_form, w_single_rayleigh=w_single_rayleigh,
        w_multi_rayleigh=w_multi_rayleigh,
        psingle_rayleigh=psingle_rayleigh, single_form=single_form)


@partial(jax.jit, static_argnames=('controls', 'b_top', 'delta_eddington',
                                   'w_single_form', 'w_multi_form',
                                   'psingle_form', 'w_single_rayleigh',
                                   'w_multi_rayleigh', 'psingle_rayleigh',
                                   'single_form', 'block_w', 'interpret'))
def reflected_sh2_pallas(taugas, tauray, cld_opd, cld_w0, cld_g0, rf,
                         surf_reflect, ubar0, ubar1, cos_theta, F0PI,
                         controls: ScatteringControls =
                         ScatteringControls(),
                         b_top: float = 0.0, delta_eddington: bool = True,
                         w_single_form: int = 0, w_multi_form: int = 0,
                         psingle_form: int = 0, w_single_rayleigh: int = 1,
                         w_multi_rayleigh: int = 1,
                         psingle_rayleigh: int = 1, single_form: int = 0,
                         block_w: int = 512, interpret: bool = False):
    """SH 2-stream reflected TOA intensity [ng, nt, nwno] — Pallas path.

    Same contract as reflected_sh4_pallas with s = 2 (half the modes,
    quarter the system slabs, so the default wavelength block is 2x
    wider).  Physics matches rt/sh.py::reflected_sh at stream=2,
    precision='f32' (the incoming grouping IS this kernel's elimination
    order).
    """
    ng, nt = ubar0.shape
    nang = ng * nt
    nlayer, nwno = taugas.shape
    nblocks = -(-nwno // block_w)

    u0 = ubar0.reshape(-1).astype(taugas.dtype)
    u1 = ubar1.reshape(-1).astype(taugas.dtype)
    ct = jnp.asarray(cos_theta, taugas.dtype).reshape(1)

    layer_spec = pl.BlockSpec((nlayer, block_w), lambda i: (0, i))
    row_spec = pl.BlockSpec((1, block_w), lambda i: (0, i))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((nlayer, 4 * block_w), taugas.dtype),    # tb
               pltpu.VMEM((nlayer, 2 * block_w), taugas.dtype),    # a
               pltpu.VMEM((nlayer, 2 * block_w), taugas.dtype),    # c
               pltpu.VMEM((nlayer, 2 * nang * block_w), taugas.dtype),
               pltpu.VMEM((nlayer, 4 * block_w), taugas.dtype),    # cp
               pltpu.VMEM((nlayer, 2 * nang * block_w), taugas.dtype)]

    kernel = partial(_sh2_reflected_kernel, controls=controls, nang=nang,
                     b_top=float(b_top),
                     delta_eddington=bool(delta_eddington),
                     w_single_form=int(w_single_form),
                     w_multi_form=int(w_multi_form),
                     psingle_form=int(psingle_form),
                     w_single_rayleigh=int(w_single_rayleigh),
                     w_multi_rayleigh=int(w_multi_rayleigh),
                     psingle_rayleigh=int(psingle_rayleigh),
                     single_form=int(single_form))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[smem_spec, smem_spec, smem_spec, layer_spec, layer_spec,
                  layer_spec, layer_spec, layer_spec, layer_spec,
                  row_spec, row_spec],
        out_specs=pl.BlockSpec((nang, block_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nang, nwno), taugas.dtype),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(u0, u1, ct, taugas, tauray, cld_opd, cld_w0, cld_g0, rf,
      surf_reflect[None, :], F0PI[None, :])
    return out.reshape(ng, nt, nwno)


def _sh2_thermal_core(u1_ref, all_b, dtau, w0, cosb_og, tau_top,
                      surf_reflect, out_ref, scr, *, nang, hard_surface,
                      delta_eddington):
    nlayer, bw = dtau.shape
    dtype = dtau.dtype
    (tb_s, a_s, c_s, d_s, cp_s, dp_s) = scr
    mu1 = 0.5

    b0 = all_b[:-1]
    b1 = (all_b[1:] - b0) / dtau

    # delta-corrected fraction (fluxes.py:3072-3075): zero when no
    # delta-Eddington scaling was applied (cosb == cosb_og statically)
    ff = cosb_og ** 2 if delta_eddington else jnp.zeros_like(cosb_og)
    w_multi = [(2 * l + 1) * (cosb_og ** l - ff) / (1 - ff)
               for l in range(2)]
    c = _sh2_coeffs(w0, dtau, w_multi)
    a = c['a']

    b_top = PI * (1.0 - jnp.exp(-tau_top / mu1)) * all_b[:1]
    if hard_surface:
        b_surface = PI * all_b[-1:]
    else:
        b_surface = PI * (all_b[-1:] + b1[-1:] * mu1)

    # thermal sources (rt/sh.py::_sh2_system calculation=1), [mn, pl]
    pref = (1 - w0) / a[0] * 2 * PI
    z_down = [[pref * (b0 / 2 - b1 / a[1]),
               pref * (b0 / 2 + b1 / a[1])]]
    z_up = [[pref * (b0 / 2 - b1 / a[1] + b1 * dtau / 2),
             pref * (b0 / 2 + b1 / a[1] + b1 * dtau / 2)]]
    btv = [[b_top]]
    bsv = [[b_surface]]

    _stage_system(c, z_down, z_up, btv, bsv, surf_reflect, 1, bw,
                  tb_s, a_s, c_s, d_s, s=2)
    _solve_sh_staged(nlayer, 1, bw, dtype, tb_s, a_s, c_s, d_s,
                     cp_s, dp_s, s=2)

    Xm = [dp_s[:, m * bw:(m + 1) * bw] for m in range(2)]
    lam, q = c['lam'], c['q']

    for ia in range(nang):
        u1 = u1_ref[ia]
        em = -_expm1(-_clip(dtau / u1))
        expdtau = 1.0 - em
        alpha, beta_ = 1 / u1 + lam, 1 / u1 - lam
        exptrm_alp = -_expm1(-_clip(alpha * dtau)) / alpha
        exptrm_bet = _scaled_bet(c['exptrm'], expdtau, beta_, dtau)
        planck_int = (b0 * em + b1 * (u1 - (dtau + u1) * expdtau))
        # Pu1[1] = u1 (rt/sh.py:808-816)
        multi_scat = (
            Xm[0] * (w_multi[0] - w_multi[1] * u1 * q) * exptrm_alp
            + Xm[1] * (w_multi[0] + w_multi[1] * u1 * q) * exptrm_bet
            + w_multi[0] * ((1 - w0) * u1 / a[0] * planck_int)
            + w_multi[1] * u1 * ((1 - w0) * u1 / a[0]
                                 * (b1 * em / a[1])))

        intgrl = (w0 * multi_scat * 2 * PI
                  + 2 * PI * (1 - w0) * u1 * planck_int)

        if hard_surface:
            xint_bottom = all_b[-1:] * 2 * PI
        else:
            xint_bottom = (all_b[-1:] + b1[-1:] * u1) * 2 * PI

        # sweep scratch (dead after the elimination): see SH4 note
        a_s[:, 0:bw] = expdtau
        c_s[:, 0:bw] = intgrl / u1

        def ascend(i, x_below):
            k = pl.ds(nlayer - 1 - i, 1)
            return x_below * a_s[k, 0:bw] + c_s[k, 0:bw]

        xint_top = jax.lax.fori_loop(0, nlayer, ascend, xint_bottom)
        out_ref[ia:ia + 1, :] = xint_top


def _sh2_thermal_kernel(u1_ref, allb_ref, taugas_ref, tauray_ref,
                        copd_ref, cw0_ref, cg0_ref, rf_ref, ptfac_ref,
                        sr_ref, out_ref, *scr, nang, hard_surface,
                        delta_eddington):
    (dtau, tau, w0, cosb, gcos2, ftau_cld, ftau_ray, dtau_og, tau_og,
     w0_og, cosb_og) = _optics_block(
        taugas_ref[...], tauray_ref[...], copd_ref[...], cw0_ref[...],
        cg0_ref[...], rf_ref[...], 2, delta_eddington)
    tau_top = dtau[:1] * ptfac_ref[...]
    _sh2_thermal_core(u1_ref, allb_ref[...], dtau, w0, cosb_og, tau_top,
                      sr_ref[...], out_ref, scr, nang=nang,
                      hard_surface=hard_surface,
                      delta_eddington=delta_eddington)


@partial(jax.jit, static_argnames=('hard_surface', 'delta_eddington',
                                   'block_w', 'interpret'))
def thermal_sh2_pallas(all_b, taugas, tauray, cld_opd, cld_w0, cld_g0, rf,
                       ptfac, surf_reflect, ubar1,
                       hard_surface: bool = False,
                       delta_eddington: bool = True,
                       block_w: int = 512, interpret: bool = False):
    """SH 2-stream thermal TOA flux [ng, nt, nwno] — Pallas path.

    Same contract (and delta-SCALED-field note) as thermal_sh4_pallas
    with s = 2; matches rt/sh.py::thermal_sh at stream=2.
    """
    ng, nt = ubar1.shape
    nang = ng * nt
    nlayer, nwno = taugas.shape
    nblocks = -(-nwno // block_w)

    u1 = ubar1.reshape(-1).astype(taugas.dtype)
    pt = jnp.broadcast_to(jnp.asarray(ptfac, taugas.dtype), (1, nwno))
    layer_spec = pl.BlockSpec((nlayer, block_w), lambda i: (0, i))
    level_spec = pl.BlockSpec((nlayer + 1, block_w), lambda i: (0, i))
    row_spec = pl.BlockSpec((1, block_w), lambda i: (0, i))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((nlayer, 4 * block_w), taugas.dtype),    # tb
               pltpu.VMEM((nlayer, 2 * block_w), taugas.dtype),    # a
               pltpu.VMEM((nlayer, 2 * block_w), taugas.dtype),    # c
               pltpu.VMEM((nlayer, 2 * block_w), taugas.dtype),    # d
               pltpu.VMEM((nlayer, 4 * block_w), taugas.dtype),    # cp
               pltpu.VMEM((nlayer, 2 * block_w), taugas.dtype)]    # dp

    kernel = partial(_sh2_thermal_kernel, nang=nang,
                     hard_surface=bool(hard_surface),
                     delta_eddington=bool(delta_eddington))
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[smem_spec, level_spec, layer_spec, layer_spec,
                  layer_spec, layer_spec, layer_spec, layer_spec,
                  row_spec, row_spec],
        out_specs=pl.BlockSpec((nang, block_w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nang, nwno), taugas.dtype),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(u1, all_b, taugas, tauray, cld_opd, cld_w0, cld_g0, rf, pt,
      surf_reflect[None, :])
    return out.reshape(ng, nt, nwno)
