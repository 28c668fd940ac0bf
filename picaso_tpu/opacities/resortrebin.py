"""On-the-fly correlated-k gas mixing by resort-rebin (Amundsen 2017).

Port of the reference ``deq_chem.py:273-598``: per-molecule CK tables are
mixed at the 4 (T, P) grid neighbours of each layer by pairwise
resort-rebin — outer-product the two gases' g-points weighted by their
VMRs, sort the mixed k's, and rebin the cumulative weight distribution back
onto the g-point quadrature — then bilinearly ln-interpolated to the layer
(T, P).

The reference runs this as a quadruple Python loop per wavelength bin under
numba (deq_chem.py:366-380); here one jitted program vmaps the mix over
(layer, neighbour, wavenumber) and scans over gases, with the fixed-size
(Nk^2 = 64) sort handled by XLA's on-device sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ck import _neighbours, AVOGADRO

__all__ = ['mix_2_gases', 'mix_gases_at_neighbours', 'resortrebin_kappa',
           'synthetic_per_gas_tables']


def mix_2_gases(k1, k2, mix1, mix2, gauss_pts, gauss_wts):
    """Resort-rebin two gases' k-coefficients (deq_chem.py:538-598).

    k1, k2: [..., Nk] linear k-coefficients; mix1, mix2 broadcastable
    VMRs.  Returns (kmix [..., Nk], mix_total).
    """
    mix_t = mix1 + mix2
    Nk = gauss_wts.shape[0]
    kmix = ((mix1[..., None, None] * k1[..., :, None]
             + mix2[..., None, None] * k2[..., None, :])
            / mix_t[..., None, None]).reshape(*k1.shape[:-1], Nk * Nk)
    wts = (gauss_wts[:, None] * gauss_wts[None, :]).reshape(-1)
    order = jnp.argsort(kmix, axis=-1)
    kmix_sort = jnp.take_along_axis(kmix, order, axis=-1)
    wts_sort = jnp.broadcast_to(wts, kmix.shape)
    wts_sort = jnp.take_along_axis(wts_sort, order, axis=-1)
    csum = jnp.cumsum(wts_sort, axis=-1)
    x = csum / csum[..., -1:]
    logk = jnp.log10(jnp.maximum(kmix_sort, 1e-300))
    kmix_bin = 10.0 ** jax.vmap(
        lambda xx, yy: jnp.interp(gauss_pts, xx, yy)
    )(x.reshape(-1, Nk * Nk), logk.reshape(-1, Nk * Nk)
      ).reshape(*k1.shape[:-1], Nk)
    return kmix_bin, mix_t


def mix_gases_at_neighbours(ln_kappas, mixes, gauss_pts, gauss_wts):
    """Mix all gases: ln_kappas [ngas, ..., Nk], mixes [ngas, ...].

    Sequential pairwise mixing exactly like do_mixing_mono_gasesfly
    (deq_chem.py:387-481).  Returns ln of the mixed k-coefficients.
    """
    kmix = jnp.exp(ln_kappas[0])
    mix_t = mixes[0]
    for i in range(1, ln_kappas.shape[0]):
        kmix, mix_t = mix_2_gases(kmix, jnp.exp(ln_kappas[i]), mix_t,
                                  mixes[i], gauss_pts, gauss_wts)
    return jnp.log(jnp.maximum(kmix, 1e-300))


@partial(jax.jit, static_argnames=())
def resortrebin_kappa(ln_kappa_gases, t_inv_grid, p_log_grid, nc_p,
                      gauss_pts, gauss_wts, mixes, tlayer, player_bar):
    """Mixed molecular opacity [nlayer, nwno, Nk] x Avogadro.

    ln_kappa_gases: [ngas, npress, ntemp, nwno, Nk] per-gas CK tables;
    mixes: [ngas, nlayer] VMR profiles.  Mixing happens at the 4 (T, P)
    neighbours of every layer, then bilinear interpolation on ln kappa
    (optics.py:1164-1197).
    """
    t_low, t_hi, p_low, p_hi, t_w, p_w = _neighbours(
        t_inv_grid, p_log_grid, nc_p, tlayer, player_bar)

    # gather the four neighbour columns: [ngas, nlayer, 4, nwno, Nk]
    pidx = jnp.stack([p_low, p_low, p_hi, p_hi], 1)       # [nlayer, 4]
    tidx = jnp.stack([t_low, t_hi, t_hi, t_low], 1)
    k_nb = ln_kappa_gases[:, pidx, tidx]                  # fancy gather

    mixes_b = mixes[:, :, None, None]                     # [ngas,nlayer,1,1]
    ln_mixed = mix_gases_at_neighbours(
        k_nb, jnp.broadcast_to(mixes_b, k_nb.shape[:-1]),
        gauss_pts, gauss_wts)                             # [nlayer,4,nw,Nk]

    tw = t_w[:, None, None]
    pw = p_w[:, None, None]
    ln_k = ((1 - tw) * (1 - pw) * ln_mixed[:, 0]
            + tw * (1 - pw) * ln_mixed[:, 1]
            + tw * pw * ln_mixed[:, 2]
            + (1 - tw) * pw * ln_mixed[:, 3])
    return jnp.exp(ln_k) * AVOGADRO


def synthetic_per_gas_tables(wno, molecules=('H2O', 'CH4', 'CO', 'NH3'),
                             ntemp=8, npress=6, seed=11, dtype=np.float32):
    """Per-gas ln-k tables [ngas, npress, ntemp, nwno, 8] for tests."""
    from .factory import synthetic_cross_sections, default_pt_grid
    from .ck import double_gauss_points

    temps, pressures = default_pt_grid(ntemp, npress)
    gauss_pts, gauss_wts = double_gauss_points()
    Nk = len(gauss_pts)
    out = np.zeros((len(molecules), npress, ntemp, len(wno), Nk), dtype)
    spread = np.linspace(-1.0, 2.0, Nk)
    for ig, mol in enumerate(molecules):
        sigma = synthetic_cross_sections(mol, np.asarray(wno), temps,
                                         pressures, seed=seed)
        base = np.log(np.maximum(sigma, 1e-50)).transpose(1, 0, 2)
        out[ig] = (base[..., None] + spread[None, None, None, :])
    meta = dict(temps=temps, pressures=pressures, gauss_pts=gauss_pts,
                gauss_wts=gauss_wts)
    return out, meta


def load_per_gas_tables(path, preload_gases, dtype=np.float32):
    """Read <mol>_1460.hdf5 per-gas CK files (opacity_factory.py:2280)."""
    import os
    import h5py

    kappas, meta = [], None
    for mol in preload_gases:
        fn = os.path.join(path, f'{mol}_1460.hdf5')
        if not os.path.exists(fn):
            continue
        with h5py.File(fn, 'r') as f:
            kappas.append(np.asarray(f['kcoeffs'], dtype))
            if meta is None:
                meta = dict(
                    wno=f['wno'][:], delta_wno=f['delta_wno'][:],
                    pressures=np.unique(f['pressures'][:]),
                    temps=np.unique(f['temperatures'][:]),
                    gauss_pts=f['gauss_pts'][:],
                    gauss_wts=f['gauss_wts'][:],
                    nc_p=np.asarray(f['nc_p'][:], int))
    if not kappas:
        raise FileNotFoundError(f'no per-gas CK tables found in {path}')
    return np.stack(kappas), meta
