"""Monochromatic opacity database: sqlite -> HBM-resident grids.

TPU-native replacement for the reference ``RetrieveOpacities``
(``/root/reference/picaso/optics.py:1877-2402``).  The reference re-queries
sqlite for the 4 nearest (T, P) neighbours of every layer on *every*
spectrum call; here the whole (molecule, pt-grid, wavenumber) cube is loaded
once into device memory as log10-opacity and all per-call work — neighbour
search, bilinear log-interpolation, Avogadro scaling — happens on device
inside jit.  A full-resolution retrieval therefore does zero host I/O per
likelihood.

Grid semantics preserved exactly (optics.py:2048-2123):
* interpolation is bilinear in (1/T, log10 P) on log10(opacity), with zeros
  mapped to 1e-50 before the log;
* temperatures clamp to the grid edges; the pressure low-index additionally
  respects the ragged pressures-per-temperature count ``nc_p`` via
  ``min(ilo, nc_p[t_hi]-3)``;
* continuum (CIA) uses nearest-neighbour temperature, no interpolation
  (optics.py:2296-2306).

Storage layout: ``log_kappa [nmol, npt, nwno]`` float32 by default —
opacities span ~1e-50..1e0 cm^2/molecule so the log is O(+-50) and f32 holds
~7 significant digits of the exponent, far tighter than the 1% opacity-table
accuracy itself.
"""

from __future__ import annotations

import io
import sqlite3
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['PTGrid', 'OpacityGrid', 'load_opacity_db', 'interp_molecular', 'interp_molecular_nearest',
           'nearest_continuum']


def _convert_array(blob):
    out = io.BytesIO(blob)
    out.seek(0)
    return np.load(out)


def _adapt_array(arr):
    out = io.BytesIO()
    np.save(out, arr)
    out.seek(0)
    return sqlite3.Binary(out.read())


def connect(db_filename):
    """sqlite connection with numpy-array column support (optics.py:1977)."""
    sqlite3.register_adapter(np.ndarray, _adapt_array)
    sqlite3.register_converter('array', _convert_array)
    conn = sqlite3.connect(db_filename, detect_types=sqlite3.PARSE_DECLTYPES)
    return conn.cursor(), conn


class PTGrid(NamedTuple):
    """The ragged (T, P) grid of the molecular table (1060/1460 layout)."""
    t_inv_grid: jnp.ndarray    # [ntemp] 1/T, descending T order ascending 1/T?
    p_log_grid: jnp.ndarray    # [npress] log10 P(bar)
    nc_p: jnp.ndarray          # [ntemp] pressures available per temperature
    t_offset: jnp.ndarray      # [ntemp] cumulative start index into the flat grid


@jax.tree_util.register_pytree_node_class
class OpacityGrid(NamedTuple):
    """Device-resident opacity data for one monochromatic database.

    A registered pytree: the arrays are traced children, the molecule-name
    tuples are static aux data (so an OpacityGrid can be passed straight
    into jitted functions).
    """
    wno: jnp.ndarray               # [nwno]
    log_kappa: jnp.ndarray         # [nmol, npt, nwno] log10 cm^2/molecule
    pt: PTGrid
    cont_opa: jnp.ndarray          # [ncont, ntcia, nwno] linear cm^-1 amagat^-2 etc
    cia_temps: jnp.ndarray         # [ntcia]
    # host-side metadata (static, not traced)
    molecules: tuple
    continuum_molecules: tuple
    # optional wavelength-block-major copy [npt, nwb, nmol, block_w] for
    # the contiguous-DMA Pallas gather (pallas_interp.blocked_table):
    # 4.2x faster than gathering from the flat layout on TPU v5e.
    # May be int16 fixed-point (see with_blocked_table(quantize=True)),
    # in which case blocked_qparams carries the [scale, offset] pair.
    log_kappa_blocked: Optional[jnp.ndarray] = None
    blocked_qparams: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        children = (self.wno, self.log_kappa, self.pt, self.cont_opa,
                    self.cia_temps, self.log_kappa_blocked,
                    self.blocked_qparams)
        aux = (self.molecules, self.continuum_molecules)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:5], *aux, *children[5:])

    def with_blocked_table(self, block_w=16384, quantize=False):
        """Return a copy carrying the blocked gather layout (adds one
        extra table-sized HBM allocation; ``quantize=True`` stores it as
        int16 fixed point — half the extra HBM and half the gather
        traffic at ~1e-3 dex quantization error)."""
        from .pallas_interp import blocked_table
        if quantize:
            q, qp = blocked_table(self.log_kappa, block_w=block_w,
                                  quantize=True)
            return self._replace(log_kappa_blocked=q, blocked_qparams=qp)
        return self._replace(
            log_kappa_blocked=blocked_table(self.log_kappa,
                                            block_w=block_w))


def load_opacity_db(db_filename, wave_range=None, resample=1,
                    molecules: Optional[Sequence[str]] = None,
                    dtype=np.float32, native=True):
    """Load a reference-format sqlite opacity DB into an OpacityGrid.

    Parameters mirror ``opannection`` (justdoit.py:1296): ``wave_range`` in
    micron, ``resample`` a stride through the native wavenumber grid.
    ``native=True`` uses the C++ fast loader (picaso_tpu.native) for the
    BLOB decode — multithreaded over molecules with the window/log10 fused
    in — falling back to this module's Python path when the toolchain or
    libsqlite3 is unavailable.
    """
    cur, conn = connect(db_filename)

    cur.execute('SELECT wavenumber_grid FROM header')
    wno_full = cur.fetchone()[0][::resample]
    wave = 1e4 / wno_full
    if wave_range is None:
        loc = np.arange(len(wno_full))
    else:
        loc = np.where((wave > min(wave_range)) & (wave < max(wave_range)))[0]
    wno = wno_full[loc]

    cur.execute('SELECT molecule FROM continuum')
    avail_continuum = sorted(set(x[0] for x in cur.fetchall()))
    cur.execute('SELECT temperature FROM continuum')
    cia_temps = np.unique([x[0] for x in cur.fetchall()])

    cur.execute('SELECT molecule FROM molecular')
    avail_mol = sorted(set(x[0] for x in cur.fetchall()))
    if molecules is not None:
        avail_mol = [m for m in avail_mol if m in set(molecules)]

    cur.execute('SELECT DISTINCT ptid, pressure, temperature FROM molecular')
    pt_pairs = sorted(cur.fetchall(), key=lambda x: x[0])
    pressures_all = np.array([p for _, p, _ in pt_pairs])
    temps_all = np.array([t for _, _, t in pt_pairs])
    # unique preserving first-appearance order, like pandas .unique()
    _, p_first = np.unique(pressures_all, return_index=True)
    pressures = pressures_all[np.sort(p_first)]
    _, t_first = np.unique(temps_all, return_index=True)
    temps = temps_all[np.sort(t_first)]
    # pressures-per-temperature in first-appearance temperature order
    nc_p = np.array([(temps_all == t).sum() for t in temps])
    t_offset = np.concatenate([[0], np.cumsum(nc_p)[:-1]])

    npt = len(pt_pairs)
    nmol = len(avail_mol)

    log_kappa = cont = None
    if native and dtype == np.float32:
        from .. import native as native_mod
        try:
            log_kappa = native_mod.load_molecular(
                db_filename, avail_mol, npt, loc, resample)
            if log_kappa is not None:
                cont = native_mod.load_continuum(
                    db_filename, avail_continuum, cia_temps, loc, resample)
        except (RuntimeError, OSError):
            log_kappa = cont = None   # schema/blob mismatch: Python path

    if log_kappa is None:
        log_kappa = np.full((nmol, npt, len(wno)), -50.0, dtype=dtype)
        for im, mol in enumerate(avail_mol):
            cur.execute('SELECT ptid, opacity FROM molecular '
                        'WHERE molecule = ?', (mol,))
            for ptid, op in cur.fetchall():
                arr = op[::resample][loc]
                log_kappa[im, ptid - 1] = np.log10(
                    np.where(arr != 0, arr, 1e-50)).astype(dtype)

    if cont is None:
        cont = np.zeros((len(avail_continuum), len(cia_temps), len(wno)),
                        dtype=dtype)
        for im, mol in enumerate(avail_continuum):
            cur.execute('SELECT temperature, opacity FROM continuum '
                        'WHERE molecule = ?', (mol,))
            for t, op in cur.fetchall():
                it = int(np.searchsorted(cia_temps, t))
                cont[im, it] = op[::resample][loc].astype(dtype)

    conn.close()

    pt = PTGrid(t_inv_grid=jnp.asarray(1.0 / temps, dtype),
                p_log_grid=jnp.asarray(np.log10(pressures), dtype),
                nc_p=jnp.asarray(nc_p, jnp.int32),
                t_offset=jnp.asarray(t_offset, jnp.int32))
    return OpacityGrid(wno=jnp.asarray(wno, jnp.float64
                                       if jax.config.jax_enable_x64
                                       else jnp.float32),
                       log_kappa=jnp.asarray(log_kappa), pt=pt,
                       cont_opa=jnp.asarray(cont),
                       cia_temps=jnp.asarray(cia_temps, dtype),
                       molecules=tuple(avail_mol),
                       continuum_molecules=tuple(avail_continuum))


# ---------------------------------------------------------------------------
# on-device interpolation
# ---------------------------------------------------------------------------

def _find_indices(pt: PTGrid, tlayer, player_bar, return_parity=False):
    """Neighbour indices + weights; port of optics.py:2048-2123.

    Returns (t_w [nlayer], p_w [nlayer], idx [4, nlayer]) where idx rows are
    (t_low,p_low), (t_hi,p_low), (t_hi,p_hi), (t_low,p_hi) flat grid indices
    — the reference's weight-pairing order (see the stack site below),
    which _parity_slots and the blocked-kernel weights depend on.
    With ``return_parity`` additionally returns (t_low % 2, p_low % 2)
    [each int32 [nlayer]] — the base-corner grid parities that drive the
    blocked gather's slot-stable layout (pallas_interp._parity_slots).
    """
    t_inv = 1.0 / tlayer
    p_log = jnp.log10(player_bar)
    tg = pt.t_inv_grid
    pg = pt.p_log_grid
    ntemp = tg.shape[0]

    # t_inv_grid is descending in T i.e. ascending in... depends on storage
    # order; the reference scans for the last index with t_inv_grid > t_inv.
    # Grid temps are stored ascending-T => t_inv_grid is descending.  The
    # "last index where tg > t_inv" on a descending array == searchsorted of
    # -t_inv into -tg minus one, clamped to [0, ntemp-2].
    gt = (tg[None, :] > t_inv[:, None]).astype(jnp.int32)
    any_gt = gt.sum(axis=1) > 0
    last_gt = jnp.where(any_gt,
                        ntemp - 1 - jnp.argmax(gt[:, ::-1], axis=1), 0)
    t_low = jnp.minimum(last_gt, ntemp - 2)
    t_hi = t_low + 1

    npress = pg.shape[0]
    le = (pg[None, :] <= p_log[:, None]).astype(jnp.int32)
    any_le = le.sum(axis=1) > 0
    last_le = jnp.where(any_le,
                        npress - 1 - jnp.argmax(le[:, ::-1], axis=1), 0)
    # ragged-pressure guard: min(ilo, nc_p[t_hi] - 3)  (optics.py:2094-2099)
    p_low = jnp.minimum(last_le, pt.nc_p[t_hi] - 3)
    p_low = jnp.maximum(p_low, 0)
    p_hi = p_low + 1

    t_w = ((t_inv - tg[t_low]) / (tg[t_hi] - tg[t_low]))
    p_w = ((p_log - pg[p_low]) / (pg[p_hi] - pg[p_low]))

    # order matches the reference weight pairing (optics.py:2290-2293):
    # (t_low,p_low), (t_hi,p_low), (t_hi,p_hi), (t_low,p_hi)
    idx = jnp.stack([pt.t_offset[t_low] + p_low,
                     pt.t_offset[t_hi] + p_low,
                     pt.t_offset[t_hi] + p_hi,
                     pt.t_offset[t_low] + p_hi], axis=0)
    if return_parity:
        return t_w, p_w, idx, (t_low % 2, p_low % 2)
    return t_w, p_w, idx


AVOGADRO = 6.02214086e+23  # value baked into optics.py:2294


@jax.jit
def interp_molecular(opa: OpacityGrid, tlayer, player_bar):
    """All molecules' cross sections at every layer: [nmol, nlayer, nwno].

    Bilinear interpolation in (1/T, log10 P) on log10 opacity, then 10**x
    times Avogadro => cm^2/g per unit mixing-ratio mass (optics.py:2290-2294).
    The gather is [nmol, 4*nlayer, nwno] from HBM — contiguous in the
    wavenumber lane axis, so it streams at full HBM bandwidth.
    """
    t_w, p_w, idx = _find_indices(opa.pt, tlayer, player_bar)
    k = opa.log_kappa[:, idx, :]    # [nmol, 4, nlayer, nwno]
    w = jnp.stack([(1 - t_w) * (1 - p_w),
                   t_w * (1 - p_w),
                   t_w * p_w,
                   (1 - t_w) * p_w], axis=0)     # [4, nlayer]
    logk = jnp.einsum('mqlw,ql->mlw', k, w.astype(k.dtype))
    # fold the Avogadro scaling into the exponent: 10**-50 underflows f32,
    # 10**(-50 + 23.78) does not — keeps the full dynamic range on TPU
    return 10.0 ** (logk + float(np.log10(AVOGADRO)))


@jax.jit
def nearest_continuum(opa: OpacityGrid, tlayer):
    """Continuum opacity at the nearest CIA temperature: [ncont, nlayer, nwno].

    Mirrors optics.py:2296-2306 (nearest-neighbour in T, raw values).
    """
    it = jnp.argmin(jnp.abs(opa.cia_temps[None, :] - tlayer[:, None]), axis=1)
    return opa.cont_opa[:, it, :]


@jax.jit
def interp_molecular_nearest(opa: OpacityGrid, tlayer, player_bar):
    """Nearest-(T, P) molecular cross sections: [nmol, nlayer, nwno].

    Exact port of optics.py:2310-2368 ``get_opacities_nearest`` (the
    reference's DEFAULT query method): each layer takes the flat grid
    point minimizing hypot(ln P_grid - ln P_layer, T_grid - T_layer)
    over ALL (T, P) pairs — note the euclidean mix of ln-pressure with
    linear temperature is the reference's own metric.
    """
    pt = opa.pt
    npt = opa.log_kappa.shape[1]
    i = jnp.arange(npt)
    t_index = jnp.searchsorted(pt.t_offset, i, side='right') - 1
    T_flat = 1.0 / pt.t_inv_grid[t_index]
    p_index = i - pt.t_offset[t_index]
    lnP_flat = pt.p_log_grid[p_index] * jnp.log(10.0)
    d2 = ((lnP_flat[None, :] - jnp.log(player_bar)[:, None]) ** 2
          + (T_flat[None, :] - tlayer[:, None]) ** 2)
    pick = jnp.argmin(d2, axis=1)
    logk = opa.log_kappa[:, pick, :]
    return 10.0 ** (logk + float(np.log10(AVOGADRO)))
