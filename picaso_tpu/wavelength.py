"""Wavelength-grid utilities (cloud input grids, regridding, binning).

Mirrors ``/root/reference/picaso/wavelength.py`` plus the ``mean_regrid``
spectral binning helper from ``justplotit.py:31``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .refdata import refdata_path

__all__ = ['get_cld_input_grid', 'regrid', 'mean_regrid']


def get_cld_input_grid(filename_or_grid='wave_EGP.dat', grid661=False):
    """196-point EGP cloud wavenumber grid (or 661 climate grid), ascending."""
    if grid661:
        grid = np.loadtxt(refdata_path('climate_INPUTS', 'wvno_661'),
                          usecols=[0])
        return grid
    if isinstance(filename_or_grid, np.ndarray):
        return np.sort(filename_or_grid)
    if filename_or_grid == 'wave_EGP.dat':
        path = refdata_path('opacities', 'wave_EGP.dat')
    else:
        path = filename_or_grid
    grid = pd.read_csv(path, sep=r'\s+')
    return grid.sort_values('wavenumber')['wavenumber'].values


def regrid(matrix, old_wno, new_wno):
    """Row-wise linear re-interpolation onto a new wavenumber grid."""
    matrix = np.asarray(matrix, dtype=np.float64)
    new = np.zeros((matrix.shape[0], len(new_wno)))
    for i in range(matrix.shape[0]):
        new[i, :] = np.interp(np.asarray(new_wno, dtype=np.float64),
                              np.asarray(old_wno, dtype=np.float64),
                              matrix[i, :])
    return new


def mean_regrid(x, y, newx=None, R=None):
    """Bin a spectrum to a new grid (uniform-in-x tophat mean).

    Port of justplotit.py:31 semantics: either supply target centers ``newx``
    or a resolving power ``R`` (log-spaced grid).  Returns (newx, newy) with
    NaN where a bin caught no points.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    order = np.argsort(x)
    x, y = x[order], y[order]
    if newx is None:
        if R is None:
            raise ValueError('supply newx or R')
        # build log grid in wavenumber at resolving power R
        lo, hi = np.min(x), np.max(x)
        n = int(np.ceil(np.log(hi / lo) * R))
        newx = lo * np.exp(np.arange(n + 1) / R)
    newx = np.asarray(newx)
    edges = np.zeros(len(newx) + 1)
    edges[1:-1] = 0.5 * (newx[1:] + newx[:-1])
    edges[0] = newx[0] - (edges[1] - newx[0])
    edges[-1] = newx[-1] + (newx[-1] - edges[-2])
    idx = np.digitize(x, edges) - 1
    newy = np.full(len(newx), np.nan)
    for i in range(len(newx)):
        sel = idx == i
        if sel.any():
            newy[i] = np.mean(y[sel])
    return newx, newy
