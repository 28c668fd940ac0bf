"""Adiabatic gradient and specific heat lookup tables.

Port of the reference ``did_grad_cp`` (climate.py:497-567): bilinear lookup
of nabla_ad and log10 cp on the 53x26 (log10 T, log10 P) H/He grid shipped
in ``climate_INPUTS/specific_heat_p_adiabat_grad.json``, with the exact edge
clamping of the numba original.  Vectorized/jittable — the climate solver
calls this on whole level vectors inside jit.
"""

from __future__ import annotations

import json
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..refdata import refdata_path

__all__ = ['AdiabatGrid', 'load_adiabat_grid', 'did_grad_cp']


class AdiabatGrid(NamedTuple):
    t_table: jnp.ndarray   # [53] log10 K
    p_table: jnp.ndarray   # [26] log10 bar
    grad: jnp.ndarray      # [53, 26] dlnT/dlnP at constant S
    cp: jnp.ndarray        # [53, 26] log10 erg/g/K


def load_adiabat_grid() -> AdiabatGrid:
    with open(refdata_path('climate_INPUTS',
                           'specific_heat_p_adiabat_grad.json')) as f:
        d = json.load(f)
    return AdiabatGrid(t_table=jnp.asarray(d['temperature']),
                       p_table=jnp.asarray(d['pressure']),
                       grad=jnp.asarray(d['adiabat_grad']),
                       cp=jnp.asarray(d['specific_heat']))


def _locate(table, value):
    """Bisection locate (climate.py:611-646): last index with table<=value,
    clamped to [0, n-1]; 0 below the grid."""
    idx = jnp.searchsorted(table, value, side='right') - 1
    return jnp.clip(idx, 0, table.shape[0] - 1)


def did_grad_cp(t, p_bar, adiabat: AdiabatGrid):
    """(nabla_ad, cp) at temperature(s) t [K] and pressure(s) p [bar].

    Vectorized port of climate.py:497-567 including the edge handling:
    below-grid points take the edge value (fact=0), above-grid points pin to
    the last cell with fact=1.
    """
    t_table, p_table = adiabat.t_table, adiabat.p_table
    nt = t_table.shape[0]
    npr = p_table.shape[0]

    temp_log = jnp.log10(t)
    pres_log = jnp.log10(p_bar)
    pos_t = _locate(t_table, temp_log)
    pos_p = _locate(p_table, pres_log)

    at_p_top = pos_p == 0
    at_p_bot = pos_p == npr - 1
    pos_p_c = jnp.clip(pos_p, 0, npr - 2)
    factkp = jnp.where(
        at_p_top, 0.0,
        jnp.where(at_p_bot, 1.0,
                  (pres_log - p_table[pos_p_c])
                  / (p_table[pos_p_c + 1] - p_table[pos_p_c])))

    at_t_top = pos_t == 0
    at_t_bot = pos_t == nt - 1
    pos_t_c = jnp.clip(pos_t, 0, nt - 2)
    factkt = jnp.where(
        at_t_top, 0.0,
        jnp.where(at_t_bot, 1.0,
                  (temp_log - t_table[pos_t_c])
                  / (t_table[pos_t_c + 1] - t_table[pos_t_c])))

    def bilinear(tab):
        g1 = tab[pos_t_c, pos_p_c]
        g2 = tab[pos_t_c + 1, pos_p_c]
        g3 = tab[pos_t_c + 1, pos_p_c + 1]
        g4 = tab[pos_t_c, pos_p_c + 1]
        return ((1 - factkt) * (1 - factkp) * g1 + factkt * (1 - factkp) * g2
                + factkt * factkp * g3 + (1 - factkt) * factkp * g4)

    grad_x = bilinear(adiabat.grad)
    cp_x = 10.0 ** bilinear(adiabat.cp)
    return grad_x, cp_x
