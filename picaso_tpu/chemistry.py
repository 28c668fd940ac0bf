"""Chemistry subsystem: equilibrium-grid interpolation and quenching.

Covers the reference L7 layer:
* ``chem_interp`` (justdoit.py:3106-3200): 4-neighbour bilinear interpolation
  of log abundances in (1/T, log10 P) on the 1060/1460/2121-point grids —
  here a jittable device function so the climate loop's per-iteration
  chemistry refresh costs no host work;
* Zahnle & Marley (2014) quench-timescale chemistry (deq_chem.py:5-152);
* loaders for the visscher equilibrium grids and the CK ``full_abunds``
  tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ['ChemGrid', 'chem_grid_from_table', 'chem_interp',
           'quench_levels']


@jax.tree_util.register_pytree_node_class
class ChemGrid(NamedTuple):
    """Equilibrium chemistry table on a ragged (T, P) grid."""
    log_abunds: jnp.ndarray    # [npt, nspecies] log10 mixing ratios
    t_inv_grid: jnp.ndarray    # [ntemp]
    p_log_grid: jnp.ndarray    # [npress]
    nc_p: jnp.ndarray          # [ntemp]
    t_offset: jnp.ndarray      # [ntemp]
    species: tuple             # static

    def tree_flatten(self):
        return (tuple(self)[:-1], (self.species,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def chem_grid_from_table(df: pd.DataFrame) -> ChemGrid:
    """Build a ChemGrid from a table with pressure/temperature columns.

    Row ordering must be temperature-major (all pressures of T1, then T2,
    ...) as in the reference grids.
    """
    species = tuple(c for c in df.columns
                    if c not in ('pressure', 'temperature'))
    temps_all = df['temperature'].values
    pressures_all = df['pressure'].values
    _, t_first = np.unique(temps_all, return_index=True)
    temps = temps_all[np.sort(t_first)]
    _, p_first = np.unique(pressures_all, return_index=True)
    pressures = pressures_all[np.sort(p_first)]
    pressures = pressures[pressures > 0]
    nc_p = np.array([(temps_all == t).sum() for t in temps])
    t_offset = np.concatenate([[0], np.cumsum(nc_p)[:-1]])
    vals = df[list(species)].values.astype(np.float64)
    log_abunds = np.log10(np.where(vals > 0, vals, 1e-50))
    return ChemGrid(log_abunds=jnp.asarray(log_abunds),
                    t_inv_grid=jnp.asarray(1.0 / temps),
                    p_log_grid=jnp.asarray(np.log10(pressures)),
                    nc_p=jnp.asarray(nc_p, jnp.int32),
                    t_offset=jnp.asarray(t_offset, jnp.int32),
                    species=species)


@jax.jit
def chem_interp(grid: ChemGrid, tlevel, plevel_bar):
    """Abundances at (T, P) points: [nlevel, nspecies].

    Exact port of the justdoit.py:3106-3200 scheme: bilinear in (1/T,
    log10 P) on log10 abundances with edge clamping and the ragged
    ``nc_p - 3`` pressure guard.
    """
    t_inv = 1.0 / tlevel
    p_log = jnp.log10(plevel_bar)
    tg, pg = grid.t_inv_grid, grid.p_log_grid
    ntemp = tg.shape[0]
    npress = pg.shape[0]

    gt = (tg[None, :] > t_inv[:, None]).astype(jnp.int32)
    any_gt = gt.sum(axis=1) > 0
    t_low = jnp.where(any_gt, ntemp - 1 - jnp.argmax(gt[:, ::-1], axis=1), 0)
    t_low = jnp.minimum(t_low, ntemp - 2)
    t_hi = t_low + 1

    le = (pg[None, :] <= p_log[:, None]).astype(jnp.int32)
    any_le = le.sum(axis=1) > 0
    p_low = jnp.where(any_le, npress - 1 - jnp.argmax(le[:, ::-1], axis=1), 0)
    p_low = jnp.maximum(jnp.minimum(p_low, grid.nc_p[t_hi] - 3), 0)
    p_hi = p_low + 1

    t_w = ((t_inv - tg[t_low]) / (tg[t_hi] - tg[t_low]))[:, None]
    p_w = ((p_log - pg[p_low]) / (pg[p_hi] - pg[p_low]))[:, None]

    la = grid.log_abunds
    i_ll = grid.t_offset[t_low] + p_low
    i_hl = grid.t_offset[t_hi] + p_low
    i_hh = grid.t_offset[t_hi] + p_hi
    i_lh = grid.t_offset[t_low] + p_hi
    out = ((1 - t_w) * (1 - p_w) * la[i_ll]
           + t_w * (1 - p_w) * la[i_hl]
           + t_w * p_w * la[i_hh]
           + (1 - t_w) * p_w * la[i_lh])
    return 10.0 ** out


# ---------------------------------------------------------------------------
# quench chemistry (Zahnle & Marley 2014), port of deq_chem.py:5-152
# ---------------------------------------------------------------------------

def _oh_concentration(temp, press_bar, x_h2o, x_h2):
    """OH number density for PH3 quenching (deq_chem.py OH_conc)."""
    K = 10 ** (3.672 - (14791.0 / temp))
    kb = 1.3807e-16
    x_oh = K * x_h2o * (x_h2 ** -0.5) * (press_bar ** -0.5)
    n = press_bar * 1e6 / (kb * temp)
    return x_oh * n


def quench_levels(pressure_bar, temp, dtdp, kz, mmw_layer, scale_height,
                  grav_si, mh_linear=1.0, x_h2o=None, x_h2=None,
                  strict=True):
    """Quench level indices (Zahnle & Marley 2014 timescales).

    Port of deq_chem.py:5-152 ``get_quench_levels``: mixing time H^2/Kzz vs
    chemical timescales, crossing detected scanning from depth upward; the
    cold-case pressure-grid extension (deq_chem.py:47-54) included.
    Returns (dict group -> level index, t_mix array).
    """
    temp = np.array(temp, dtype=float)
    pressure = np.array(pressure_bar, dtype=float)
    mmw = np.array(mmw_layer, dtype=float)
    kz = np.atleast_1d(np.asarray(kz, dtype=float))
    nlevel = len(temp)
    if kz.size == 1:
        kz = np.full(nlevel, float(kz[0]))

    # cold-case extension down to 1e6 bar (deq_chem.py:44-54)
    if temp.min() <= 250 and pressure[-1] < 1e6:
        ext_p = np.logspace(np.log10(pressure[-1] + 100), 6, 10)
        pressure = np.append(pressure, ext_p)
        for i in range(nlevel, nlevel + 10):
            new_temp = np.exp(np.log(temp[i - 1]) - dtdp[-1]
                              * (np.log(pressure[i - 1])
                                 - np.log(pressure[i])))
            temp = np.append(temp, new_temp)
        nlevel = len(temp)
    while len(mmw) < nlevel:
        mmw = np.append(mmw, mmw[-1])
    while len(kz) < nlevel:
        kz = np.append(kz, kz[-1])

    k_b, m_p = 1.38e-23, 1.66e-27
    scale_H = (k_b / (mmw * m_p)) * temp * 1e2 / grav_si  # cm
    scale_H[:len(scale_height)] = scale_height
    t_mix = scale_H ** 2 / kz

    t_chems = {
        'CO-CH4-H2O': (1.5e-6 / pressure * mh_linear ** -0.7)
        * np.exp(42000.0 / temp),
        'CO2': (1e-10 / pressure ** 0.5) * np.exp(38000.0 / temp),
        'NH3-N2': (1e-7 / pressure) * np.exp(52000.0 / temp),
        'HCN': (1.5e-4 / (pressure * mh_linear ** 0.7))
        * np.exp(36000.0 / temp),
    }
    if x_h2o is not None and x_h2 is not None:
        xo = np.asarray(x_h2o, dtype=float)
        xh = np.asarray(x_h2, dtype=float)
        while len(xo) < nlevel:
            xo = np.append(xo, xo[-1])
            xh = np.append(xh, xh[-1])
        OH = _oh_concentration(temp, pressure, xo, xh)
        t_chems['PH3'] = 0.19047619047 * 1e13 * np.exp(6013.6 / temp) / OH

    out = {}
    for name, t_chem in t_chems.items():
        if name != 'PH3' and np.max(t_mix) < np.min(t_chem):
            if strict:
                raise ValueError(f'{name} mixing across the whole pressure '
                                 'range; start with a deeper pressure grid')
            out[name] = nlevel - 2  # quench at depth (non-strict mode)
            continue
        for j in range(nlevel - 1, 0, -1):
            if (t_mix[j - 1] <= t_chem[j - 1]) and (t_mix[j] >= t_chem[j]):
                out[name] = int(min(j, nlevel - 2))
                break
    return out, t_mix


def run_vulcan(pressure, temp, kz, grav, atm_dir='vulcan/atm'):
    """VULCAN kinetics interop (deq_chem.py:628): write the T-P-Kzz
    profile VULCAN expects and drive one solver pass, returning its
    output pickle path.  Gated on the external ``vulcan`` package being
    importable from the caller's environment, mirroring the reference's
    module-scope import requirement.  pressure [bar], kz [cm^2/s],
    grav [m/s^2]."""
    import os
    try:
        import vulcan_cfg  # noqa: F401  (VULCAN configures via module)
        from vulcan import build_atm, op, store  # noqa: F401
    except ImportError as err:
        raise ImportError(
            'run_vulcan needs the external VULCAN package on sys.path '
            '(https://github.com/exoclime/VULCAN); install it and run '
            'from the VULCAN root directory') from err
    os.makedirs(atm_dir, exist_ok=True)
    prof = np.transpose([np.asarray(pressure) * 1e6, np.asarray(temp),
                         np.asarray(kz)])
    path = os.path.join(atm_dir, 'tpkzz.txt')
    np.savetxt(path, prof)
    vulcan_cfg.atm_file = path
    vulcan_cfg.use_solar = True
    vulcan_cfg.ini_mix = 'EQ'
    vulcan_cfg.use_photo = False
    vulcan_cfg.nz = len(pressure)
    vulcan_cfg.P_b = float(np.max(prof[:, 0]))
    vulcan_cfg.P_t = float(np.min(prof[:, 0]))
    vulcan_cfg.gs = float(grav) * 100.0
    vulcan_cfg.use_live_plot = False
    import vulcan
    vulcan.main()
    return getattr(vulcan_cfg, 'out_name', None)
