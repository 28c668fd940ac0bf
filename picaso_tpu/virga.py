"""Cloud microphysics: Ackerman & Marley (2001) eddy-sedimentation balance.

The reference delegates cloud microphysics to the external ``virga``
package (justdoit.py:4269-4533, climate update_clouds).  This module is a
self-contained TPU-era equivalent of the capability surface the framework
needs from it:

* saturation vapor pressure curves for the major condensates
  (``pvaps``, literature expressions as compiled for the AM01 family of
  models: Visscher+2006/2010, Morley+2012, Wexler/AM01);
* ``condensation_t`` — condensation temperature curves;
* the AM01 balance: above the cloud base the total condensate+vapor mixing
  ratio falls as (p/p_base)^fsed, the condensed fraction is
  q_t - q_sat, and the particle size follows from equating the fall
  velocity to fsed * w* with w* = Kzz/L (mixing length);
* layer optical depth / single-scattering albedo / asymmetry from Mie
  coefficient tables (virga .mieff format) or a geometric-optics fallback
  so cloudy runs work without downloaded Mie data;
* ``Atmosphere`` + ``compute`` + ``picaso_format`` mirroring the virga API
  used by the reference call sites.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .constants import AMU, K_B
from .wavelength import get_cld_input_grid

__all__ = ['pvaps', 'condensation_t', 'recommend_gas', 'Atmosphere',
           'compute', 'picaso_format', 'available', 'load_mieff']

# condensate molecular weights (g/mol) and solid densities (g/cm^3)
GAS_PROPERTIES = {
    'H2O': (18.015, 0.93), 'CH4': (16.04, 0.49), 'NH3': (17.03, 0.84),
    'Fe': (55.85, 7.87), 'MgSiO3': (100.39, 3.19), 'Mg2SiO4': (140.69,
                                                               3.21),
    'Al2O3': (101.96, 3.95), 'Na2S': (78.05, 1.86), 'KCl': (74.55, 1.99),
    'ZnS': (97.46, 4.04), 'MnS': (87.00, 4.0), 'Cr': (52.0, 7.15),
    'NH4SH': (51.1, 1.17),
}


def available():
    return list(GAS_PROPERTIES)


class _Pvaps:
    """Saturation vapor pressures in dyne/cm^2 given T [K] (+ optional P).

    Expressions from the published compilations used by the AM01 model
    family (Visscher et al. 2006, 2010; Morley et al. 2012; Lodders 1999;
    AM01 appendix A for H2O/CH4/NH3).
    """

    @staticmethod
    def H2O(t, p=1.0, mh=1.0):
        # Buck (1981)-style liquid/ice blend, in dyne/cm^2
        t = np.asarray(t, float)
        tc = t - 273.16
        liq = 6.112e3 * np.exp(17.502 * tc / (240.97 + tc))
        ice = 6.112e3 * np.exp(22.587 * tc / (273.86 + tc))
        return np.where(t > 273.16, liq, ice)

    @staticmethod
    def CH4(t, p=1.0, mh=1.0):
        # Lodders-style sublimation/vaporization fit (bar -> dyne/cm^2)
        t = np.asarray(t, float)
        tcr = 90.68
        a_solid = 10 ** (4.425070 - 453.92414 / t)
        a_liq = 10 ** (3.901408 - 437.54809 / t)
        return np.where(t < tcr, a_solid, a_liq) * 1e6 / 1.01325e0 * 1.01325

    @staticmethod
    def NH3(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return np.exp(-86596.0 / t ** 2 - 2161.0 / t + 10.53) * 1e6

    @staticmethod
    def Fe(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (7.23 - 20995.0 / t) * 1e6

    @staticmethod
    def MgSiO3(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (11.83 - 27250.0 / t - np.log10(mh)) * 1e6

    @staticmethod
    def Mg2SiO4(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        p_bar = np.asarray(p, float)
        return 10 ** (-32488.0 / t + 14.88 - 0.2 * np.log10(p_bar)
                      - 1.4 * np.log10(mh)) * 1e6

    @staticmethod
    def Al2O3(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (17.7 - 45892.6 / t - 1.66 * np.log10(mh)) * 1e6

    @staticmethod
    def Na2S(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (8.55 - 13889.0 / t - 0.5 * np.log10(mh)) * 1e6

    @staticmethod
    def KCl(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (7.611 - 11382.0 / t) * 1e6

    @staticmethod
    def ZnS(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (12.812 - 15873.0 / t - np.log10(mh)) * 1e6

    @staticmethod
    def MnS(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (11.532 - 23810.0 / t - np.log10(mh)) * 1e6

    @staticmethod
    def Cr(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (7.49 - 20592.0 / t) * 1e6

    @staticmethod
    def NH4SH(t, p=1.0, mh=1.0):
        t = np.asarray(t, float)
        return 10 ** (14.82 - 4705.0 / t) * 1e6 / 1e6 * 1e6


pvaps = _Pvaps()


def condensation_t(species, mh, mmw, pressure=None):
    """Condensation temperature curve T_cond(P) where pvap = partial P.

    Mirrors virga.condensation_t used at justdoit.py:2208.
    """
    pressure = (np.asarray(pressure, float) if pressure is not None
                else np.logspace(-6, 2, 50))
    gas_mw, _ = GAS_PROPERTIES[species]
    # solar-ish deep abundances scaled by mh (mass mixing ratio -> partial p)
    q_deep = _deep_abundance(species, mh)
    get_pvap = getattr(pvaps, species)
    t_grid = np.linspace(10.0, 4000.0, 4000)
    out_t = np.zeros_like(pressure)
    for i, p in enumerate(pressure):
        partial = q_deep * (gas_mw / mmw) ** 0 * p * 1e6
        pv = get_pvap(t_grid, p=p, mh=mh)
        idx = np.where(pv >= partial)[0]
        out_t[i] = t_grid[idx[0]] if len(idx) else t_grid[-1]
    return pressure, out_t


def _deep_abundance(species, mh=1.0):
    """Deep volume mixing ratio of the condensing vapor (solar, x mh)."""
    base = {'H2O': 1.1e-3, 'CH4': 5.5e-4, 'NH3': 1.4e-4, 'Fe': 5.8e-5,
            'MgSiO3': 5.9e-5, 'Mg2SiO4': 5.9e-5, 'Al2O3': 4.7e-6,
            'Na2S': 3.3e-6, 'KCl': 2.2e-7, 'ZnS': 7.4e-8, 'MnS': 5.5e-7,
            'Cr': 8.8e-7, 'NH4SH': 1.4e-4}
    return base[species] * mh


def recommend_gas(pressure, temperature, mh=1.0, mmw=2.2):
    """Condensates whose condensation curve crosses the profile."""
    out = []
    for gas in GAS_PROPERTIES:
        _, tc = condensation_t(gas, mh, mmw, pressure=pressure)
        if np.any(np.asarray(temperature) < tc):
            out.append(gas)
    return out


def load_mieff(filename):
    """Read a virga .mieff Mie table.

    Format: first line 'nwave nradii'; then per radius: a line with the
    radius [cm], then nwave rows of (wave_um, qscat, qext, cos_qscat).
    Returns dict(wave_um [nw], radii [nr], qscat [nr, nw], qext, cos_qscat).
    """
    with open(filename) as f:
        tokens = f.read().split()
    nwave = int(float(tokens[0]))
    nrad = int(float(tokens[1]))
    i = 2
    radii = np.zeros(nrad)
    wave = None
    qscat = np.zeros((nrad, nwave))
    qext = np.zeros((nrad, nwave))
    cosq = np.zeros((nrad, nwave))
    for ir in range(nrad):
        radii[ir] = float(tokens[i])
        i += 1
        block = np.array(tokens[i:i + 4 * nwave], float).reshape(nwave, 4)
        i += 4 * nwave
        if wave is None:
            wave = block[:, 0]
        qscat[ir] = block[:, 1]
        qext[ir] = block[:, 2]
        cosq[ir] = block[:, 3]
    return dict(wave_um=wave, radii=radii, qscat=qscat, qext=qext,
                cos_qscat=cosq)


def _mie_at(mie, r_eff, wave_um):
    """Interpolate Mie efficiencies at particle radius + wavelengths."""
    if mie is None:
        # geometric-optics fallback with a crude size-parameter rolloff
        x = 2 * np.pi * (r_eff * 1e4) / wave_um   # r in um / wave in um
        small = x < 1
        qext = np.where(small, 2.0 * x ** 2, 2.0)
        qscat = 0.9 * qext
        cosq = np.where(small, 0.1, 0.8)
        return qext, qscat, cosq
    ir = np.clip(np.searchsorted(mie['radii'], r_eff), 0,
                 len(mie['radii']) - 1)
    qe = np.interp(wave_um, mie['wave_um'], mie['qext'][ir])
    qs = np.interp(wave_um, mie['wave_um'], mie['qscat'][ir])
    # .mieff stores the product g * qscat in the last column
    cq = np.interp(wave_um, mie['wave_um'], mie['cos_qscat'][ir])
    g = np.clip(cq / np.maximum(qs, 1e-30), -1, 1)
    return qe, qs, g


class Atmosphere:
    """virga-style driver object (vj.Atmosphere(...).compute analog)."""

    def __init__(self, condensates, fsed=1.0, mh=1.0, mmw=2.2, sig=2.0,
                 b=1, param='const', verbose=False):
        self.condensates = list(np.atleast_1d(condensates))
        self.fsed = fsed
        self.mh = mh
        self.mmw = mmw
        self.sig = sig
        self.kz = None
        self.gravity = None

    def gravity_(self, gravity=None, gravity_unit=None):
        from . import units as u
        self.gravity = u.to_cgs(gravity, gravity_unit)

    def ptk(self, df=None, kz_min=1e5):
        self.pressure = np.asarray(df['pressure'], float)   # bar
        self.temperature = np.asarray(df['temperature'], float)
        self.kz = np.maximum(np.asarray(df.get(
            'kz', np.zeros_like(self.pressure) + 1e9), float), kz_min)


def compute(atmo: Atmosphere, directory=None, as_dict=True):
    """Run the AM01 eddy-sedimentation balance (virga.compute analog).

    Returns a dict with opd_per_layer [nlayer, 196], single_scattering,
    asymmetry, condensate mmr / particle sizes, on the 196-pt cloud grid.
    """
    wno_grid = get_cld_input_grid()
    wave_um = 1e4 / wno_grid[::-1]
    p = atmo.pressure
    t = atmo.temperature
    nlevel = len(p)
    nlayer = nlevel - 1
    grav = atmo.gravity
    mmw_g = atmo.mmw * AMU

    p_layer = np.sqrt(p[1:] * p[:-1])
    t_layer = 0.5 * (t[1:] + t[:-1])
    kz_layer = 0.5 * (atmo.kz[1:] + atmo.kz[:-1])
    scale_h = K_B * t_layer / (mmw_g * grav)              # cm
    rho_atm = p_layer * 1e6 * mmw_g / (K_B * t_layer)     # g/cm^3
    colden = np.diff(p * 1e6) / grav                      # g/cm^2

    opd = np.zeros((nlayer, len(wno_grid)))
    w0n = np.zeros_like(opd)
    g0n = np.zeros_like(opd)
    out_cond = {}

    fsed_arr = np.zeros(nlayer) + atmo.fsed
    for gas in atmo.condensates:
        gas_mw, rho_c = GAS_PROPERTIES[gas]
        get_pvap = getattr(pvaps, gas)
        q_deep = _deep_abundance(gas, atmo.mh) * gas_mw / atmo.mmw  # mass
        qsat = (get_pvap(t_layer, p=p_layer, mh=atmo.mh)
                / (p_layer * 1e6)) * gas_mw / atmo.mmw

        # find cloud base: deepest layer where q_deep exceeds saturation
        supersat = q_deep > qsat
        if not supersat.any():
            continue
        ibase = int(np.max(np.where(supersat)[0]))

        q_t = np.zeros(nlayer)
        q_c = np.zeros(nlayer)
        q_t[ibase:] = q_deep
        for i in range(ibase - 1, -1, -1):
            # AM01 eq 7: total mixing ratio falls as (p/p_base)^fsed
            q_t[i] = np.minimum(
                q_t[i + 1] * (p_layer[i] / p_layer[i + 1])
                ** fsed_arr[i], q_deep)
            q_c[i] = np.maximum(q_t[i] - qsat[i], 0.0)
        q_c[ibase] = np.maximum(q_deep - qsat[ibase], 0.0)

        # particle size from v_fall(r_w) = fsed w* (AM01 eq 4-6); Stokes
        # with dynamic viscosity of H2
        mixl = scale_h
        w_star = kz_layer / mixl
        eta = 2e-4 * (t_layer / 300.0) ** 0.7              # poise, approx
        r_w = np.sqrt(np.maximum(
            9.0 * eta * fsed_arr * w_star / (2.0 * rho_c * grav), 0.0))
        r_eff = r_w * np.exp(-0.5 * np.log(atmo.sig) ** 2)  # lognormal
        r_eff = np.clip(r_eff, 1e-7, 1e-1)

        # optical depth: opd = 3 q_c colden Qext / (4 rho_c r_eff)
        mie = _load_gas_mieff(gas, directory)
        for i in range(nlayer):
            if q_c[i] <= 0:
                continue
            qe, qs, cq = _mie_at(mie, r_eff[i], wave_um)
            tau = 3.0 * q_c[i] * colden[i] * qe / (4.0 * rho_c * r_eff[i])
            tau = tau[::-1]   # back to ascending wavenumber
            ssa = (qs / np.maximum(qe, 1e-30))[::-1]
            asy = cq[::-1]
            # co-add with existing condensates (opd-weighted w0/g0)
            tot = opd[i] + tau
            w0n[i] = np.where(tot > 0,
                              (w0n[i] * opd[i] + ssa * tau) / tot, 0.0)
            g0n[i] = np.where(tot > 0,
                              (g0n[i] * opd[i] + asy * tau) / tot, 0.0)
            opd[i] = tot
        out_cond[gas] = dict(q_c=q_c, q_t=q_t, r_eff=r_eff, ibase=ibase)

    return {'opd_per_layer': opd, 'single_scattering': w0n,
            'asymmetry': g0n, 'wave': 1e4 / wno_grid,
            'pressure': p_layer, 'temperature': t_layer,
            'condensibles': out_cond,
            'scalar_inputs': {'fsed': atmo.fsed, 'mh': atmo.mh,
                              'sig': atmo.sig, 'mmw': atmo.mmw}}


def _load_gas_mieff(gas, directory):
    if directory is None:
        return None
    fn = os.path.join(directory, f'{gas}.mieff')
    if not os.path.exists(fn):
        return None
    return load_mieff(fn)


def picaso_format(opd, w0, g0, pressure=None, wavenumber=None):
    """Flatten cloud arrays to the .cld dataframe layout (virga API)."""
    opd = np.asarray(opd)
    nl, nw = opd.shape
    df = pd.DataFrame({'opd': opd.ravel(),
                       'w0': np.asarray(w0).ravel(),
                       'g0': np.asarray(g0).ravel()})
    if wavenumber is not None:
        df['wavenumber'] = np.tile(np.sort(np.asarray(wavenumber)), nl)
    if pressure is not None:
        df['pressure'] = np.repeat(np.asarray(pressure), nw)
    return df
