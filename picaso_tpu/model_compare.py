"""Physics benchmark harnesses against literature tables.

Port of the reference ``model_compare.py``: tools returning DataFrames for
human inspection (and used by the automated test suite):

* :func:`dlugach_test` — semi-infinite-atmosphere albedos vs Dlugach &
  Yanovitskij (1974) Table XXI (w0 x g0 sweep, rayleigh + constant-tau
  analytic test modes);
* :func:`thermal_sh_test` — w0 x g0 grid of mean thermal flux for
  comparison against pyDISORT output;
* :func:`madhu_test` — Madhu & Burrows (2011) Figure 2 reproduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import justdoit as jdi
from .refdata import refdata_path

__all__ = ['dlugach_test', 'thermal_sh_test', 'madhu_test']

_NLEVEL = 60


def _analytic_case(wave=(0.55, 0.95), npts=6, nlevel=_NLEVEL):
    wno = np.sort(1e4 / np.linspace(wave[0], wave[1], npts))
    opa = jdi.opannection(wno_grid=wno)
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opa, 6000, 0.0122, 4.437)
    case.atmosphere(df=pd.DataFrame({
        'pressure': np.logspace(-6, 3, nlevel),
        'temperature': np.zeros(nlevel) + 1000,
        'H2': np.zeros(nlevel) + 0.99,
        'H2O': np.zeros(nlevel) + 0.01}))
    return opa, case


def dlugach_test(single_phase='OTHG', multi_phase='N=1', rayleigh=True,
                 phase=True, method='toon', stream=2, opd=0.2,
                 toon_coefficients='quadrature', delta_eddington=False,
                 output_dir=None):
    """Albedos vs Dlugach & Yanovitskij Table XXI (model_compare.py:109)."""
    real_answer = pd.read_csv(refdata_path('base_cases', 'testing',
                                           'DLUGACH_TEST.csv'))
    real_answer = real_answer.set_index('asy')
    perror = real_answer.copy()
    opa, case = _analytic_case()
    nlayer = _NLEVEL - 1

    def run(w0, g0, test_mode, sp):
        case.inputs['test_mode'] = test_mode
        case.approx(single_phase=sp, raman='none', rt_method=method,
                    stream=stream, toon_coefficients=toon_coefficients,
                    multi_phase=multi_phase,
                    delta_eddington=delta_eddington)
        opd_col = (np.repeat(10 ** np.linspace(-5, 3, nlayer), 196)
                   if test_mode == 'rayleigh'
                   else np.zeros(196 * nlayer) + opd)
        case.clouds(df=pd.DataFrame({
            'opd': opd_col, 'w0': np.zeros(196 * nlayer) + w0,
            'g0': np.zeros(196 * nlayer) + g0}))
        return case.spectrum(opa, calculation='reflected')['albedo'][-1]

    if rayleigh:
        for w in real_answer.keys():
            w0 = 0.999999 if float(w) == 1.0 else float(w)
            perror.loc['Ray', w] = run(w0, 0.0, 'rayleigh', 'TTHG_ray')
    if phase:
        for g0 in real_answer.index[1:]:
            for w in real_answer.keys():
                w0 = 0.999999 if float(w) == 1.0 else float(w)
                perror.loc[g0, w] = run(w0, float(g0), 'constant_tau',
                                        single_phase)
    perror.index.name = 'asy'
    if output_dir is not None:
        perror.to_csv(output_dir)
    return real_answer, perror


def thermal_sh_test(single_phase='OTHG', method='toon', stream=2,
                    toon_coefficients='quadrature', delta_eddington=True,
                    tau=0.2, output_dir=None):
    """Mean thermal flux over a w0 x g0 grid for DISORT comparison
    (model_compare.py:20-106)."""
    cols = ['1.0', '0.999', '0.995', '0.990', '0.980', '0.950', '0.90',
            '0.8', '0.7', '0.6', '0.5', '0.4', '0.3', '0.2', '0.1']
    rows = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.999]
    perror = pd.DataFrame(columns=cols, index=rows, dtype=float)

    nlevel = 20
    wno = np.sort(1e4 / np.linspace(1.2, 9.5, 10))
    opa = jdi.opannection(wno_grid=wno)
    case = jdi.inputs(calculation='browndwarf')
    case.phase_angle(0)
    case.gravity(gravity=200, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.surface_reflect(0, opa.wno)
    pressure = np.logspace(-4, 2, nlevel)
    case.atmosphere(df=pd.DataFrame({
        'pressure': pressure,
        'temperature': np.clip(1270 * (pressure / 10) ** 0.1, 500, None),
        'H2': np.zeros(nlevel) + 0.85, 'He': np.zeros(nlevel) + 0.15}))
    case.inputs['test_mode'] = 'constant_tau'
    nlayer = nlevel - 1

    for g0 in rows:
        for w in cols:
            w0 = 0.999999 if float(w) == 1.0 else float(w)
            case.clouds(df=pd.DataFrame({
                'opd': np.zeros(196 * nlayer) + tau,
                'w0': np.zeros(196 * nlayer) + w0,
                'g0': np.zeros(196 * nlayer) + g0}))
            case.approx(single_phase=single_phase, rt_method=method,
                        stream=stream, toon_coefficients=toon_coefficients,
                        delta_eddington=delta_eddington, raman='none')
            out = case.spectrum(opa, calculation='thermal')
            perror.loc[g0, w] = float(np.mean(out['thermal']))
    perror.index.name = 'asy'
    if output_dir is not None:
        perror.to_csv(output_dir)
    return perror


def madhu_test(rayleigh=True, isotropic=True, asymmetric=True,
               single_phase='TTHG_ray'):
    """Madhu & Burrows (2011) fig. 2 cases (model_compare.py:209-300).

    Returns a DataFrame of albedos vs single-scattering albedo for the
    rayleigh / isotropic / asymmetric-HG phase functions.
    """
    ssa = np.array([0.3, 0.5, 0.7, 0.8, 0.9, 0.95, 0.99, 0.999999])
    out = pd.DataFrame({'ssa': ssa})
    nlevel = 60
    wno = np.sort(1e4 / np.linspace(0.55, 0.95, 4))
    opa = jdi.opannection(wno_grid=wno)
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=10, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opa, 6000, 0.0122, 4.437)
    p = np.logspace(-5, 4, nlevel)
    case.atmosphere(df=pd.DataFrame({
        'pressure': p, 'temperature': np.zeros(nlevel) + 300,
        'CH4': np.zeros(nlevel) + 0.01, 'H2': np.zeros(nlevel) + 0.495,
        'He': np.zeros(nlevel) + 0.495}))
    nlayer = nlevel - 1

    def run(w0, g0, test_mode, sp):
        case.inputs['test_mode'] = test_mode
        case.approx(single_phase=sp, raman='pollack',
                    delta_eddington=True)
        opd_col = (np.repeat(10 ** np.linspace(-5, 3, nlayer), 196)
                   if test_mode == 'rayleigh'
                   else np.zeros(196 * nlayer) + 0.2)
        case.clouds(df=pd.DataFrame({
            'opd': opd_col, 'w0': np.zeros(196 * nlayer) + w0,
            'g0': np.zeros(196 * nlayer) + g0}))
        return case.spectrum(opa, calculation='reflected')['albedo'][-1]

    if rayleigh:
        out['rayleigh'] = [run(w, 0.0, 'rayleigh', 'TTHG_ray')
                           for w in ssa]
    if isotropic:
        out['0.0'] = [run(w, 0.0, 'constant_tau', 'OTHG') for w in ssa]
    if asymmetric:
        for g in [0.2, 0.4, 0.6, 0.8]:
            out[str(g)] = [run(w, g, 'constant_tau', single_phase)
                           for w in ssa]
    return out
