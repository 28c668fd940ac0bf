"""Run the Dlugach & Yanovitskij (1974) Table XXI validation.

Mirrors the reference harness ``model_compare.py:109-207``: semi-infinite
atmosphere albedos for the rayleigh phase function (w0 sweep) and constant-tau
HG phase function (w0 x g0 sweep), compared against the bundled golden table.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from picaso_tpu import justdoit as jdi
from picaso_tpu.refdata import refdata_path


def dlugach_test(single_phase='OTHG', multi_phase='N=1', rayleigh=True,
                 phase=True, stream=2, opd=0.2,
                 toon_coefficients='quadrature', delta_eddington=False):
    real_answer = pd.read_csv(refdata_path('base_cases', 'testing',
                                           'DLUGACH_TEST.csv'))
    real_answer = real_answer.set_index('asy')
    perror = real_answer.copy()

    nlevel = 60
    wno = np.sort(1e4 / np.linspace(0.55, 0.95, 10))
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
    case.approx(raman='none', rt_method='toon', stream=stream,
                toon_coefficients=toon_coefficients, multi_phase=multi_phase,
                delta_eddington=delta_eddington)

    if rayleigh:
        case.inputs['test_mode'] = 'rayleigh'
        for w in real_answer.keys():
            w0 = 0.999999 if float(w) == 1.0 else float(w)
            case.clouds(df=pd.DataFrame({
                'opd': np.repeat(10 ** np.linspace(-5, 3, nlevel - 1), 196),
                'w0': np.zeros(196 * (nlevel - 1)) + w0,
                'g0': np.zeros(196 * (nlevel - 1))}))
            out = case.spectrum(opa, calculation='reflected')
            perror.loc['Ray', w] = out['albedo'][-1]

    if phase:
        case.inputs['test_mode'] = 'constant_tau'
        case.approx(single_phase=single_phase, raman='none',
                    rt_method='toon', stream=stream,
                    toon_coefficients=toon_coefficients,
                    multi_phase=multi_phase,
                    delta_eddington=delta_eddington)
        for g0 in real_answer.index[1:]:
            for w in real_answer.keys():
                w0 = 0.999999 if float(w) == 1.0 else float(w)
                case.clouds(df=pd.DataFrame({
                    'opd': np.zeros(196 * (nlevel - 1)) + opd,
                    'w0': np.zeros(196 * (nlevel - 1)) + w0,
                    'g0': np.zeros(196 * (nlevel - 1)) + float(g0)}))
                out = case.spectrum(opa, calculation='reflected')
                perror.loc[g0, w] = out['albedo'][-1]

    return real_answer, perror


if __name__ == '__main__':
    truth, computed = dlugach_test()
    err = 100 * (computed - truth) / truth
    print('computed albedos:')
    print(computed.astype(float).round(3))
    print('\npercent error vs Dlugach table XXI:')
    print(err.astype(float).round(1))
    print('\nmax |err| %:', np.nanmax(np.abs(err.values.astype(float))))
    print('mean |err| %:', np.nanmean(np.abs(err.values.astype(float))))
