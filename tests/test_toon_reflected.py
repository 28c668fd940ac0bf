"""Reflected-light validation against Dlugach & Yanovitskij (1974) Table XXI.

Mirrors the reference harness model_compare.py:109-207 using the analytic
test_mode opacity overrides, so no opacity database is required.  Two layers
of assertion:

1. physics: semi-infinite Rayleigh albedos within a few % of the literature
   table (the reference's own documented accuracy);
2. regression: spot values pinned to this implementation's first-run output
   (guards against silent numerical drift).
"""

import numpy as np
import pandas as pd
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.refdata import refdata_path

NLEVEL = 60


@pytest.fixture(scope='module')
def dlugach_case():
    wno = np.sort(1e4 / np.linspace(0.55, 0.95, 6))
    opa = jdi.opannection(wno_grid=wno)
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opa, 6000, 0.0122, 4.437)
    case.atmosphere(df=pd.DataFrame({
        'pressure': np.logspace(-6, 3, NLEVEL),
        'temperature': np.zeros(NLEVEL) + 1000,
        'H2': np.zeros(NLEVEL) + 0.99,
        'H2O': np.zeros(NLEVEL) + 0.01}))
    return opa, case


def _run(case, opa, w0, g0, test_mode, single_phase='OTHG'):
    case.inputs['test_mode'] = test_mode
    case.approx(single_phase=single_phase, raman='none', rt_method='toon',
                multi_phase='N=1', delta_eddington=False)
    nlayer = NLEVEL - 1
    if test_mode == 'rayleigh':
        opd = np.repeat(10 ** np.linspace(-5, 3, nlayer), 196)
    else:
        opd = np.zeros(196 * nlayer) + 0.2
    case.clouds(df=pd.DataFrame({
        'opd': opd,
        'w0': np.zeros(196 * nlayer) + w0,
        'g0': np.zeros(196 * nlayer) + g0}))
    out = case.spectrum(opa, calculation='reflected')
    return out['albedo'][-1]


def test_dlugach_rayleigh(dlugach_case):
    """Semi-infinite Rayleigh albedo within 3% of Table XXI."""
    opa, case = dlugach_case
    truth = pd.read_csv(refdata_path('base_cases', 'testing',
                                     'DLUGACH_TEST.csv')).set_index('asy')
    for w_str in ['1.000', '0.990', '0.900', '0.700']:
        w0 = 0.999999 if float(w_str) == 1.0 else float(w_str)
        alb = _run(case, opa, w0, 0.0, 'rayleigh', single_phase='TTHG_ray')
        expect = truth.loc['Ray', w_str]
        assert abs(alb - expect) / expect < 0.03, (w_str, alb, expect)


def test_dlugach_isotropic(dlugach_case):
    """Isotropic constant-tau albedos within the documented 2-stream error."""
    opa, case = dlugach_case
    truth = pd.read_csv(refdata_path('base_cases', 'testing',
                                     'DLUGACH_TEST.csv')).set_index('asy')
    tol = {'1.000': 0.15, '0.990': 0.05, '0.900': 0.03, '0.700': 0.02}
    for w_str, t in tol.items():
        w0 = 0.999999 if float(w_str) == 1.0 else float(w_str)
        alb = _run(case, opa, w0, 0.0, 'constant_tau')
        expect = truth.loc['0', w_str]
        assert abs(alb - expect) / expect < t, (w_str, alb, expect)


def test_regression_spot_values(dlugach_case):
    """Pin this implementation's first-run values (silent-drift guard)."""
    opa, case = dlugach_case
    got = {
        ('ray', 0.999999, 0.0): _run(case, opa, 0.999999, 0.0, 'rayleigh',
                                     single_phase='TTHG_ray'),
        ('ct', 0.999999, 0.0): _run(case, opa, 0.999999, 0.0,
                                    'constant_tau'),
        ('ct', 0.9, 0.0): _run(case, opa, 0.9, 0.0, 'constant_tau'),
        ('ct', 0.9, 0.85): _run(case, opa, 0.9, 0.85, 'constant_tau'),
        ('ct', 0.98, 0.85): _run(case, opa, 0.98, 0.85, 'constant_tau'),
    }
    expect = {
        ('ray', 0.999999, 0.0): 0.731,
        ('ct', 0.999999, 0.0): 0.595,
        ('ct', 0.9, 0.0): 0.304,
        ('ct', 0.9, 0.85): 0.092,
        ('ct', 0.98, 0.85): 0.265,
    }
    for k, v in expect.items():
        assert abs(got[k] - v) < 2e-3, (k, got[k], v)
