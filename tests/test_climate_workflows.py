"""Disequilibrium, cloudy, and moist climate workflows (small/fast cases)."""

import numpy as np
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities.ck import synthetic_ck_table


def _setup_case(teff=700, nlevel=31, moist=False):
    ck = synthetic_ck_table(with_per_gas=True)
    opa = jdi.opannection(ck_table=ck)
    case = jdi.inputs(calculation='browndwarf', climate=True)
    case.effective_temp(teff)
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    pressure = np.logspace(-4, 2.5, nlevel)
    temp_guess = np.clip(teff * 1.2 * (pressure / 30) ** 0.1, 250, None)
    case.inputs_climate(temp_guess=temp_guess, pressure=pressure,
                        rcb_guess=28, rfacv=0.0, moistgrad=moist)
    return opa, case


@pytest.mark.slow
def test_diseq_climate_runs():
    opa, case = _setup_case()
    case.inputs['approx']['chem_params']['quench'] = True
    out = case.climate(opa, diseq_chem=True, verbose=False)
    temp = out['temperature']
    assert np.isfinite(temp).all()
    assert (np.diff(temp[5:]) > -1e-6).all()
    assert 'kzz' in out
    assert np.isfinite(out['kzz']).all() and (out['kzz'] > 0).all()


@pytest.mark.slow
def test_cloudy_climate_runs():
    opa, case = _setup_case(teff=400)
    case.inputs['climate']['cloudy'] = True
    case.inputs['climate']['virga_kwargs'] = {
        'condensates': ['H2O'], 'fsed': 3.0, 'mh': 1.0, 'mmw': 2.2}
    out = case.climate(opa, verbose=False)
    assert np.isfinite(out['temperature']).all()
    assert 'cld_df' in out
    assert out['cld_df']['opd'].sum() >= 0


@pytest.mark.slow
def test_moist_climate_runs():
    opa, case = _setup_case(teff=350, moist=True)
    out = case.climate(opa, verbose=False)
    assert np.isfinite(out['temperature']).all()
