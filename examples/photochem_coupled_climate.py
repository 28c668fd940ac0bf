"""Photochemistry-coupled 1D climate (kinetics inside the RCE loop).

Equivalent of the reference's self-consistent photochem climate
(climate.py:3107-3109 + photochem.py:132): every profile iteration runs
chemical kinetics to steady state, warm-started from the previous
solution, and the climate opacities are rebuilt from the kinetic
abundances.  The external ``photochem`` package (Fortran) provides the
kinetics in production; this example falls back to a mock with the same
``run_for_picaso`` interface when it is not installed, so the coupled
loop itself is exercised either way.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities.ck import synthetic_ck_table
from picaso_tpu.photochem import photochem_available

opa_ck = jdi.opannection(ck_table=synthetic_ck_table(with_per_gas=True),
                         method='preweighted')

case = jdi.inputs(calculation='brown', climate=True)
case.phase_angle(0)
case.gravity(gravity=100.0, gravity_unit=jdi.u.Unit('m/(s**2)'))
case.effective_temp(700.0)
case.setup_nostar()
case.setup_climate()

nlevel = 31
pressure = np.logspace(-4, 2.5, nlevel)
guess = np.clip(700.0 * (pressure / 10.0) ** 0.12, 250.0, 2800.0)
case.inputs_climate(temp_guess=guess, pressure=pressure,
                    rcb_guess=nlevel - 3, rfacv=0.0)

if photochem_available():
    case.atmosphere(df=__import__('pandas').DataFrame({
        'pressure': pressure, 'temperature': guess}),
        photochem_init_args=dict())
    pc = case.photochem_init()
else:
    print('photochem not installed -> driving the coupled loop with a '
          'mock kinetics backend')

    class MockKinetics:
        calls = 0

        def run_for_picaso(self, df, log10mh, cto, kz,
                           df_comp_guess=None, **kw):
            MockKinetics.calls += 1
            out = df.copy()
            if 'CH4' in out:   # freeze CH4 at its deep (quenched) value
                out['CH4'] = float(np.asarray(out['CH4'])[-1])
            return out

    pc = MockKinetics()
    case.inputs['climate']['pc'] = pc

out = case.climate(opa_ck, diseq_chem=True, verbose=False)

temp = out['temperature']
print(f'converged: {bool(out["converged"])}')
print(f'T range: {temp.min():.0f} - {temp.max():.0f} K')
print(f'kinetics solves during the climate run: '
      f'{getattr(pc, "calls", "n/a")}')
prof = case.inputs['atmosphere']['profile']
assert np.isfinite(temp).all()
if not photochem_available():
    assert MockKinetics.calls >= 2
    assert np.allclose(prof['CH4'], prof['CH4'].iloc[-1])
print('photochem-coupled climate OK')
