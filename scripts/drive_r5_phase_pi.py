"""Verify drive: phase = pi reflected geometry through the user API (TPU).

Run from the repo root as ``python - < scripts/drive_r5_phase_pi.py``.
"""
import os
import tempfile

import numpy as np

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities import factory

db = os.path.join(tempfile.gettempdir(), 'drive_r5_syn.db')
if not os.path.exists(db):
    factory.build_synthetic_db(db, np.linspace(1000.0, 12000.0, 120),
                               ntemp=8, npress=6)
opa = jdi.opannection(filename_db=db)
case = jdi.inputs()
case.phase_angle(np.pi, num_gangle=6, num_tangle=6)
case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
case.star(opa, 5700, 0.0, 4.4, radius=1.0, radius_unit=jdi.u.Unit('Rsun'),
          semi_major=5.2, semi_major_unit=jdi.u.Unit('au'))
case.atmosphere(filename=jdi.jupiter_pt(), sep=r'\s+')
out = case.spectrum(opa, calculation='reflected')
alb = np.asarray(out['albedo'])
assert np.all(np.isfinite(alb)), 'NaN albedo at phase=pi'
# new moon: only the dark hemisphere faces the observer -> ~zero albedo
print('phase=pi albedo: max', float(alb.max()), 'min', float(alb.min()))
case.phase_angle(2.5, num_gangle=6, num_tangle=6)
out2 = case.spectrum(opa, calculation='reflected')
alb2 = np.asarray(out2['albedo'])
assert np.all(np.isfinite(alb2))
print('phase=2.5 albedo: max', float(alb2.max()))
print('OK')
