"""Batched 1D phase curve: every phase in ONE fused XLA program.

The reference computes phase curves with a joblib loop over phases
(justdoit.py:4741-4777); here the phase axis is a vmapped batch of the
fused pipeline — one dispatch for the whole curve, shardable over a
device mesh 'batch' axis (see tests/test_phase_curve.py for the 8-device
equivalence check).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities import factory

db = '/tmp/example_pc_syn.db'
if not os.path.exists(db):
    wno = np.linspace(2000.0, 12000.0, 2000)
    factory.build_synthetic_db(db, wno, ntemp=8, npress=6)

opa = jdi.opannection(filename_db=db)
case = jdi.inputs()
case.gravity(mass=1.0, mass_unit=jdi.u.Unit('M_jup'),
             radius=1.1, radius_unit=jdi.u.Unit('R_jup'))
phases = np.linspace(0, np.pi * 0.9, 8)
case.phase_curve_geometry('reflected', phases, num_gangle=6, num_tangle=6)
case.star(opa, 5700, 0.0, 4.4, radius=1.0,
          radius_unit=jdi.u.Unit('R_sun'), semi_major=0.05,
          semi_major_unit=jdi.u.Unit('au'))
case.atmosphere(filename=jdi.jupiter_pt(), sep=r'\s+')

t0 = time.time()
out = case.phase_curve(opa, verbose=False, batched=True)
t_batched = time.time() - t0
t0 = time.time()
out_serial = case.phase_curve(opa, verbose=False, batched=False)
t_serial = time.time() - t0

curve = [float(np.nanmean(out[p]['fpfs_reflected'])) for p in out]
print('phase(rad) -> <fpfs>:')
for p, c in zip(out, curve):
    print(f'  {p:5.2f} -> {c:.3e}')
assert curve[0] > curve[-1], 'fpfs should fall toward quadrature+'
mx = max(abs(np.asarray(out[p]['albedo'])
             - np.asarray(out_serial[p]['albedo'])).max() for p in out)
print(f'batched {t_batched:.1f}s vs serial {t_serial:.1f}s '
      f'(incl. compiles); max |d albedo| = {mx:.2e}')
assert mx < 1e-3
print('OK')
