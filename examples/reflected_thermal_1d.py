"""1D reflected + thermal spectrum of a warm Jupiter (quick start).

Runs entirely from the bundled synthetic opacity database so it needs no
downloads; swap ``synthetic_db_path`` for a real Zenodo sqlite DB path to
reproduce the reference's science results (justdoit.py quickstart flow).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from picaso_tpu import justdoit as jdi

# --- opacities: synthetic DB written on the fly (reference sqlite schema)
from picaso_tpu.opacities.factory import build_synthetic_db
import tempfile, os

db = os.path.join(tempfile.mkdtemp(), 'synthetic_opacities.db')
build_synthetic_db(db, wno=np.linspace(1e4 / 2.0, 1e4 / 0.4, 2000),
                   molecules=('H2O', 'CH4', 'CO2'))
opa = jdi.opannection(filename_db=db)

# --- scene
case = jdi.inputs()
case.phase_angle(0)
case.gravity(gravity=25.0, gravity_unit=jdi.u.Unit('m/(s**2)'))
case.star(opa, 5800.0, 0.0122, 4.437, radius=1.0,
          radius_unit=jdi.u.Unit('Rsun'), semi_major=0.05,
          semi_major_unit=jdi.u.Unit('au'))

nlevel = 41
pressure = np.logspace(-6, 2, nlevel)
temperature = np.clip(1100.0 * (pressure / 10.0) ** 0.1, 250.0, None)
case.atmosphere(df=jdi.pd.DataFrame({
    'pressure': pressure, 'temperature': temperature,
    'H2': 0.84, 'He': 0.15, 'H2O': 1e-3, 'CH4': 3e-4, 'CO2': 1e-6}))

# box-model cloud deck
case.clouds(g0=[0.85], w0=[0.90], opd=[0.5], p=[0.0], dp=[1.0])

df = case.spectrum(opa, calculation='reflected+thermal', full_output=True)
wno, albedo, thermal = df['wavenumber'], df['albedo'], df['thermal']

wno_bin, alb_bin = jdi.mean_regrid(wno, albedo, R=150)
print('geometric albedo @ 0.55um:',
      float(np.interp(1e4 / 0.55, wno_bin, alb_bin)))
print('thermal flux peak [erg/cm2/s/cm-1]:', float(np.max(thermal)))
assert np.isfinite(albedo).all() and np.isfinite(thermal).all()
