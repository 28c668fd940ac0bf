"""Free retrieval on synthetic transmission data (nested sampling).

Miniature of the reference's free-retrieval template
(retrieval.py:38 create_template / scripts/free_retrieval.py): draw
synthetic data from the forward model, then retrieve temperature and
H2O abundance with the framework's vectorized nested sampler.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from picaso_tpu import justdoit as jdi
from picaso_tpu.sampler import nested_sample
from picaso_tpu.opacities.factory import build_synthetic_db
import tempfile

db = os.path.join(tempfile.mkdtemp(), 'synthetic_opacities.db')
build_synthetic_db(db, wno=np.linspace(1e4 / 5.0, 1e4 / 1.0, 300),
                   molecules=('H2O', 'CH4'))
opa = jdi.opannection(filename_db=db)

nlevel = 21
pressure = np.logspace(-6, 2, nlevel)


def forward(tiso, log_h2o):
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(radius=1.2, radius_unit=jdi.u.Unit('Rjup'),
                 mass=0.8, mass_unit=jdi.u.Unit('Mjup'))
    case.star(opa, 5300.0, 0.0, 4.5, radius=0.9,
              radius_unit=jdi.u.Unit('Rsun'), semi_major=0.04,
              semi_major_unit=jdi.u.Unit('au'))
    case.atmosphere(df=jdi.pd.DataFrame({
        'pressure': pressure, 'temperature': np.full(nlevel, tiso),
        'H2': 0.86, 'He': 0.14, 'H2O': 10.0 ** log_h2o, 'CH4': 1e-4}))
    out = case.spectrum(opa, calculation='transmission')
    return np.asarray(out['transit_depth'])


truth = (1150.0, -3.2)
y_true = forward(*truth)
rng = np.random.default_rng(0)
err = 0.02 * y_true.mean()
y_obs = y_true + rng.normal(0, err, y_true.shape)


def loglike(theta):
    theta = np.atleast_2d(theta)
    out = np.empty(len(theta))
    for i, (t, lw) in enumerate(theta):
        out[i] = -0.5 * np.sum((forward(t, lw) - y_obs) ** 2 / err ** 2)
    return out


def prior(u):
    u = np.atleast_2d(u).copy()
    u[:, 0] = 800.0 + 800.0 * u[:, 0]      # T_iso
    u[:, 1] = -5.0 + 3.0 * u[:, 1]         # log H2O
    return u


res = nested_sample(loglike, prior, ndim=2, nlive=20, max_iter=60,
                    walks=5, seed=2)
post = res.samples_equal
med = np.median(post, axis=0)
print(f'truth T={truth[0]} logH2O={truth[1]}')
print(f'posterior medians T={med[0]:.0f} logH2O={med[1]:.2f} '
      f'logZ={res.logz:.1f}')
assert abs(med[0] - truth[0]) < 250
assert abs(med[1] - truth[1]) < 1.0
