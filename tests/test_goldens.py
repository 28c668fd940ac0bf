"""Golden-file regression vs the reference's published basecase spectra.

Mirror of the reference's primary regression test
(tests/test_notebooks.py:55-143): the full Jupiter reflected-light
pipeline asserted at atol=0.01 against
refdata/base_cases/testing/reflected_1d_basecase.csv (regridded to
R=150).  Like the reference test, it needs the production R=15k
monochromatic opacity database (a ~7 GB download) — skipped when no
``opacities.db`` is installed, exactly as the reference's suite cannot
run without the download.
"""

import os

import numpy as np
import pandas as pd
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.refdata import external_refdata, refdata_path


def _production_db():
    ext = external_refdata()
    if ext is None:
        return None
    p = os.path.join(ext, 'opacities', 'opacities.db')
    return p if os.path.exists(p) else None


requires_db = pytest.mark.skipif(
    _production_db() is None,
    reason='production opacity DB not installed (set picaso_refdata and '
           'run picaso_tpu.data.get_data("resampled_opacity"))')


@requires_db
def test_reflected_1d_golden():
    opacity = jdi.opannection(wave_range=[0.3, 1],
                              filename_db=_production_db())
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.star(opacity, 5000, 0, 4.0)
    case.atmosphere(filename=jdi.jupiter_pt(), sep=r'\s+')
    df = case.spectrum(opacity)
    wno, alb = jdi.mean_regrid(df['wavenumber'], df['albedo'], R=150)

    golden = pd.read_csv(refdata_path('base_cases', 'testing',
                                      'reflected_1d_basecase.csv'))
    assert np.allclose(golden['albedo'], alb, atol=0.01)

    case.star(opacity, 5000, 0, 4.0, semi_major=1,
              semi_major_unit=jdi.u.Unit('au'))
    case.gravity(radius=1, radius_unit=jdi.u.Unit('R_jup'),
                 mass=1, mass_unit=jdi.u.Unit('M_jup'))
    df = case.spectrum(opacity)
    _, fpfs = jdi.mean_regrid(df['wavenumber'], df['fpfs_reflected'], R=150)
    assert np.allclose(golden['fpfs'], fpfs, atol=0.01)

    n = 60
    case.atmosphere(df=pd.DataFrame({
        'pressure': np.logspace(-6, 2, n),
        'temperature': np.zeros(n) + 200,
        'H2': np.zeros(n) + 0.837, 'He': np.zeros(n) + 0.163,
        'CH4': np.zeros(n) + 0.000466}))
    df = case.spectrum(opacity)
    _, alb_ch4 = jdi.mean_regrid(df['wavenumber'], df['albedo'], R=150)
    assert np.allclose(golden['albedo_ch4'], alb_ch4, atol=0.01)

    case.atmosphere(filename=jdi.jupiter_pt(), exclude_mol='H2O',
                    sep=r'\s+')
    df = case.spectrum(opacity)
    _, alb_now = jdi.mean_regrid(df['wavenumber'], df['albedo'], R=150)
    assert np.allclose(golden['albedo_nowater'], alb_now, atol=0.01,
                       equal_nan=True)


def test_golden_file_bundled():
    """The golden CSV itself ships with the package (so the test above is
    ready the moment a DB is installed)."""
    golden = pd.read_csv(refdata_path('base_cases', 'testing',
                                      'reflected_1d_basecase.csv'))
    for col in ('wavenumber', 'albedo', 'fpfs', 'albedo_ch4',
                'albedo_nowater'):
        assert col in golden.columns
    assert len(golden) > 50
