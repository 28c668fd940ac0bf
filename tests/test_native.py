"""C++ fast loader (picaso_tpu.native): build, parity, fallback."""

import numpy as np
import pytest

from picaso_tpu import native
from picaso_tpu.opacities import db as dbmod, factory


@pytest.fixture(scope='module')
def small_db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('ndb') / 'small.db')
    wno = np.linspace(1000.0, 12000.0, 300)
    factory.build_synthetic_db(path, wno, ntemp=6, npress=5)
    return path


def test_native_builds():
    assert native.available(), 'g++ + libsqlite3 expected in this image'


def test_native_python_parity(small_db):
    g_nat = dbmod.load_opacity_db(small_db, native=True)
    g_py = dbmod.load_opacity_db(small_db, native=False)
    np.testing.assert_array_equal(np.asarray(g_nat.log_kappa),
                                  np.asarray(g_py.log_kappa))
    np.testing.assert_array_equal(np.asarray(g_nat.cont_opa),
                                  np.asarray(g_py.cont_opa))
    assert g_nat.molecules == g_py.molecules


def test_native_window_resample_parity(small_db):
    kw = dict(wave_range=[1.0, 5.0], resample=2)
    g_nat = dbmod.load_opacity_db(small_db, native=True, **kw)
    g_py = dbmod.load_opacity_db(small_db, native=False, **kw)
    np.testing.assert_array_equal(np.asarray(g_nat.log_kappa),
                                  np.asarray(g_py.log_kappa))


def test_native_direct_api(small_db):
    out = native.load_molecular(small_db, ['H2O'], 30,
                                np.arange(10), resample=1)
    if out is not None:
        assert out.shape == (1, 30, 10)
        assert np.isfinite(out).all()


def test_missing_molecule_keeps_fill(small_db):
    out = native.load_molecular(small_db, ['NOT_A_MOL'], 30, np.arange(5))
    if out is not None:
        assert (out == -50.0).all()
