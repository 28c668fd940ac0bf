"""Opacity database layer: sqlite round-trip + on-device interpolation."""

import numpy as np
import jax.numpy as jnp
import pytest

from picaso_tpu.opacities import factory
from picaso_tpu.opacities.db import (interp_molecular, load_opacity_db,
                                     nearest_continuum, AVOGADRO)


@pytest.fixture(scope='module')
def small_db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('opa') / 'synthetic.db')
    wno = np.linspace(5000.0, 15000.0, 64)
    factory.build_synthetic_db(path, wno, ntemp=6, npress=5)
    return path, wno


def test_load_roundtrip(small_db):
    path, wno = small_db
    grid = load_opacity_db(path)
    assert grid.molecules == ('CH4', 'CO', 'H2O', 'NH3')
    assert grid.continuum_molecules == ('H2H2', 'H2He')
    np.testing.assert_allclose(np.asarray(grid.wno), wno)
    assert grid.log_kappa.shape == (4, 30, 64)


def test_interp_exact_at_grid_points(small_db):
    path, _ = small_db
    grid = load_opacity_db(path)
    temps, pressures = factory.default_pt_grid(6, 5)
    # query exactly at an interior grid node -> weights {0,1}, exact value
    t_q = np.array([temps[2]])
    p_q = np.array([pressures[3]])
    kappa = np.asarray(interp_molecular(grid, jnp.asarray(t_q),
                                        jnp.asarray(p_q)))
    sigma = factory.synthetic_cross_sections('H2O',
                                             np.asarray(grid.wno),
                                             temps, pressures)
    im = grid.molecules.index('H2O')
    np.testing.assert_allclose(kappa[im, 0] / AVOGADRO, sigma[2, 3],
                               rtol=2e-4)


def test_interp_bilinear_between_points(small_db):
    path, _ = small_db
    grid = load_opacity_db(path)
    temps, pressures = factory.default_pt_grid(6, 5)
    # midpoint in 1/T between nodes 1,2 and log10P between nodes 2,3
    t_inv_mid = 0.5 * (1 / temps[1] + 1 / temps[2])
    p_log_mid = 0.5 * (np.log10(pressures[2]) + np.log10(pressures[3]))
    t_q, p_q = np.array([1 / t_inv_mid]), np.array([10 ** p_log_mid])
    kappa = np.asarray(interp_molecular(grid, jnp.asarray(t_q),
                                        jnp.asarray(p_q)))
    sigma = factory.synthetic_cross_sections('CH4', np.asarray(grid.wno),
                                             temps, pressures)
    logs = np.log10(np.where(sigma > 0, sigma, 1e-50))
    expect = 10 ** (0.25 * (logs[1, 2] + logs[2, 2]
                            + logs[1, 3] + logs[2, 3])) * AVOGADRO
    im = grid.molecules.index('CH4')
    np.testing.assert_allclose(kappa[im, 0], expect, rtol=2e-3)


def test_temperature_clamps_to_grid_edges(small_db):
    path, _ = small_db
    grid = load_opacity_db(path)
    # far below / above the grid: must not produce NaN, extrapolates
    kappa = np.asarray(interp_molecular(
        grid, jnp.asarray([10.0, 9000.0]), jnp.asarray([1.0, 1.0])))
    assert np.isfinite(kappa).all()


def test_continuum_nearest_temperature(small_db):
    path, _ = small_db
    grid = load_opacity_db(path)
    cia_temps = np.asarray(grid.cia_temps)
    t_q = jnp.asarray([cia_temps[3] + 1.0])  # nearest is index 3
    cont = np.asarray(nearest_continuum(grid, t_q))
    np.testing.assert_allclose(cont[:, 0, :],
                               np.asarray(grid.cont_opa)[:, 3, :])


def test_in_memory_grid_matches_sqlite(small_db):
    path, wno = small_db
    grid_sql = load_opacity_db(path)
    grid_mem = factory.synthetic_opacity_grid(
        wno, molecules=grid_sql.molecules, ntemp=6, npress=5)
    np.testing.assert_allclose(np.asarray(grid_sql.log_kappa),
                               np.asarray(grid_mem.log_kappa), atol=1e-5)


def test_interp_molecular_nearest(small_db):
    """Nearest-neighbor variant picks exact grid values at grid nodes and
    the closest corner off-node (optics.py:2310 get_opacities_nearest)."""
    from picaso_tpu.opacities.db import (interp_molecular,
                                         interp_molecular_nearest,
                                         load_opacity_db)

    path, _ = small_db
    grid = load_opacity_db(path)
    temps = 1.0 / np.asarray(grid.pt.t_inv_grid)
    press = 10.0 ** np.asarray(grid.pt.p_log_grid)
    # exactly on a grid node both interps agree
    t0 = jnp.asarray([temps[2]])
    p0 = jnp.asarray([press[3]])
    a = np.asarray(interp_molecular(grid, t0, p0))
    b = np.asarray(interp_molecular_nearest(grid, t0, p0))
    np.testing.assert_allclose(b, a, rtol=2e-5)
    # slightly off-node the nearest variant returns the node value
    t1 = jnp.asarray([temps[2] * 1.01])
    p1 = jnp.asarray([press[3] * 1.02])
    c = np.asarray(interp_molecular_nearest(grid, t1, p1))
    np.testing.assert_allclose(c, b, rtol=2e-5)
