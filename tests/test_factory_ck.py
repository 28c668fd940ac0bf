"""Opacity-factory CK generation: k-distribution correctness + the CK
spectrum reproducing the binned monochromatic spectrum."""

import numpy as np
import pandas as pd
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities import factory
from picaso_tpu.opacities.ck import double_gauss_points, load_ck_db
from picaso_tpu.wavelength import mean_regrid


def test_k_distribution_preserves_mean():
    """Integral of the k-distribution over g = bin-mean cross section."""
    gauss_pts, gauss_wts = double_gauss_points()
    rng = np.random.default_rng(0)
    wno = np.linspace(1000, 2000, 400)
    sigma = 10 ** rng.uniform(-26, -21, (1, 400))
    edges = np.array([1000.0, 1500.0, 2000.0001])
    kd = factory.compute_k_distribution(sigma, wno, edges, gauss_pts)
    for b, sel in enumerate([(wno >= 1000) & (wno < 1500),
                             (wno >= 1500)]):
        mean_direct = sigma[0, sel].mean()
        mean_kd = gauss_wts @ kd[0, b]
        np.testing.assert_allclose(mean_kd, mean_direct, rtol=0.05)
    # monotonic non-decreasing in g
    assert (np.diff(kd, axis=-1) >= 0).all()


@pytest.fixture(scope='module')
def mono_db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('opa') / 'mono.db')
    wno = np.linspace(300.0, 10300.0, 2000)
    factory.build_synthetic_db(path, wno, ntemp=8, npress=6)
    return path, wno


def test_ck_generation_roundtrip(mono_db, tmp_path):
    path, wno = mono_db
    edges = np.linspace(300.0, 10300.0, 41)
    abunds = {'H2O': 1e-3, 'CH4': 5e-4, 'CO': 3e-4, 'NH3': 1e-4}
    ck = factory.compute_sum_molecular(path, abunds, edges)
    assert ck['kcoeffs'].shape == (6, 8, 40, 8)
    fn = str(tmp_path / 'premixed.hdf5')
    factory.write_ck_hdf5(fn, ck, list(abunds), abunds)
    # (load_ck_db requires a continuum DB on the same grid; the bundled one
    # is 196-pt, so verify the written format directly)
    import h5py
    with h5py.File(fn, 'r') as f:
        assert list(f['ck_molecules'])[0].decode() == 'H2O'
        np.testing.assert_allclose(f['kcoeffs'][:], ck['kcoeffs'])
        assert f['abunds'].shape == (48, 4)


def test_ck_premixed_sum_with_chemistry_grid(mono_db, tmp_path):
    """Premixed-sum builder with a per-(P, T) chemistry table — the
    reference compute_sum_molecular pathway (opacity_factory.py:1530)."""
    import pandas as pd

    path, wno = mono_db
    edges = np.linspace(300.0, 10300.0, 21)
    flat = {'H2O': 1e-3, 'CH4': 5e-4}
    ck_flat = factory.compute_sum_molecular(path, flat, edges)

    # a chemistry grid matching the DB's (T-major) PT points, with
    # CONSTANT abundances must reproduce the scalar-dict result exactly
    temps, press = ck_flat['temps'], ck_flat['pressures']
    rows = [{'temperature': t, 'pressure': p, **flat}
            for t in temps for p in press]
    chem = pd.DataFrame(rows)
    ck_grid = factory.compute_sum_molecular(path, chem, edges)
    np.testing.assert_allclose(ck_grid['kcoeffs'], ck_flat['kcoeffs'])

    # T-dependent abundances must change the mixture where they differ
    chem2 = chem.copy()
    chem2.loc[chem2['temperature'] > temps[len(temps) // 2], 'H2O'] = 1e-8
    ck_var = factory.compute_sum_molecular(path, chem2, edges)
    assert not np.allclose(ck_var['kcoeffs'], ck_flat['kcoeffs'])
    # ...and only at the modified temperatures
    cold = temps <= temps[len(temps) // 2]
    np.testing.assert_allclose(ck_var['kcoeffs'][:, cold],
                               ck_flat['kcoeffs'][:, cold])

    # the per-PT chemistry rides into the written table
    fn = str(tmp_path / 'premixed_grid.hdf5')
    factory.write_ck_hdf5(fn, ck_var, list(flat), chem2)
    import h5py
    with h5py.File(fn, 'r') as f:
        assert f['abunds'].shape == (len(temps) * len(press), 2)
        assert np.asarray(f['abunds'][:, 0]).min() == 1e-8


def test_ck_thermal_matches_binned_monochromatic(mono_db):
    """Thermal spectrum through generated CK tables ~ binned mono spectrum.

    The core validity check of the correlated-k machinery: bin-integrated
    thermal flux from the k-distribution should track the mean of the
    monochromatic flux in each bin.
    """
    path, wno = mono_db
    opa_mono = jdi.opannection(filename_db=path)

    edges = np.linspace(300.0, 10300.0, 41)
    abunds = {'H2O': 1e-3, 'CH4': 5e-4, 'CO': 3e-4, 'NH3': 1e-4}
    ck = factory.compute_sum_molecular(path, abunds, edges)

    # wrap the generated table in a CKTable with a matching synthetic
    # continuum (zero continuum keeps the comparison purely molecular)
    import jax.numpy as jnp
    from picaso_tpu.opacities.ck import CKArrays, CKTable
    ngauss = len(ck['gauss_pts'])
    arrays = CKArrays(
        wno=jnp.asarray(ck['wno']), delta_wno=jnp.asarray(ck['delta_wno']),
        gauss_wts=jnp.asarray(ck['gauss_wts']),
        ln_kappa=jnp.asarray(ck['kcoeffs']),
        p_log_grid=jnp.asarray(np.log10(ck['pressures'])),
        t_inv_grid=jnp.asarray(1.0 / ck['temps']),
        nc_p=jnp.asarray(np.full(len(ck['temps']), len(ck['pressures'])),
                         jnp.int32),
        cont_opa=jnp.zeros((0, 2, len(ck['wno']))),
        cia_temps=jnp.asarray([100.0, 3000.0]),
        continuum_molecules=())
    rows = []
    for T in ck['temps']:
        for P in ck['pressures']:
            rows.append({**abunds, 'H2': 0.84, 'He': 0.155,
                         'temperature': T, 'pressure': P})
    table = CKTable(arrays, list(abunds), pd.DataFrame(rows),
                    ck['gauss_pts'], ck['temps'], ck['pressures'])
    opa_ck = jdi.opannection(ck_table=table)

    def run(opa):
        case = jdi.inputs(calculation='browndwarf')
        case.phase_angle(0)
        case.gravity(gravity=300, gravity_unit=jdi.u.Unit('m/(s**2)'))
        nlevel = 40
        pressure = np.logspace(-4, 2, nlevel)
        case.atmosphere(df=pd.DataFrame({
            'pressure': pressure,
            'temperature': np.clip(1300 * (pressure / 30) ** 0.1, 400,
                                   None),
            'H2O': np.zeros(nlevel) + abunds['H2O'],
            'CH4': np.zeros(nlevel) + abunds['CH4'],
            'CO': np.zeros(nlevel) + abunds['CO'],
            'NH3': np.zeros(nlevel) + abunds['NH3'],
            'H2': np.zeros(nlevel) + 0.84,
            'He': np.zeros(nlevel) + 0.155}))
        return case.spectrum(opa, calculation='thermal')

    out_mono = run(opa_mono)
    out_ck = run(opa_ck)
    _, mono_binned = mean_regrid(out_mono['wavenumber'],
                                 out_mono['thermal'], newx=ck['wno'])
    ck_flux = out_ck['thermal']
    sel = np.isfinite(mono_binned) & (mono_binned > 0)
    ratio = ck_flux[sel] / mono_binned[sel]
    # k-distribution vs line-by-line: agree to ~10% median, 35% worst-bin
    assert abs(np.median(ratio) - 1) < 0.1, np.median(ratio)
    assert np.percentile(np.abs(ratio - 1), 95) < 0.35


def test_legacy_ascii_roundtrip(tmp_path):
    """Token-stream legacy 1460 parser inverts the layout writer."""
    from picaso_tpu.opacities import legacy

    rng = np.random.default_rng(11)
    max_pc, max_tc, nwno, ngauss = 4, 5, 10, 8
    mols = [f'M{i}' for i in range(24)]
    npt = max_pc * max_tc
    abunds = rng.uniform(1e-8, 1e-2, (npt, 7))
    wno = np.linspace(100.0, 1000.0, nwno)
    dwno = np.full(nwno, 90.0)
    nc_p = np.full(max_tc, max_pc)
    press = np.repeat(np.logspace(-3, 2, max_pc)[None, :], max_tc,
                      0).ravel()
    temps = np.linspace(100.0, 3000.0, max_tc)
    gpts = np.linspace(0.1, 0.9, ngauss)
    gwts = np.full(ngauss, 1.0 / ngauss)
    kappa = rng.uniform(-8.0, 2.0, (max_pc, max_tc, nwno, ngauss))

    f = tmp_path / 'ascii_data'
    legacy.write_legacy_ascii(str(f), mols, abunds, wno, dwno, nc_p,
                              press, temps, gpts, gwts, kappa)
    out = legacy.load_legacy_ck_1460(str(f), max_tc=max_tc, max_pc=max_pc,
                                     max_windows=nwno + 4, nspecies=24)
    assert out['molecules'] == mols
    np.testing.assert_allclose(out['wno'], wno)
    np.testing.assert_allclose(out['delta_wno'], dwno)
    np.testing.assert_allclose(out['pressures'], press, rtol=1e-12)
    np.testing.assert_allclose(out['temps'], temps)
    np.testing.assert_allclose(out['gauss_pts'], gpts)
    np.testing.assert_allclose(out['gauss_wts'], gwts)
    np.testing.assert_allclose(out['kappa'], kappa)
    np.testing.assert_allclose(out['abunds'][:, :7], abunds)
    np.testing.assert_allclose(out['pressure_labels'],
                               press[press > 0])


def test_resortrebin_connection(tmp_path):
    """method='resortrebin': per-gas hdf5 dir -> gasesfly CK spectra."""
    import h5py
    import jax.numpy as jnp
    from picaso_tpu.opacities.ck import load_ck_db, ck_taugas
    from picaso_tpu.opacities.resortrebin import synthetic_per_gas_tables
    from picaso_tpu.opacities.factory import default_pt_grid
    from picaso_tpu.opacities.db import connect
    from picaso_tpu.refdata import refdata_path

    cur, conn = connect(refdata_path('opacities',
                                     'ck_cx_cont_opacities.db'))
    cur.execute('SELECT wavenumber_grid FROM header')
    wno = cur.fetchone()[0]
    conn.close()
    mols = ('H2O', 'CH4')
    tables, meta = synthetic_per_gas_tables(wno, molecules=mols,
                                            ntemp=6, npress=5)
    temps, press = meta['temps'], meta['pressures']
    wno = np.asarray(wno, float)
    delta_wno = np.gradient(wno)
    for i, m in enumerate(mols):
        with h5py.File(tmp_path / f'{m}_1460.hdf5', 'w') as f:
            f['kcoeffs'] = np.asarray(tables[i])
            f['wno'] = wno
            f['delta_wno'] = delta_wno
            f['pressures'] = np.tile(press, len(temps))
            f['temperatures'] = np.repeat(temps, len(press))
            f['gauss_pts'] = meta['gauss_pts']
            f['gauss_wts'] = meta['gauss_wts']
            f['nc_p'] = np.full(len(temps), len(press))

    ck = load_ck_db(str(tmp_path), method='resortrebin',
                    preload_gases=list(mols))
    assert ck.per_gas is not None and ck.per_gas_molecules == list(mols) \
        or tuple(ck.per_gas_molecules) == mols

    from picaso_tpu.atmosphere import build_atmosphere
    nlevel = 15
    prof = {'pressure': np.logspace(-4, 2, nlevel),
            'temperature': np.clip(900 * (np.logspace(-4, 2, nlevel)
                                          / 10) ** 0.1, 300, None),
            'H2': np.full(nlevel, 0.85), 'He': np.full(nlevel, 0.14),
            'H2O': np.full(nlevel, 1e-3), 'CH4': np.full(nlevel, 3e-4)}
    atm = build_atmosphere(prof, gravity=1e4, wno=np.asarray(wno))
    taugas = np.asarray(ck_taugas(ck, atm))
    assert taugas.shape == (ck.ngauss, nlevel - 1, len(wno))
    assert np.isfinite(taugas).all() and (taugas >= 0).all()
    # doubling H2O must increase opacity in the H2O band
    prof2 = dict(prof, H2O=np.full(nlevel, 5e-3))
    atm2 = build_atmosphere(prof2, gravity=1e4, wno=np.asarray(wno))
    t2 = np.asarray(ck_taugas(ck, atm2))
    assert t2.sum() > taugas.sum()
