"""Plotting tail (contribution heatmaps, rt_heatmap) + data fetcher."""

import os
import tarfile

import matplotlib
import numpy as np
import pandas as pd
import pytest

matplotlib.use('Agg')

from picaso_tpu import justdoit as jdi
from picaso_tpu import justplotit as jpi
from picaso_tpu.opacities import factory


@pytest.fixture(scope='module')
def run(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('plot') / 'syn.db')
    wno = np.linspace(2000.0, 12000.0, 150)
    factory.build_synthetic_db(path, wno, ntemp=6, npress=5)
    opa = jdi.opannection(filename_db=path)
    case = jdi.inputs()
    case.phase_angle(0)
    case.gravity(mass=1.0, mass_unit=jdi.u.Unit('M_jup'),
                 radius=1.1, radius_unit=jdi.u.Unit('R_jup'))
    case.star(opa, 5700, 0.0, 4.4, radius=1.0,
              radius_unit=jdi.u.Unit('R_sun'), semi_major=0.05,
              semi_major_unit=jdi.u.Unit('au'))
    case.approx(p_reference=1.0)
    case.atmosphere(filename=jdi.jupiter_pt(), sep=r'\s+')
    df = case.spectrum(opa, calculation='thermal+transmission',
                       full_output=True)
    return opa, case, df


def test_full_output_carries_taus(run):
    _, _, df = run
    fo = df['full_output']
    nlayer = len(fo['layer']['pressure'])
    for k in ('taugas', 'taucld', 'tauray'):
        assert fo[k].shape[0] == nlayer
        assert fo[k].ndim == 3
    assert np.isfinite(fo['taugas']).all()
    assert (fo['taugas'] >= 0).all()


def test_thermal_contribution_plot(run):
    _, _, df = run
    fo = dict(df['full_output'])
    fo['wavenumber'] = df['wavenumber']
    fig, ax, CF = jpi.thermal_contribution(fo, R=20)
    assert np.isfinite(CF).all() and (CF >= 0).all()
    # the contribution peaks at sensible pressures (not at the edges
    # everywhere)
    peak_layers = CF.argmax(axis=0)
    assert peak_layers.max() > 0
    jpi.plot_format(ax)


def test_transmission_contribution_plot(run):
    _, _, df = run
    fo = dict(df['full_output'])
    fo['wavenumber'] = df['wavenumber']
    fig, ax, um, CF = jpi.transmission_contribution(fo, R=20)
    # normalized per wavelength
    np.testing.assert_allclose(CF.sum(axis=0), 1.0, atol=1e-6)


def test_molecule_contribution_plot(run):
    opa, case, _ = run
    contrib = jdi.get_contribution(case, opa, at_tau=1)
    fig = jpi.molecule_contribution(contrib, opa, min_pressure=1000.0,
                                    R=50)
    assert fig is not None


def test_rt_heatmap(run):
    data = pd.DataFrame(np.random.default_rng(0).normal(size=(4, 5)),
                        index=[0.0, 0.3, 0.6, 0.9],
                        columns=[0.1, 0.3, 0.5, 0.7, 0.9])
    fig = jpi.rt_heatmap(data, figure_kwargs={'title': 'pct diff'})
    assert fig is not None


def test_explore():
    d = {'a': {'b': {'w0': [1, 2]}}}
    assert jpi.explore(d, 'w0') == [1, 2]
    with pytest.raises(KeyError):
        jpi.explore(d, 'nope')


def test_get_data_file_url(tmp_path):
    """Exercise the download+extract path against a file:// mirror
    (no egress in CI)."""
    from picaso_tpu.data import get_data

    src = tmp_path / 'src'
    src.mkdir()
    (src / 'hello.txt').write_text('payload')
    tgz = tmp_path / 'bundle.tar.gz'
    with tarfile.open(tgz, 'w:gz') as tf:
        tf.add(src / 'hello.txt', arcname='hello.txt')
    plain = tmp_path / 'table.csv'
    plain.write_text('a,b\n1,2\n')

    dest = tmp_path / 'dest'
    catalog = {'test': {'default': {
        'description': 'local mirror',
        'default_destination': str(dest),
        'url': {'bundle.tar.gz': f'file://{tgz}',
                'table.csv': f'file://{plain}'}}}}
    out = get_data('test', catalog=catalog, progress=False)
    assert len(out) == 2
    assert (dest / 'hello.txt').read_text() == 'payload'
    assert (dest / 'table.csv').exists()


def test_data_bootstrap_helpers(tmp_path):
    """check_default_opacity / get_reference (data.py bootstrap)."""
    import os

    from picaso_tpu import data
    from picaso_tpu.opacities.factory import build_synthetic_db
    import numpy as np

    ref = tmp_path / 'refdata'
    out = data.get_reference(str(ref))
    assert os.path.exists(os.path.join(out, 'config.json'))
    with pytest.raises(FileExistsError):
        data.get_reference(str(ref))

    assert data.check_default_opacity(str(ref), verbose=False) is None
    dbdir = ref / 'opacities'
    build_synthetic_db(str(dbdir / 'opacities.db'),
                       np.linspace(1000, 5000, 40))
    found = data.check_default_opacity(str(ref), verbose=False)
    assert found and found.endswith('opacities.db')
