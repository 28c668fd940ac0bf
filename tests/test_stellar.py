"""fits_lite parser + stellar grid loader on synthetic CDBS trees."""

import os

import numpy as np
import pytest


def _card(key, val):
    if isinstance(val, bool):
        v = 'T' if val else 'F'
        return f'{key:<8}= {v:>20}'.ljust(80)
    if isinstance(val, str):
        return f"{key:<8}= '{val}'".ljust(80)
    return f'{key:<8}= {val:>20}'.ljust(80)


def _pad(b, fill=b' '):
    n = (-len(b)) % 2880
    return b + fill * n


def write_bintable_fits(path, columns):
    """Tiny FITS writer (primary + one BINTABLE HDU) for tests."""
    names = list(columns)
    arrs = [np.asarray(columns[k]) for k in names]
    n = len(arrs[0])
    fmts, dts = [], []
    for a in arrs:
        if a.dtype.kind == 'f':
            fmts.append('1E')
            dts.append('>f4')
        else:
            fmts.append('1J')
            dts.append('>i4')
    rec = np.dtype({'names': names, 'formats': dts})
    data = np.zeros(n, rec)
    for k, a in zip(names, arrs):
        data[k] = a
    cards = [_card('SIMPLE', True), _card('BITPIX', 8),
             _card('NAXIS', 0), _card('EXTEND', True), 'END'.ljust(80)]
    primary = _pad(''.join(cards).encode('ascii'))
    cards = [_card('XTENSION', 'BINTABLE'), _card('BITPIX', 8),
             _card('NAXIS', 2), _card('NAXIS1', rec.itemsize),
             _card('NAXIS2', n), _card('PCOUNT', 0), _card('GCOUNT', 1),
             _card('TFIELDS', len(names))]
    for i, (name, fmt) in enumerate(zip(names, fmts), 1):
        cards += [_card(f'TTYPE{i}', name), _card(f'TFORM{i}', fmt)]
    cards += ['END'.ljust(80)]
    hdr = _pad(''.join(cards).encode('ascii'))
    with open(path, 'wb') as f:
        f.write(primary + hdr + _pad(data.tobytes(), b'\x00'))


def test_fits_roundtrip(tmp_path):
    from picaso_tpu.fits_lite import read_fits

    wave = np.linspace(3000.0, 30000.0, 50)
    g40 = np.linspace(1.0, 2.0, 50)
    f = tmp_path / 'x.fits'
    write_bintable_fits(str(f), {'WAVELENGTH': wave, 'g40': g40})
    hdus = read_fits(str(f))
    assert hdus[0][1] is None
    tab = hdus[1][1]
    np.testing.assert_allclose(tab['WAVELENGTH'], wave, rtol=1e-6)
    np.testing.assert_allclose(tab['g40'], g40, rtol=1e-6)


@pytest.fixture()
def cdbs(tmp_path):
    base = tmp_path / 'grid' / 'phoenix' / 'phoenixm00'
    os.makedirs(base)
    wave = np.linspace(3000.0, 30000.0, 200)   # Angstrom
    for teff, scale in ((5000, 1.0), (5200, 2.0)):
        cols = {'WAVELENGTH': wave,
                'g40': scale * np.full(200, 1.0),
                'g45': scale * np.full(200, 2.0)}
        write_bintable_fits(str(base / f'phoenixm00_{teff}.fits'), cols)
    return str(tmp_path)


def test_stellar_grid_interpolation(cdbs):
    from picaso_tpu.stellar import get_stellar_spectrum

    wno, flux = get_stellar_spectrum('phoenix', 5100, 0.0, 4.25, cdbs=cdbs)
    assert np.all(np.diff(wno) > 0)
    # teff midpoint (scale 1.5) x logg midpoint (1.5 flam) = 2.25 flam,
    # returned per-wavelength (erg/cm^2/s/A -> per cm is x1e8)
    np.testing.assert_allclose(flux, 2.25 * 1e8, rtol=1e-5)

    # nearest metallicity + clipped logg
    wno2, flux2 = get_stellar_spectrum('phoenix', 5000, -0.4, 9.9,
                                       cdbs=cdbs)
    np.testing.assert_allclose(flux2, 2.0 * 1e8, rtol=1e-5)


def test_stellar_feh_interpolation(cdbs):
    """Off-node [Fe/H] blends the two bracketing subgrids (Icat-style)."""
    import shutil

    from picaso_tpu.stellar import get_stellar_spectrum

    root = os.path.join(cdbs, 'grid', 'phoenix')
    m00 = os.path.join(root, 'phoenixm00')
    m05 = os.path.join(root, 'phoenixm05')   # [Fe/H] = -0.5
    os.makedirs(m05)
    for f in os.listdir(m00):
        shutil.copy(os.path.join(m00, f),
                    os.path.join(m05, f.replace('m00', 'm05')))
    # scale the m05 grid by 3x so the blend is detectable
    wave = np.linspace(3000.0, 30000.0, 200)
    for teff, scale in ((5000, 3.0), (5200, 6.0)):
        cols = {'WAVELENGTH': wave,
                'g40': scale * np.full(200, 1.0),
                'g45': scale * np.full(200, 2.0)}
        write_bintable_fits(os.path.join(m05, f'phoenixm05_{teff}.fits'),
                            cols)

    # hand-computed blend at [Fe/H] = -0.2: bilinear (teff, logg) value
    # is 2.25 flam on m00 and 6.75 on m05; linear in feh:
    # (1 - 0.4)*2.25 + 0.4*6.75 = 4.05
    wno, flux = get_stellar_spectrum('phoenix', 5100, -0.2, 4.25,
                                     cdbs=cdbs)
    np.testing.assert_allclose(flux, 4.05 * 1e8, rtol=1e-5)

    # beyond the grid edge clips to the nearest metallicity
    wno2, flux2 = get_stellar_spectrum('phoenix', 5100, -3.0, 4.25,
                                       cdbs=cdbs)
    np.testing.assert_allclose(flux2, 6.75 * 1e8, rtol=1e-5)


def test_star_database_gated():
    """Without $PYSYN_CDBS the grid path raises a helpful error."""
    from picaso_tpu.stellar import _cdbs_root
    old = os.environ.pop('PYSYN_CDBS', None)
    try:
        with pytest.raises(FileNotFoundError):
            _cdbs_root(None)
    finally:
        if old is not None:
            os.environ['PYSYN_CDBS'] = old
