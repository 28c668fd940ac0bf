"""GCM-input regridding onto the disco facet grid (build_3d_input.py)."""

import numpy as np

from picaso_tpu import build_3d_input as b3d
from picaso_tpu.ncio import NCDataset, NCVar


def _dataset(nlon=36, nlat=18, nlev=5):
    lon = np.linspace(-180, 176, nlon)
    lat = np.linspace(-87.5, 87.5, nlat)
    lev = np.arange(nlev, dtype=float)
    # smooth analytic field so bilinear regridding is near-exact
    field = (np.sin(np.radians(lon))[None, :, None]
             + np.cos(np.radians(lat))[None, None, :]
             + lev[:, None, None])
    return NCDataset(
        data_vars={'temperature': NCVar(field, ('lev', 'lon', 'lat'), {}),
                   'scalar': NCVar(lev, ('lev',), {})},
        coords={'lon': NCVar(lon, ('lon',), {}),
                'lat': NCVar(lat, ('lat',), {}),
                'lev': NCVar(lev, ('lev',), {})},
        attrs={}, dims={'lon': nlon, 'lat': nlat, 'lev': nlev})


def test_regrid_xarray_gauss_cheby():
    """regrid_xarray hits the analytic field at the facet coordinates
    (reference build_3d_input.py:12-62, xesmf replaced by bilinear)."""
    ds = _dataset()
    out = b3d.regrid_xarray(ds, num_gangle=6, num_tangle=6,
                            phase_angle=0.0)
    assert 'temperature' in out and 'scalar' not in out
    ng, nt = len(out['longitude']), len(out['latitude'])
    assert out['temperature'].shape == (5, ng, nt)
    expect = (np.sin(np.radians(out['longitude']))[:, None]
              + np.cos(np.radians(out['latitude']))[None, :])
    np.testing.assert_allclose(out['temperature'][0], expect, atol=1e-2)
    np.testing.assert_allclose(out['temperature'][3] - 3.0, expect,
                               atol=1e-2)


def test_regrid_xarray_explicit_latlon():
    ds = _dataset()
    tgt_lat = np.array([-30.0, 0.0, 45.0])
    tgt_lon = np.array([-90.0, 0.0, 90.0])
    out = b3d.regrid_xarray(ds, latitude=tgt_lat, longitude=tgt_lon)
    expect = (np.sin(np.radians(tgt_lon))[:, None]
              + np.cos(np.radians(tgt_lat))[None, :])
    np.testing.assert_allclose(out['temperature'][0], expect, atol=1e-2)


def test_regrid_to_gauss_cheby_matches_regrid_xarray():
    ds = _dataset()
    out = b3d.regrid_xarray(ds, num_gangle=6, num_tangle=6,
                            phase_angle=0.0)
    geom, cube = b3d.regrid_to_gauss_cheby(
        np.asarray(ds.coords['lat'].values),
        np.asarray(ds.coords['lon'].values),
        ds.data_vars['temperature'].values, num_gangle=6, num_tangle=6,
        phase=0.0)
    np.testing.assert_allclose(cube, out['temperature'], rtol=1e-12)


def test_longitude_periodic_wrap():
    """A [0, 360) GCM grid queried at facet longitudes in [-180, 180]
    must interpolate through the anti-meridian, not clamp to the seam
    (regression: lon=-90 used the lon~0 column instead of 270)."""
    lon = np.arange(0.0, 360.0, 30.0)          # 12 columns, global
    lat = np.linspace(-75, 75, 6)
    # value IS the longitude angle's cosine: unambiguous per column
    cube = np.cos(np.radians(lon))[:, None] + 0.0 * lat[None, :]
    geom, out = b3d.regrid_to_gauss_cheby(
        lat, lon, cube, num_gangle=8, num_tangle=4, phase=0.0)
    lon_t = np.degrees(geom.longitude)
    expect = np.cos(np.radians(lon_t))
    got = out[:, 0]
    np.testing.assert_allclose(got, expect, atol=0.05)
    # a limited-area grid still clamps (no false wrap)
    lon_la = np.linspace(10, 50, 5)
    cube_la = lon_la[:, None] + 0.0 * lat[None, :]
    _, out_la = b3d.regrid_to_gauss_cheby(
        lat, lon_la, cube_la, num_gangle=8, num_tangle=4, phase=0.0)
    assert out_la.min() >= 10.0 - 1e-9 and out_la.max() <= 50.0 + 1e-9
