"""I/O helpers: JSON/HDF readers, climate iterate dumps, and model
preservation round-trips.

Covers the reference ``io_utils.py`` plus the xarray preservation layer
(``justdoit.py:630-1089`` output_xarray/input_xarray).  xarray is not part
of this environment, so models are stored as self-describing HDF5 (datasets
+ attrs) with the same information content; ``load_model`` reconstitutes a
runnable ``inputs`` bundle exactly like ``input_xarray``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

__all__ = ['read_json', 'read_hdf', 'write_all_profiles', 'read_visscher', 'merge_models',
           'save_model', 'load_model', 'standard_metadata']


def read_json(filename, **kwargs):
    with open(filename) as f:
        return json.load(f, **kwargs)


def read_hdf(filename, key=None):
    import h5py
    out = {}
    with h5py.File(filename, 'r') as f:
        src = f[key] if key else f
        for k in src:
            out[k] = np.asarray(src[k])
    return out


def write_all_profiles(filename, all_profiles, nlevel, all_opd=None,
                       all_kzz=None):
    """Dump climate iteration history (io_utils.py:82 semantics)."""
    import h5py
    arr = np.asarray(all_profiles).reshape(-1, nlevel)
    with h5py.File(filename, 'w') as f:
        f.create_dataset('all_profiles', data=arr)
        if all_opd is not None and len(np.atleast_1d(all_opd)):
            f.create_dataset('all_opd',
                             data=np.asarray(all_opd).reshape(
                                 -1, nlevel - 1))
        if all_kzz is not None and len(np.atleast_1d(all_kzz)):
            f.create_dataset('all_kzz', data=np.asarray(all_kzz))
    return filename


def read_visscher(filename):
    """Read a visscher chemistry grid table (io_utils.py:7 semantics)."""
    return pd.read_csv(filename)


def standard_metadata():
    """Template metadata tree for stored models (justdoit.py:630-663)."""
    return {
        'author': '', 'contact': '', 'code': 'picaso_tpu',
        'doi': '', 'planet_params': {}, 'stellar_params': {},
        'orbit_params': {},
    }


def save_model(filename, case, out, calculation='all', meta=None):
    """Persist a computed model: spectra + profile + inputs -> HDF5.

    The TPU analog of output_xarray (justdoit.py:705): everything needed to
    re-plot or re-run lives in one self-describing file.
    """
    import h5py
    meta = meta or {}
    prof = case.inputs['atmosphere']['profile']
    with h5py.File(filename, 'w') as f:
        spec = f.create_group('spectra')
        for key in ('wavenumber', 'albedo', 'thermal', 'transit_depth',
                    'fpfs_thermal', 'fpfs_reflected', 'fpfs_total'):
            if key in out and isinstance(out[key], np.ndarray):
                spec.create_dataset(key, data=out[key])
        pg = f.create_group('profile')
        for col in prof.keys():
            pg.create_dataset(str(col), data=np.asarray(prof[col],
                                                        dtype=np.float64))
        cld = case.inputs['clouds'].get('profile')
        if cld is not None and not isinstance(cld, dict):
            cg = f.create_group('clouds')
            for col in ('opd', 'g0', 'w0'):
                cg.create_dataset(col, data=np.asarray(cld[col],
                                                       dtype=np.float64))
            cld_wno = case.inputs['clouds'].get('wavenumber')
            if cld_wno is not None:
                cg.create_dataset('wavenumber',
                                  data=np.asarray(cld_wno,
                                                  dtype=np.float64))
        attrs = {
            'planet_gravity': case.inputs['planet'].get('gravity'),
            'planet_radius': case.inputs['planet'].get('radius'),
            'planet_mass': case.inputs['planet'].get('mass'),
            'star_temp': case.inputs['star'].get('temp'),
            'star_radius': case.inputs['star'].get('radius'),
            'star_semi_major': case.inputs['star'].get('semi_major'),
            'phase_angle': case.inputs.get('phase_angle'),
            'p_reference': case.inputs['approx'].get('p_reference'),
        }
        for k, v in {**attrs, **meta}.items():
            if v is None:
                continue
            try:
                f.attrs[k] = v
            except TypeError:
                f.attrs[k] = json.dumps(v)
    return filename


def load_model(filename, opannection=None):
    """Reconstitute an ``inputs`` bundle + stored spectra (input_xarray)."""
    import h5py
    from .justdoit import inputs as _inputs

    with h5py.File(filename, 'r') as f:
        prof = {k: np.asarray(v) for k, v in f['profile'].items()}
        spectra = {k: np.asarray(v) for k, v in f['spectra'].items()}
        attrs = dict(f.attrs)
        clouds = ({k: np.asarray(v) for k, v in f['clouds'].items()}
                  if 'clouds' in f else None)

    case = _inputs()
    case.phase_angle(float(attrs.get('phase_angle', 0.0) or 0.0))
    grav = attrs.get('planet_gravity')
    radius = attrs.get('planet_radius')
    mass = attrs.get('planet_mass')
    from . import units as u
    if (radius is not None and mass is not None
            and np.isfinite(radius) and np.isfinite(mass)):
        case.gravity(radius=float(radius), radius_unit=u.Unit('cm'),
                     mass=float(mass), mass_unit=u.Unit('g'))
    elif grav is not None:
        case.gravity(gravity=float(grav), gravity_unit=u.Unit('cm/(s**2)'))
    case.atmosphere(df=pd.DataFrame(prof))
    if clouds is not None:
        cld_df = pd.DataFrame({k: clouds[k] for k in ('opd', 'g0', 'w0')})
        if 'wavenumber' in clouds:
            nlayer = len(prof['pressure']) - 1
            nw = len(clouds['wavenumber'])
            cld_df['wavenumber'] = np.tile(clouds['wavenumber'], nlayer)
            pressure = np.sqrt(np.asarray(prof['pressure'])[1:]
                               * np.asarray(prof['pressure'])[:-1])
            cld_df['pressure'] = np.repeat(pressure, nw)
        case.clouds(df=cld_df)
    star_temp = attrs.get('star_temp')
    if opannection is not None and star_temp is not None and \
            not isinstance(star_temp, str):
        kw = {}
        sr = attrs.get('star_radius')
        sa = attrs.get('star_semi_major')
        if sr is not None and np.isfinite(sr):
            kw.update(radius=float(sr), radius_unit=u.Unit('cm'))
        if sa is not None and np.isfinite(sa):
            kw.update(semi_major=float(sa), semi_major_unit=u.Unit('cm'))
        case.star(opannection, float(star_temp), 0.0, 4.5, **kw)
    return case, spectra, attrs


def merge_models(outputs, concat_dim='model'):
    """Merge several computed-model dicts into stacked arrays.

    Parity role of justdoit.merge_xarrays (justdoit.py:664): given an
    iterable of spectrum dicts (or .h5 paths written by save_model),
    returns one dict with each spectral key stacked along a leading
    model axis plus the shared wavenumber grid.
    """
    import h5py
    dicts = []
    for o in outputs:
        if isinstance(o, (str, bytes)):
            with h5py.File(o, 'r') as f:
                dicts.append({k: np.asarray(v)
                              for k, v in f['spectra'].items()})
        else:
            dicts.append(o)
    keys = set(dicts[0])
    for d in dicts[1:]:
        keys &= set(d)
    out = {}
    for k in sorted(keys):
        if k == 'wavenumber':
            out[k] = np.asarray(dicts[0][k])
        else:
            try:
                out[k] = np.stack([np.asarray(d[k]) for d in dicts])
            except ValueError:
                out[k] = [d[k] for d in dicts]
    out[f'n_{concat_dim}'] = len(dicts)
    return out
