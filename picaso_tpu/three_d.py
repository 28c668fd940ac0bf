"""3D (disco-ball) spectra and phase curves.

The reference runs each disk facet serially with a deep-copied atmosphere
(``justdoit.py:444-481`` + ``atmsetup.disect``) and parallelizes phase-curve
points with joblib processes (``justdoit.py:4741-4777``).  Here the facet
axis is a ``vmap`` batch dimension of one jitted program — per-facet opacity
interpolation, optics fusion, and the Toon 3D kernels (fluxes.py:355-662
reflected, :2148-2353 thermal) all batch together; a phase curve is a short
host loop of such programs (each phase has different geometry shapes only
when the grid changes).

3D profile input: a dict of arrays {'pressure': [nlevel] (bar),
'temperature': [nlevel, nlon, nlat], '<mol>': [nlevel, nlon, nlat], 'lat':
[nlat] (deg), 'lon': [nlon] (deg)}.  ``regrid_to_disco`` nearest-neighbour
selects the GCM columns at the Gauss-Chebyshev facet coordinates (the
reference requires exact matches after offline xesmf regridding,
atmsetup.py:113-120; nearest-neighbour is the superset behaviour).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import disco as disco_mod
from .atmosphere import build_atmosphere
from .constants import PCONV, SB_SIGMA
from .optics import RTProps
from .rt import toon

__all__ = ['regrid_to_disco', 'picaso_3d']


def regrid_to_disco(data, geometry: disco_mod.Geometry, field_lon_axis=1):
    """Select GCM columns at the facet lat/lon (nearest neighbour).

    ``field_lon_axis`` is the longitude axis of the gridded fields (1 for
    [nlevel, nlon, nlat] atmospheres; 2 for [nlayer, nwno, nlon, nlat]
    clouds); latitude is the next axis.  Returns dict of [..., ng, nt]
    arrays (plus untouched 1D vectors such as 'pressure').
    """
    lat_deg = np.degrees(geometry.latitude)
    lon_deg = np.degrees(geometry.longitude)
    glat = np.asarray(data['lat'])
    glon = np.asarray(data['lon'])
    ilat = np.array([np.abs(glat - la).argmin() for la in lat_deg])
    ilon = np.array([np.abs(glon - lo).argmin() for lo in lon_deg])
    out = {}
    for key, val in data.items():
        if key in ('lat', 'lon'):
            continue
        val = np.asarray(val)
        if val.ndim <= field_lon_axis:
            out[key] = val
        else:
            # [..., nlon, nlat] -> [..., ng, nt]
            sel = np.take(val, ilon, axis=field_lon_axis)
            out[key] = np.take(sel, ilat, axis=field_lon_axis + 1)
    return out


def _facet_atmospheres(bundle, wno, geometry):
    """Build per-facet Atmosphere-derived arrays, stacked [nfacet, ...]."""
    prof3d = bundle.inputs['atmosphere']['profile']
    if isinstance(prof3d, dict) and 'lat' in prof3d:
        prof3d = regrid_to_disco(prof3d, geometry)
    cld = bundle.inputs['clouds'].get('profile')
    if isinstance(cld, dict) and 'lat' in cld:
        # virga_3d output on the GCM grid -> select facet columns
        # ([nlayer, nwno, nlon, nlat] fields, lon axis 2)
        cld = regrid_to_disco(cld, geometry, field_lon_axis=2)
    cld_wno = bundle.inputs['clouds'].get('wavenumber')
    ng, nt = geometry.ng, geometry.nt
    planet = bundle.inputs['planet']

    atms = []
    for g in range(ng):
        for t in range(nt):
            prof = {}
            for key, val in prof3d.items():
                val = np.asarray(val)
                prof[key] = val if val.ndim == 1 else val[:, g, t]
            cld_dict = None
            if cld is not None:
                if isinstance(cld, dict) and any(
                        np.asarray(v).ndim > 1 for v in cld.values()):
                    cld_dict = {k: np.asarray(cld[k])[..., g, t].ravel()
                                for k in ('opd', 'g0', 'w0')}
                else:
                    cld_dict = {k: np.asarray(cld[k]) for k in
                                ('opd', 'g0', 'w0')}
            atm = build_atmosphere(
                prof, gravity=planet['gravity'] or np.nan,
                radius=planet['radius'] or np.nan,
                mass=planet['mass'] or np.nan,
                p_reference=bundle.inputs['approx']['p_reference'],
                wno=wno, cld_profile=cld_dict, cld_wno=cld_wno)
            atms.append(atm)
    return atms


def picaso_3d(bundle, opacityclass, calculation='thermal',
              full_output=False, as_dict=True):
    """3D spectrum: facets as a vmapped batch axis (justdoit.py:407-516)."""
    from .justdoit import compute_rtprops

    inp = bundle.inputs
    wno = np.asarray(opacityclass.wno)
    nwno = opacityclass.nwno
    ngauss = opacityclass.ngauss
    gauss_wts = np.asarray(opacityclass.gauss_wts)
    geom: disco_mod.Geometry = inp['disco']
    ng, nt = geom.ng, geom.nt

    common = inp['approx']['rt_params']['common']
    tp = inp['approx']['rt_params']['toon']
    frac = common['TTHG_params']['fraction']
    controls = toon.ScatteringControls(
        single_phase=tp['single_phase'], multi_phase=tp['multi_phase'],
        toon_coefficients=tp['toon_coefficients'],
        frac_a=float(frac[0]), frac_b=float(frac[1]), frac_c=float(frac[2]),
        constant_back=float(common['TTHG_params']['constant_back']),
        constant_forward=float(common['TTHG_params']['constant_forward']))

    radius_star = inp['star'].get('radius')
    if inp['star'].get('database') == 'nostar' or radius_star == 'nostar':
        F0PI = jnp.ones(nwno)
    else:
        F0PI = jnp.asarray(opacityclass.relative_flux)
    surf_reflect = inp.get('surface_reflect', 0.0)
    if isinstance(surf_reflect, (int, float)):
        surf_reflect = np.zeros(nwno) + surf_reflect
    surf_reflect = jnp.asarray(surf_reflect)
    hard_surface = bool(inp.get('hard_surface', 0))

    # --- per-facet optical properties, stacked on a leading facet axis ---
    atms = _facet_atmospheres(bundle, wno, geom)
    props_list = [compute_rtprops(bundle, opacityclass, atm)
                  for atm in atms]
    props = RTProps(*(jnp.stack([getattr(p, f) for p in props_list])
                      for f in RTProps._fields))  # [nfacet, ngauss, ...]
    tlevels = jnp.asarray(np.stack([a.temperature for a in atms]))
    plevels = jnp.asarray(np.stack([a.pressure for a in atms]))

    u0f = jnp.asarray(geom.ubar0.reshape(-1))
    u1f = jnp.asarray(geom.ubar1.reshape(-1))
    cos_theta = geom.cos_theta

    returns = {'wavenumber': wno}

    if 'reflected' in calculation:
        def one_facet_r(p: RTProps, u0, u1):
            xs = []
            for ig in range(ngauss):
                pg = p.slice_gauss(ig)
                xint, _ = toon.reflected_1d(
                    pg.dtau, pg.tau, pg.w0, pg.cosb, pg.gcos2, pg.ftau_cld,
                    pg.ftau_ray, pg.dtau_og, pg.tau_og, pg.w0_og,
                    pg.cosb_og, surf_reflect, u0.reshape(1, 1),
                    u1.reshape(1, 1), cos_theta, F0PI, controls=controls)
                xs.append(xint[0, 0] * gauss_wts[ig])
            return sum(xs)

        xint_flat = jax.vmap(one_facet_r)(props, u0f, u1f)
        xint_at_top = xint_flat.reshape(ng, nt, nwno)
        albedo = disco_mod.compress_disco(
            xint_at_top, jnp.asarray(geom.gweight),
            jnp.asarray(geom.tweight), cos_theta, F0PI)
        returns['albedo'] = np.asarray(albedo)
        sa = inp['star'].get('semi_major', np.nan)
        r_planet = inp['planet'].get('radius') or np.nan
        if (isinstance(sa, float) and not np.isnan(sa)
                and not np.isnan(r_planet)):
            returns['fpfs_reflected'] = np.asarray(
                albedo * (r_planet / sa) ** 2)
        if full_output:
            returns.setdefault('full_output', {})['xint_at_top'] = \
                np.asarray(xint_at_top)

    if 'thermal' in calculation:
        def one_facet_t(p: RTProps, tlevel, plevel, u1):
            fs = []
            for ig in range(ngauss):
                pg = p.slice_gauss(ig)
                flux, _ = toon.thermal_1d(
                    tlevel, pg.dtau_og, pg.w0_no_raman, pg.cosb_og,
                    plevel, u1.reshape(1, 1), surf_reflect,
                    jnp.asarray(wno), dwno=jnp.zeros(nwno),
                    hard_surface=hard_surface, calc_type=0)
                fs.append(flux[0, 0] * gauss_wts[ig])
            return sum(fs)

        flux_flat = jax.vmap(one_facet_t)(props, tlevels, plevels, u1f)
        flux_at_top = flux_flat.reshape(ng, nt, nwno)
        thermal = disco_mod.compress_thermal(
            flux_at_top, jnp.asarray(geom.gweight),
            jnp.asarray(geom.tweight))
        returns['thermal'] = np.asarray(thermal)
        returns['thermal_unit'] = 'erg/s/(cm^2)/(cm)'
        returns['effective_temperature'] = float(
            (np.trapezoid(x=1 / wno[::-1],
                          y=np.asarray(thermal)[::-1]) / SB_SIGMA) ** 0.25)
        if (opacityclass.unshifted_stellar_spec is not None
                and isinstance(radius_star, float)):
            r_planet = inp['planet'].get('radius') or np.nan
            if not np.isnan(r_planet) and not np.isnan(radius_star):
                returns['fpfs_thermal'] = np.asarray(
                    thermal / np.asarray(opacityclass.unshifted_stellar_spec)
                    * (r_planet / radius_star) ** 2)
        if full_output:
            returns.setdefault('full_output', {})['flux_at_top'] = \
                np.asarray(flux_at_top)

    return returns
