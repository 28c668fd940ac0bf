"""Climate orchestration: profile iteration, convective-zone search, user API.

Port of the host-side control flow of the reference (climate.py:126-330
workflows, :2542-2839 ``find_strat``, :2926-3249 ``profile``) around the
jitted TPU core.  The data-dependent zone bookkeeping stays host Python (a
handful of ints per iteration); everything touching [nlayer, nwno, ngauss]
arrays is device work.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pandas as pd

from .. import chemistry
from ..atmosphere import build_atmosphere
from ..constants import PCONV
from ..opacities import assemble
from ..opacities.ck import CKTable, ck_continuum, interp_premix
from ..optics import combine_optics
from ..rt import toon
from . import core
from .adiabat import load_adiabat_grid

__all__ = ['inputs_climate', 'run_climate', 'ck_rtprops']


def ck_rtprops(profile_df, ck: CKTable, gravity, p_reference=1.0,
               delta_eddington=True, stream=2, raman=2,
               cld=None, dtype=np.float64):
    """Atmosphere + premixed CK table -> RTProps [ngauss, nlayer, nwno].

    The climate analog of calculate_atm (climate.py:1969-2134): premixed
    molecular kappa (no mixing-ratio weighting, optics.py:257-262) +
    CIA continuum + Rayleigh + optional clouds, fused by combine_optics.
    """
    wno = np.asarray(ck.wno)
    nwno = len(wno)
    atm = build_atmosphere(profile_df, gravity=gravity,
                           p_reference=p_reference, wno=wno,
                           cld_profile=cld, cld_wno=None if cld is None
                           else wno)
    nlayer = atm.nlayer

    kappa = interp_premix(ck.arrays, jnp.asarray(atm.t_layer),
                          jnp.asarray(atm.p_layer / PCONV))
    # [nlayer, nwno, ngauss] -> [ngauss, nlayer, nwno]
    taugas = (kappa * (atm.colden / atm.mmw_layer)[:, None, None]
              ).transpose(2, 0, 1)

    pairs = atm.continuum_pairs(ck.continuum_molecules)
    specs = assemble.classify_continuum(pairs)
    if specs:
        cont = ck_continuum(ck.arrays, jnp.asarray(atm.t_layer))
        cont_kappa = {s.name: cont[list(ck.continuum_molecules).index(s.name)]
                      for s in specs}
        coef1 = assemble.amagat_coef1(
            jnp.asarray(atm.temperature), jnp.asarray(atm.pressure / PCONV),
            jnp.asarray(atm.t_layer), jnp.asarray(atm.p_layer / PCONV),
            atm.gravity, jnp.asarray(atm.mmw_layer))
        mix = {m: jnp.asarray(atm.mixing_ratio_layer(m))
               for m in atm.molecules}
        for s in specs:
            for m in (s.mol1, s.mol2):
                if m and m not in mix:
                    mix[m] = jnp.zeros(nlayer)
        elec = (jnp.asarray(atm.electrons_layer)
                if atm.electrons_layer is not None else jnp.zeros(nlayer))
        tau_cont = assemble.continuum_tau(
            specs, cont_kappa, mix, elec, coef1, jnp.asarray(atm.p_layer),
            jnp.asarray(atm.t_layer), jnp.asarray(atm.colden),
            jnp.asarray(atm.mmw_layer))
        taugas = taugas + tau_cont[None]

    from ..rayleigh import rayleigh_sigma_table, RAYLEIGH_MOLECULES
    ray_species = atm.rayleigh_species(RAYLEIGH_MOLECULES)
    if ray_species:
        sig = rayleigh_sigma_table(wno, ray_species)
        sigma = jnp.asarray(np.stack([sig[m] for m in ray_species]))
        mix_ray = jnp.asarray(np.stack([atm.mixing_ratio_layer(m)
                                        for m in ray_species]))
        tauray = assemble.rayleigh_tau(sigma, mix_ray,
                                       jnp.asarray(atm.colden),
                                       jnp.asarray(atm.mmw_layer))
    else:
        tauray = jnp.zeros((nlayer, nwno))
    ngauss = ck.ngauss
    tauray = jnp.broadcast_to(tauray[None], (ngauss, nlayer, nwno))

    zeros = jnp.zeros((nlayer, nwno))
    opd = jnp.asarray(atm.cld_opd) if atm.cld_opd is not None else zeros
    g0 = jnp.asarray(atm.cld_g0) if atm.cld_g0 is not None else zeros
    w0 = jnp.asarray(atm.cld_w0) if atm.cld_w0 is not None else zeros
    bc = lambda x: jnp.broadcast_to(x[None], (ngauss, nlayer, nwno))

    rf = jnp.full((ngauss, nlayer, nwno), 0.99999)  # raman off in climate
    props = combine_optics(taugas.astype(dtype), tauray.astype(dtype),
                           bc(opd).astype(dtype), bc(w0).astype(dtype),
                           bc(g0).astype(dtype), rf.astype(dtype),
                           test_mode=None, delta_eddington=delta_eddington,
                           stream=stream)
    return props, atm


class _ClimateState:
    """Everything profile()/find_strat() thread through iterations."""

    def __init__(self, bundle, opacityclass, tidal, rfaci, rfacv, tmin,
                 tmax, moist=False, verbose=True):
        self.bundle = bundle
        self.opa = opacityclass
        self.ck: CKTable = opacityclass.ck
        self.chem_grid = chemistry.chem_grid_from_table(self.ck.full_abunds)
        self.adiabat = load_adiabat_grid()
        self.geom = core.make_climate_geometry()
        self.tidal = tidal
        self.rfaci = rfaci
        self.rfacv = rfacv
        self.tmin = tmin
        self.tmax = tmax
        self.moist = moist
        self.verbose = verbose
        self.wno = jnp.asarray(self.ck.wno)
        self.dwno = jnp.asarray(self.ck.delta_wno)
        self.gauss_wts = jnp.asarray(self.ck.gauss_wts)
        self.surf_reflect = jnp.zeros(len(self.ck.wno))
        self.gravity = bundle.inputs['planet']['gravity']
        common = bundle.inputs['approx']['rt_params']['common']
        tp = bundle.inputs['approx']['rt_params']['toon']
        frac = common['TTHG_params']['fraction']
        self.controls = toon.ScatteringControls(
            single_phase=tp['single_phase'], multi_phase=tp['multi_phase'],
            toon_coefficients=tp['toon_coefficients'],
            frac_a=float(frac[0]), frac_b=float(frac[1]),
            frac_c=float(frac[2]),
            constant_back=float(common['TTHG_params']['constant_back']),
            constant_forward=float(
                common['TTHG_params']['constant_forward']))
        self.F0PI = jnp.asarray(
            opacityclass.relative_flux if opacityclass.relative_flux
            is not None else np.ones(len(self.ck.wno)))
        self.all_profiles = []

        # --- static + traced state for the fused single-dispatch path ---
        from .. import molmass
        from ..rayleigh import rayleigh_sigma_table, RAYLEIGH_MOLECULES
        from . import fused

        species = self.chem_grid.species
        weights = tuple(molmass.molecular_weight(s) for s in species)
        # continuum pair matching on the chem species (atmsetup.py:248-277)
        pairs = []
        for m1 in species:
            for m2 in species:
                if m1 + m2 in self.ck.continuum_molecules:
                    pairs.append((m1, m2))
        specs = tuple(assemble.classify_continuum(pairs))
        cont_indices = tuple(
            list(self.ck.continuum_molecules).index(s.name) for s in specs)
        ray_species = [s for s in species if s in RAYLEIGH_MOLECULES]
        ray_rows = tuple(species.index(s) for s in ray_species)
        wno_np = np.asarray(self.ck.wno)
        sig = rayleigh_sigma_table(wno_np, ray_species)
        sigma_ray = (np.stack([sig[s] for s in ray_species])
                     if ray_species else np.zeros((0, len(wno_np))))

        nlevel = len(bundle.inputs['climate']['pressure'])
        nlayer = nlevel - 1
        nwno = len(wno_np)
        self._config_base = dict(
            species=species, weights=weights, continuum_specs=specs,
            cont_indices=cont_indices, ray_species_rows=ray_rows,
            controls=self.controls,
            delta_eddington=common['delta_eddington'],
            stream=common['stream'], compute_reflected=(rfacv != 0.0))
        self.data = fused.ClimateData(
            plevel=jnp.asarray(
                np.asarray(bundle.inputs['climate']['pressure']) * PCONV),
            gravity=jnp.asarray(float(self.gravity)),
            tidal=jnp.asarray(tidal), rfaci=jnp.asarray(float(rfaci)),
            rfacv=jnp.asarray(float(rfacv)), tmin=jnp.asarray(float(tmin)),
            tmax=jnp.asarray(float(tmax)), F0PI=self.F0PI,
            surf_reflect=self.surf_reflect,
            sigma_ray=jnp.asarray(sigma_ray),
            cld_opd=jnp.zeros((nlayer, nwno)),
            cld_g0=jnp.zeros((nlayer, nwno)),
            cld_w0=jnp.zeros((nlayer, nwno)))

    def fused_config(self, it_max, egp_stepmax):
        from . import fused
        return fused.ClimateConfig(it_max=int(it_max),
                                   egp_stepmax=bool(egp_stepmax),
                                   **self._config_base)

    def premix(self, temp, pressure_bar):
        """Equilibrium-chemistry refresh at the current T(P)."""
        abunds = np.asarray(chemistry.chem_interp(
            self.chem_grid, jnp.asarray(temp), jnp.asarray(pressure_bar)))
        df = pd.DataFrame({'pressure': pressure_bar, 'temperature': temp})
        for i, sp in enumerate(self.chem_grid.species):
            df[sp] = abunds[:, i]
        self.bundle.inputs['atmosphere']['profile'] = df
        return df

    def opacities(self, profile_df):
        common = self.bundle.inputs['approx']['rt_params']['common']
        return ck_rtprops(profile_df, self.ck, self.gravity,
                          p_reference=self.bundle.inputs['approx']
                          ['p_reference'],
                          delta_eddington=common['delta_eddington'],
                          stream=common['stream'])


def _reconstruct_host(state, temp, pressure_bar, nstr, nofczns):
    """Adiabatic re-stitch of convective zones (climate.py:3056-3067)."""
    zones = core.zone_maps(nstr, nofczns, len(temp))
    t = core.reconstruct_profile(jnp.asarray(temp), zones,
                                 jnp.asarray(pressure_bar * PCONV),
                                 state.adiabat)
    return np.asarray(t)


def profile(state: _ClimateState, nofczns, nstr, temp, pressure_bar,
            it_max, itmx, conv, convt, x_max_mult, final,
            save_profile=False):
    """One opacity-refresh loop around the fused Newton solve
    (climate.py:2926-3249).  Each itmx iteration is ONE device dispatch of
    climate.fused.profile_step."""
    from . import fused

    temp = np.asarray(temp, float).copy()
    egp_stepmax = bool(temp.min() <= 250)
    zones = core.zone_maps(nstr, nofczns, len(temp))
    config = state.fused_config(it_max=it_max, egp_stepmax=egp_stepmax)

    temp_old = temp.copy()
    conv_flag = 0
    result = None
    temp_dev = jnp.asarray(temp)
    for iii in range(itmx):
        temp_dev, converged, dtdp, fnil, fnvl, fpit = fused.profile_step(
            temp_dev, zones, state.data, state.chem_grid, state.ck.arrays,
            state.geom, state.adiabat, config)
        temp = np.asarray(temp_dev)
        if save_profile:
            state.all_profiles.append(temp.copy())

        ert = float(np.abs(temp - temp_old).sum()) / (len(temp) * 1.5)
        temp_old = temp.copy()
        if state.verbose:
            print(f' profile it {iii}: mean|dT| {ert:.3f} K (conv {convt})')
        result = (np.asarray(dtdp), np.asarray(fnil), np.asarray(fnvl),
                  np.asarray(fpit))
        if iii > 0 and ert < convt:
            conv_flag = 1
            break

    # refresh the bundle chemistry at the converged structure
    state.premix(temp, pressure_bar)
    dtdp, fnil, fnvl, fpit = result
    return (conv_flag, temp, dtdp, fnil, fnvl, fpit)


def find_strat(state: _ClimateState, nofczns, nstr, temp, pressure_bar,
               dtdp, save_profile=False):
    """Convective-zone growth/merge search (climate.py:2542-2839)."""
    subad = 0.98
    ifirst = 10 - 1
    nstr = list(nstr)

    def conv_grad(temp):
        tbar = 0.5 * (temp[1:] + temp[:-1])
        pbar = np.sqrt(pressure_bar[1:] * pressure_bar[:-1])
        grad_x, _ = core.did_grad_cp(jnp.asarray(tbar), jnp.asarray(pbar),
                                     state.adiabat)
        return np.asarray(grad_x)

    args = dict(it_max=8, itmx=5, conv=5.0, convt=3.0, x_max_mult=7.0,
                final=False, save_profile=save_profile)

    grad_x = conv_grad(temp)
    while dtdp[nstr[1] - 1] >= subad * grad_x[nstr[1] - 1]:
        ratio = dtdp[nstr[1] - 1] / grad_x[nstr[1] - 1]
        nstr[1] -= 2 if ratio > 1.8 else 1
        if nstr[1] < 5:
            raise ValueError('Convection zone grew to the top of the '
                             'atmosphere; stopping')
        if state.verbose:
            print('find_strat: grow upper zone ->', nstr)
        (flag, temp, dtdp, fni, fnv, fpit) = profile(
            state, nofczns, nstr, temp, pressure_bar, **args)
        grad_x = conv_grad(temp)

    # detect a detached second zone by superadiabaticity (climate.py:2679)
    dt_max, i_max = 0.0, 0
    for i in range(nstr[1] - 1, ifirst - 1, -1):
        add = dtdp[i] - grad_x[i]
        if add > dt_max and add / grad_x[i] >= 0.02:
            dt_max, i_max = add, i
            break

    if not (i_max == 0 or dt_max / grad_x[i_max] < 0.02):
        if state.verbose:
            print('find_strat: detached zone at', i_max)
        nofczns = 2
        nstr[4], nstr[5] = nstr[1], nstr[2]
        nstr[1] = nstr[2] = nstr[3] = i_max
        if nstr[3] >= nstr[4]:
            raise ValueError('Convective-zone overlap')
        (flag, temp, dtdp, fni, fnv, fpit) = profile(
            state, nofczns, nstr, temp, pressure_bar, **args)
        grad_x = conv_grad(temp)

        i_change = 1
        while i_change == 1:
            i_change = 0
            d1, d2 = dtdp[nstr[1] - 1], dtdp[nstr[3]]
            c1, c2 = grad_x[nstr[1] - 1], grad_x[nstr[3]]
            while (d1 > subad * c1) or (d2 > subad * c2):
                if ((d1 - c1) >= (d2 - c2)) or (nofczns == 1):
                    nstr[1] -= 1
                    if nstr[1] < 3:
                        raise ValueError('Convection zone grew to the top')
                else:
                    nstr[2] += 1
                    nstr[3] += 1
                    if nstr[2] == nstr[4]:
                        nofczns = 1
                        nstr[2] = nstr[5]
                        nstr[3] = 0
                        i_change = 1
                if state.verbose:
                    print('find_strat: adjust ->', nstr)
                (flag, temp, dtdp, fni, fnv, fpit) = profile(
                    state, nofczns, nstr, temp, pressure_bar, **args)
                grad_x = conv_grad(temp)
                d1, d2 = dtdp[nstr[1] - 1], dtdp[nstr[3]]
                c1, c2 = grad_x[nstr[1] - 1], grad_x[nstr[3]]
            while (nofczns > 1
                   and dtdp[nstr[4] - 1] >= subad * grad_x[nstr[4] - 1]):
                nstr[4] -= 1
                if nstr[2] == nstr[4]:
                    nofczns = 1
                    nstr[2] = nstr[5]
                    nstr[3] = 0
                    i_change = 1
                if state.verbose:
                    print('find_strat: grow lower zone ->', nstr)
                (flag, temp, dtdp, fni, fnv, fpit) = profile(
                    state, nofczns, nstr, temp, pressure_bar, **args)
                grad_x = conv_grad(temp)

    # final strict-tolerance pass (climate.py:2798-2819)
    final_args = dict(it_max=10, itmx=6, conv=2.0, convt=2.0,
                      x_max_mult=3.5, final=True, save_profile=save_profile)
    if state.verbose:
        print('find_strat: final pass', nstr)
    (flag, temp, dtdp, fni, fnv, fpit) = profile(
        state, nofczns, nstr, temp, pressure_bar, **final_args)
    chem_df = state.bundle.inputs['atmosphere']['profile']
    return flag, temp, dtdp, nstr, fni, fnv, fpit, chem_df


def inputs_climate(case, temp_guess=None, pressure=None, rfaci=1,
                   rcb_guess=None, rfacv=None, moistgrad=False):
    """Port of justdoit.inputs_climate (justdoit.py:4883-4931)."""
    if case.inputs['planet'].get('T_eff', 0) in (0, None):
        raise ValueError('set T_eff via case.effective_temp() first')
    if not case.inputs['planet'].get('gravity'):
        raise ValueError('set gravity first')
    case.inputs['climate']['guess_temp'] = np.asarray(temp_guess, float)
    case.inputs['climate']['pressure'] = np.asarray(pressure, float)
    case.inputs['climate']['nstr'] = [0, int(rcb_guess),
                                      len(pressure) - 2, 0, 0, 0]
    case.inputs['climate']['nofczns'] = 1
    case.inputs['climate']['rfacv'] = rfacv
    case.inputs['climate']['rfaci'] = rfaci
    case.inputs['climate']['moistgrad'] = moistgrad
    case.add_pt(case.inputs['climate']['guess_temp'],
                case.inputs['climate']['pressure'])


def run_climate(case, opacityclass, save_all_profiles=False,
                with_spec=False, diseq_chem=False, verbose=True, **kwargs):
    """Top-level climate solve (port of justdoit.climate, :4982-5281).

    Round-1 scope: chemical-equilibrium workflow (cloud-free or static
    clouds); disequilibrium (quench/photochem) and virga coupling land with
    the next milestone.
    """
    if diseq_chem:
        raise NotImplementedError('diseq workflow lands next milestone')

    ck: CKTable = opacityclass.ck
    teff = case.inputs['planet']['T_eff']
    min_temp, max_temp = float(ck.temps.min()), float(ck.temps.max())
    tmin = min_temp * 0.7 if teff > 300 else 10.0
    tmax = 10000.0 if teff > 1600 else max_temp * 1.3

    pressure = case.inputs['climate']['pressure']
    temp = np.asarray(case.inputs['climate']['guess_temp'], float).copy()
    nstr = list(case.inputs['climate']['nstr'])
    nofczns = case.inputs['climate']['nofczns']
    rfaci = case.inputs['climate']['rfaci']

    if 'nostar' in str(case.inputs['star'].get('database')):
        rfacv = 0.0
        opacityclass.relative_flux = np.zeros(len(ck.wno)) + 1.0
    else:
        rfacv = case.inputs['climate']['rfacv']

    nlevel = len(pressure)
    tidal = core.tidal_flux(teff, nlevel)

    state = _ClimateState(case, opacityclass, tidal, rfaci, rfacv, tmin,
                          tmax, moist=case.inputs['climate'].get(
                              'moistgrad', False), verbose=verbose)

    # STEP 1: loose-tolerance profile (climate.py:270-290)
    flag, temp, dtdp, fni, fnv, fpit = profile(
        state, nofczns, nstr, temp, pressure, it_max=10, itmx=7, conv=10.0,
        convt=5.0, x_max_mult=7.0, final=False,
        save_profile=save_all_profiles)
    # STEP 2: stricter profile
    flag, temp, dtdp, fni, fnv, fpit = profile(
        state, nofczns, nstr, temp, pressure, it_max=7, itmx=5, conv=5.0,
        convt=4.0, x_max_mult=7.0, final=False,
        save_profile=save_all_profiles)
    # STEP 3: convective-zone search + final pass
    flag, temp, dtdp, nstr, fni, fnv, fpit, chem_df = find_strat(
        state, nofczns, nstr, temp, pressure, dtdp,
        save_profile=save_all_profiles)

    flux_net = rfacv * fnv + rfaci * fni + tidal
    out = {
        'pressure': pressure, 'temperature': temp, 'ptchem_df': chem_df,
        'dtdp': dtdp, 'cvz_locs': nstr, 'flux_ir_attop': fpit,
        'converged': flag,
        'fnet/fnetir': flux_net / np.where(fni != 0, fni, np.nan),
        'flux_balance': dict(flux_net_ir=fni, flux_net_v=fnv, tidal=tidal,
                             rfacv=rfacv, rfaci=rfaci, flux_net=flux_net),
    }
    if save_all_profiles:
        out['all_profiles'] = np.concatenate(
            [p[None] for p in state.all_profiles]) \
            if state.all_profiles else np.zeros((0, nlevel))
    if with_spec:
        case.atmosphere(df=chem_df)
        out['spectrum_output'] = case.spectrum(opacityclass,
                                               calculation='thermal',
                                               full_output=True)
    return out
