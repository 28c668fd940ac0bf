"""Photochemical kinetics coupling (requires the external ``photochem``
package, Fortran-backed).

Port of the reference ``photochem.py`` wrapper: flips this framework's
top-down arrays into photochem's bottom-up convention, drives
``find_steady_state`` each climate iteration warm-started from the previous
solution, and writes the steady-state mixing ratios back into the profile.
The package is optional (not part of this environment); importing this
module without it raises a clear error at use time, not import time.
"""

from __future__ import annotations

import pickle

import numpy as np

__all__ = ['EvoAtmosphereGasGiantPicaso', 'photochem_available']


def photochem_available():
    try:
        import photochem  # noqa: F401
        return True
    except ImportError:
        return False


def _require_photochem():
    try:
        from photochem.extensions.gasgiants import EvoAtmosphereGasGiant
        return EvoAtmosphereGasGiant
    except ImportError as err:
        raise ImportError(
            'Photochemical-kinetics climate runs need the optional '
            '`photochem` package (https://github.com/Nicholaswogan/'
            'photochem). Install it, or use the quench approximation '
            '(diseq_chem=True without chem_method=photochem).') from err


class EvoAtmosphereGasGiantPicaso:
    """Adapter between picaso_tpu profiles and photochem's gas-giant class
    (reference photochem.py:23-183 semantics)."""

    def __init__(self, *args, save_file=None, **kwargs):
        base = _require_photochem()
        self._pc = base(*args, **kwargs)
        self.gdat = self._pc.gdat
        self.save_file = save_file
        self.initial_guess = None
        if save_file is not None:
            # the file is an append-log of steady states (reference
            # photochem.py:172-180); warm-start from the NEWEST record,
            # converted to the top-down dataframe layout every
            # df_comp_guess consumer expects
            sol = None
            try:
                with open(save_file, 'rb') as f:
                    while True:
                        try:
                            sol = pickle.load(f)
                        except EOFError:
                            break
            except FileNotFoundError:
                pass
            if isinstance(sol, dict):
                import pandas as pd
                self.initial_guess = pd.DataFrame(
                    {k: np.asarray(v)[::-1]
                     for k, v in sol.items() if k != 'alt'})

    def initialize_to_climate_equilibrium_PT_picaso(
            self, df, Kzz_in, metallicity, CtoO,
            rainout_condensed_atoms=True):
        """Cold-start from equilibrium at a picaso profile
        (photochem.py:76-94): flips the top-down dataframe bottom-up and
        bar -> dyn/cm^2."""
        self._pc.initialize_to_climate_equilibrium_PT(
            df['pressure'].to_numpy()[::-1].copy() * 1e6,
            df['temperature'].to_numpy()[::-1].copy(),
            np.asarray(Kzz_in)[::-1].copy(), metallicity, CtoO,
            rainout_condensed_atoms)

    def reinitialize_to_new_climate_PT_picaso(self, df_temp,
                                              df_comp_guess, Kzz_in):
        """Warm-start from a previous steady state (photochem.py:95-131):
        mixing ratios from ``df_comp_guess`` are normalized and handed to
        photochem on the new climate PT."""
        pc = self._pc
        species = set(getattr(pc.dat, 'species_names', [])
                      ) or set(df_comp_guess.keys())
        mix = {k: df_comp_guess[k].to_numpy()[::-1].copy()
               for k in df_comp_guess
               if k in species and k not in ('pressure', 'temperature',
                                             'kz')}
        tot = sum(mix.values())
        mix = {k: v / tot for k, v in mix.items()}
        pc.reinitialize_to_new_climate_PT(
            df_temp['pressure'].to_numpy()[::-1].copy() * 1e6,
            df_temp['temperature'].to_numpy()[::-1].copy(),
            np.asarray(Kzz_in)[::-1].copy(), mix)

    def add_concentrations_to_picaso_df(self, df):
        """Write the current photochem steady state into a picaso profile
        dataframe (photochem.py:36-75), normalized, top-down."""
        pc = self._pc
        sol = pc.return_atmosphere_climate_grid()
        press_dyn = df['pressure'].to_numpy()[::-1].copy() * 1e6
        if not np.all(np.isclose(press_dyn, self.gdat.P_clima_grid)):
            raise ValueError('df pressures do not match the photochem '
                             'climate grid')
        out = df.copy()
        for key, vals in sol.items():
            if key in ('pressure', 'temperature', 'Kzz', 'alt'):
                continue
            out[key] = np.asarray(vals)[::-1]
        gas_cols = [c for c in out.columns
                    if c not in ('pressure', 'temperature', 'kz')]
        tot = out[gas_cols].sum(axis=1)
        out[gas_cols] = out[gas_cols].div(tot, axis=0)
        return out

    def run_for_picaso(self, df, log10metallicity, CtoO, Kzz,
                       df_comp_guess=None, rainout_condensed_atoms=True):
        """Steady-state kinetics on the climate grid (photochem.py:132-183).

        ``df`` is the top-down ``inputs['atmosphere']['profile']``
        dataframe; arrays flip bottom-up and bar -> dyn/cm^2 for
        photochem.  A previous steady state passed as ``df_comp_guess``
        warm-starts the solve (reinitialize path); otherwise the run
        initializes from climate equilibrium at the given metallicity /
        C-to-O.  Returns the dataframe with steady-state gas
        concentrations loaded in.
        """
        pc = self._pc
        if df_comp_guess is None:
            self.initialize_to_climate_equilibrium_PT_picaso(
                df, Kzz, 10.0 ** log10metallicity, CtoO,
                rainout_condensed_atoms)
        else:
            self.reinitialize_to_new_climate_PT_picaso(df, df_comp_guess,
                                                       Kzz)
        converged = pc.find_steady_state()
        if not converged:
            raise RuntimeError('photochem failed to find a steady state')
        sol = pc.return_atmosphere_climate_grid()
        if self.save_file is not None:
            with open(self.save_file, 'ab') as f:
                pickle.dump(sol, f)
        out = df.copy()
        for key, vals in sol.items():
            if key in ('pressure', 'temperature', 'Kzz', 'alt'):
                continue
            out[key] = np.asarray(vals)[::-1]
        return out


def generate_photochem_rx_and_thermo_files(*args, **kwargs):
    """Passthrough to photochem's file generator (photochem.py:185)."""
    _require_photochem()
    from photochem.extensions import gasgiants
    return gasgiants.generate_photochem_rx_and_thermo_files(*args,
                                                            **kwargs)
