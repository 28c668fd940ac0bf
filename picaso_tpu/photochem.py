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
            try:
                with open(save_file, 'rb') as f:
                    self.initial_guess = pickle.load(f)
            except (FileNotFoundError, EOFError):
                pass

    def run_for_picaso(self, pressure_bar, temperature, kzz,
                       initial_guess=None):
        """Steady-state mixing ratios on the (top-down) climate grid.

        Flips arrays bottom-up and bar -> dyn/cm^2 for photochem
        (photochem.py:89-93), warm-starts from the previous steady state,
        and returns a dict molecule -> top-down vmr profile.
        """
        pc = self._pc
        press_dyn = np.asarray(pressure_bar)[::-1] * 1e6
        temp_bu = np.asarray(temperature)[::-1]
        kzz_bu = np.asarray(kzz)[::-1]
        guess = initial_guess or self.initial_guess
        pc.initialize_to_climate_equilibrium_PT(
            press_dyn, temp_bu, kzz_bu, *([guess] if guess is not None
                                          else []))
        converged = pc.find_steady_state()
        if not converged:
            raise RuntimeError('photochem failed to find a steady state')
        sol = pc.return_atmosphere()
        self.initial_guess = sol
        if self.save_file is not None:
            with open(self.save_file, 'wb') as f:
                pickle.dump(sol, f)
        out = {}
        for key, vals in sol.items():
            if key in ('pressure', 'temperature', 'Kzz', 'alt'):
                continue
            out[key] = np.interp(
                np.log(np.asarray(pressure_bar) * 1e6),
                np.log(sol['pressure'][::-1]),
                np.asarray(vals)[::-1])
        return out


def generate_photochem_rx_and_thermo_files(*args, **kwargs):
    """Passthrough to photochem's file generator (photochem.py:185)."""
    _require_photochem()
    from photochem.extensions import gasgiants
    return gasgiants.generate_photochem_rx_and_thermo_files(*args,
                                                            **kwargs)
