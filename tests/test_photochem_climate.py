"""Photochem-coupled climate loop, proven with a mock kinetics backend.

The real ``photochem`` package (Fortran) is optional and absent here, so
these tests drive the coupled loop with a mock exposing the exact
``run_for_picaso(df, log10mh, CtoO, Kzz, df_comp_guess=)`` interface of
the wrapper (reference photochem.py:132-183): per-iteration kinetics
inside the climate solve with warm starts, exactly as
climate.py:3107-3109 + justdoit.py:2283-2323 wire it.
"""

import numpy as np
import pandas as pd
import pytest

from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities.ck import synthetic_ck_table


class MockPhotochem:
    """Duck-typed stand-in for EvoAtmosphereGasGiantPicaso."""

    def __init__(self):
        self.calls = 0
        self.guesses = []

    def run_for_picaso(self, df, log10metallicity, CtoO, Kzz,
                       df_comp_guess=None, rainout_condensed_atoms=True):
        self.calls += 1
        self.guesses.append(df_comp_guess is not None)
        assert len(Kzz) == len(df['pressure'])
        out = df.copy()
        # a recognizable "kinetic" signature: CH4 frozen at its deep value
        # everywhere (an extreme quench a pure-equilibrium update would
        # immediately erase)
        if 'CH4' in out:
            out['CH4'] = float(np.asarray(out['CH4'])[-1])
        return out


def _setup_case(teff=700, nlevel=31):
    ck = synthetic_ck_table(with_per_gas=True)
    opa = jdi.opannection(ck_table=ck)
    case = jdi.inputs(calculation='browndwarf', climate=True)
    case.effective_temp(teff)
    case.gravity(gravity=100, gravity_unit=jdi.u.Unit('m/(s**2)'))
    pressure = np.logspace(-4, 2.5, nlevel)
    temp_guess = np.clip(teff * 1.2 * (pressure / 30) ** 0.1, 250, None)
    case.inputs_climate(temp_guess=temp_guess, pressure=pressure,
                        rcb_guess=28, rfacv=0.0)
    return opa, case


def test_premix_atmosphere_photochem_drives_kinetics():
    _, case = _setup_case()
    nlevel = 21
    case.inputs['atmosphere']['profile'] = pd.DataFrame({
        'pressure': np.logspace(-4, 2, nlevel),
        'temperature': np.zeros(nlevel) + 900.0,
        'H2': np.zeros(nlevel) + 0.84, 'He': np.zeros(nlevel) + 0.155,
        'CH4': np.linspace(1e-4, 5e-4, nlevel)})
    case.inputs['atmosphere'].setdefault('kzz', {})['sc_kzz'] = \
        np.zeros(nlevel) + 1e9
    pc = MockPhotochem()
    case.inputs['climate']['pc'] = pc
    df = case.premix_atmosphere_photochem()
    assert pc.calls == 1
    assert pc.guesses == [False]                 # cold start
    assert np.allclose(df['CH4'], df['CH4'].iloc[-1])
    # second call warm-starts from the stored steady state
    case.premix_atmosphere_photochem()
    assert pc.guesses[1] is True


def test_premix_atmosphere_photochem_requires_pc():
    _, case = _setup_case()
    nlevel = 11
    case.inputs['atmosphere']['profile'] = pd.DataFrame({
        'pressure': np.logspace(-4, 2, nlevel),
        'temperature': np.zeros(nlevel) + 900.0})
    with pytest.raises(ValueError, match='photochem_init'):
        case.premix_atmosphere_photochem()


@pytest.mark.slow
def test_photochem_coupled_climate_converges():
    """The full RCE loop with per-iteration kinetics (mocked) converges
    and carries the kinetic abundances into the converged profile."""
    opa, case = _setup_case()
    pc = MockPhotochem()
    case.inputs['climate']['pc'] = pc
    out = case.climate(opa, diseq_chem=True, verbose=False)
    temp = out['temperature']
    assert np.isfinite(temp).all()
    assert (np.diff(temp[5:]) > -1e-6).all()
    # kinetics ran every host iteration and warm-started after the first
    assert pc.calls >= 2
    assert pc.guesses[0] is False
    assert all(pc.guesses[1:])
    # the converged chemistry bears the kinetic signature
    prof = case.inputs['atmosphere']['profile']
    assert np.allclose(prof['CH4'], prof['CH4'].iloc[-1])


def test_save_file_restores_newest_record(tmp_path, monkeypatch):
    """The save_file is an append-log (reference photochem.py:172-180);
    a new adapter must warm-start from the NEWEST steady state, exposed
    as a top-down dataframe that reinitialize_* can consume."""
    from picaso_tpu import photochem as pcm

    class FakeBase:
        def __init__(self, *a, **k):
            self.gdat = None

    monkeypatch.setattr(pcm, '_require_photochem', lambda: FakeBase)
    fn = tmp_path / 'photochem_log.pkl'
    import pickle
    with open(fn, 'ab') as f:
        for scale in (1.0, 2.0, 3.0):     # three appended records
            pickle.dump({'pressure': np.array([1e6, 1e5]),
                         'temperature': np.array([900.0, 700.0]),
                         'Kzz': np.array([1e9, 1e9]),
                         'alt': np.array([0.0, 1e7]),
                         'H2O': np.array([1e-4, 2e-4]) * scale}, f)
    pc = pcm.EvoAtmosphereGasGiantPicaso(save_file=str(fn))
    g = pc.initial_guess
    assert g is not None and 'alt' not in g
    # newest record (scale=3), flipped to top-down order
    np.testing.assert_allclose(g['H2O'].to_numpy(), [6e-4, 3e-4])
    np.testing.assert_allclose(g['pressure'].to_numpy(), [1e5, 1e6])
