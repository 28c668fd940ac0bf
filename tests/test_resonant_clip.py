"""Regression tests for the resonant-ratio switching rule.

Round-5 regression (reverted): widening `_resonant_ratio`'s series arm
to |x| < 0.05 (x = the numerator's product-form exponent) substituted
the true analytic value on lanes where exptrm is CLIPPED
(lamda*dtau > _exp_clip) — de-synchronizing the thermal source terms
from the clip-saturated two-stream system — and under XLA fusion
produced optimizer-dependent NaNs in the layer fluxes.  A converging
48-bin sliced-CK RCE solve collapsed to a 146 K top of atmosphere
(caught by the multichip dryrun).  The rule is pinned back to the
round-4 form: series ONLY at |den| < eps.  See the rejected-alternative
note in rt/toon.py::_resonant_ratio before widening it again.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from picaso_tpu.rt.toon import _resonant_ratio, _safe


def test_series_only_at_tiny_den():
    # moderate den takes the quotient even when the product-form
    # exponent x = hdt*den is small (the round-5 widening is reverted)
    num = jnp.asarray([0.02, 1e-9], jnp.float32)
    den = jnp.asarray([2e-3, 5e-5], jnp.float32)
    limit = jnp.asarray([123.0, 77.0], jnp.float32)  # sentinels

    out = _resonant_ratio(num, den, limit)
    np.testing.assert_allclose(float(out[0]),
                               float(num[0] / _safe(den[0])), rtol=1e-6)
    assert float(out[1]) == 77.0, '|den| < eps lane must take the series'


def test_deep_thermal_source_keeps_clipped_quotient():
    """On a clipped lane (lamda*dtau > 10 at f32) with den in
    [1e-4, 5e-3] the up_full source term's resonant quotient must be
    the (negative) clipped quotient consistent with the saturated
    two-stream system, not the (positive) analytic series — the sign
    flip is what collapsed the RCE solve."""
    dtau = jnp.asarray([30.0], jnp.float32)
    lamda = jnp.asarray([0.4], jnp.float32)
    iubar = 1.0 / 0.4 + 5e-3        # den = lamda*iubar - 1 = 2e-3
    den = lamda * iubar - 1.0
    hdt = dtau / iubar
    xden = hdt * den                # ~0.024: inside the rejected arm
    assert float(jnp.abs(xden)[0]) < 0.05
    clip = 10.0                     # f32 _exp_clip
    assert float((lamda * dtau)[0]) > clip
    exptrm_positive = jnp.exp(jnp.minimum(lamda * dtau, clip))
    exptrm_angle = jnp.exp(-dtau / iubar)
    num = exptrm_positive * exptrm_angle - 1.0
    limit = hdt * (1.0 + xden * (0.5 + xden / 6.0))

    out = _resonant_ratio(num, den, limit)
    # clipped quotient: (exp(10 - 12) - 1)/2e-3 ~ -432; series ~ +12
    assert float(out[0]) < 0.0
    np.testing.assert_allclose(float(out[0]),
                               float((num / _safe(den))[0]), rtol=1e-6)


@pytest.mark.slow
def test_sliced_ck_climate_converges():
    """The exact (unsharded) RCE problem that exposed the regression: a
    stride-4, 48-bin slice of the synthetic 196-bin CK table, 41-level
    700 K brown dwarf.  Converged at round 4; diverged to a 146 K top
    with the widened series arm."""
    from picaso_tpu import justdoit as jdi
    from picaso_tpu.opacities.ck import CKTable, synthetic_ck_table

    ck = synthetic_ck_table()
    a = ck.arrays
    nbin = len(np.asarray(a.wno))
    stride, n_wave = 4, 4
    sl = np.s_[:(nbin // (n_wave * stride)) * n_wave * stride:stride]
    ck_slice = CKTable(
        a._replace(wno=a.wno[sl], delta_wno=a.delta_wno[sl],
                   ln_kappa=a.ln_kappa[:, :, sl, :],
                   cont_opa=a.cont_opa[:, :, sl]),
        ck.molecules, ck.full_abunds, ck.gauss_pts, ck.temps,
        ck.pressures, wno=ck.wno[sl], delta_wno=ck.delta_wno[sl],
        gauss_wts=ck.gauss_wts)
    opa = jdi.opannection(ck_table=ck_slice, method='preweighted')
    case = jdi.inputs(calculation='brown', climate=True)
    case.phase_angle(0)
    case.gravity(gravity=100.0, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.effective_temp(700.0)
    case.setup_nostar()
    case.setup_climate()
    nlevel = 41
    pressure = np.logspace(-4, 2.5, nlevel)
    guess = np.clip(700.0 * (pressure / 10.0) ** 0.12, 250.0, 2800.0)
    case.inputs_climate(temp_guess=guess, pressure=pressure,
                        rcb_guess=nlevel - 8, rfacv=0.0)
    out = case.climate(opa, verbose=False)
    assert out['converged'], 'sliced-CK RCE solve must converge'
    t = np.asarray(out['temperature'])
    assert t.min() > 400.0, f'top-of-atmosphere collapse: {t.min():.0f} K'
