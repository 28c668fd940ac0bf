"""Physics tests for the full AM01 eddysed cloud solver.

The reference outsources cloud microphysics to virga-exo (not
installable here), so the solver is pinned to the published AM01
physics instead of file goldens: Stokes-limit fall velocities, the
closed-form qt transport solution, the eq-18 geometric optical depth,
variable-fsed integrals, and end-to-end sanity on a brown-dwarf-ish
column.  Reference pathway: justdoit.py:4269-4514, climate.py:2842-2925.
"""

import numpy as np
import pandas as pd
import pytest

from picaso_tpu import virga as vj


GRAV = 1e4            # cm/s^2
MMW = 2.2


def _atmo(gas='H2O', fsed=2.0, param='const', nlevel=41, t0=900.0,
          kz=1e9, **kw):
    pressure = np.logspace(-4, 2, nlevel)
    temperature = t0 * (pressure / pressure[-1]) ** 0.1
    atmo = vj.Atmosphere(gas, fsed=fsed, param=param, mmw=MMW, **kw)
    atmo.gravity = GRAV
    atmo.ptk(df=pd.DataFrame({'pressure': pressure,
                              'temperature': temperature,
                              'kz': np.zeros(nlevel) + kz}))
    return atmo


def test_vfall_stokes_limit():
    """Small particles (Re << 1, Kn << 1) follow slip-corrected Stokes."""
    t, p = 300.0, 1e6
    r = 1e-4
    rho_p = 1.0
    v = vj.vfall(r, GRAV, MMW, t, p, rho_p)
    visc = vj._viscosity(t)
    rho_atm = p * MMW / (vj.R_GAS * t)
    mfp = vj._mean_free_path(t, p, MMW)
    slip = 1 + 1.26 * mfp / r
    v_stokes = slip * 2.0 / 9.0 * (rho_p - rho_atm) * GRAV * r ** 2 / visc
    assert v == pytest.approx(v_stokes, rel=1e-10)
    assert 2 * r * rho_atm * v / visc < 1     # confirms the regime


def test_vfall_monotone_and_continuous():
    r = np.logspace(-7, 0, 400)
    v = vj.vfall(r, GRAV, MMW, 1000.0, 1e6, 3.0)
    assert np.all(np.diff(v) > 0)
    # no regime-boundary jumps larger than the local trend
    ratio = v[1:] / v[:-1]
    assert ratio.max() < 1.6


def test_solve_rw_inverts_vfall():
    w = np.array([0.1, 10.0, 1e3, 1e5])
    rw = vj._solve_rw(w, GRAV, MMW, 800.0, 1e6, 2.0)
    v = vj.vfall(rw, GRAV, MMW, 800.0, 1e6, 2.0)
    np.testing.assert_allclose(v, w, rtol=1e-6)


def test_qt_transport_closed_form():
    """In an isothermal sublayer the _layer march reproduces the
    analytic qt = qvs + (qb - qvs) exp(-fsed dz / L) solution."""
    nlevel = 41
    pressure = np.logspace(-4, 2, nlevel)
    atmo = vj.Atmosphere('KCl', fsed=1.0, mmw=MMW)
    atmo.gravity = GRAV
    atmo.ptk(df=pd.DataFrame({'pressure': pressure,
                              'temperature': np.zeros(nlevel) + 620.0,
                              'kz': np.zeros(nlevel) + 1e9}))
    gas_mw, rho_p = vj.GAS_PROPERTIES['KCl']
    q_below = 1e-5
    ilay = 20
    qc_l, qt_l, q_above = vj._layer(atmo, 'KCl', q_below, ilay, rho_p,
                                    gas_mw)
    # qvs << the transported qt here, so the closed form is clean
    dz = atmo.dz_layer[ilay]
    expect = q_below * np.exp(-1.0 * dz / atmo.mixl[ilay])
    assert q_above == pytest.approx(expect, rel=2e-2)


def test_optics_am01_eq18():
    """With Qext = 2 the lognormal optics reduce to the AM01 eq-18
    geometric optical depth tau = 3 M_c / (2 rho_p r_eff)."""
    sig = 1.6
    rho_p = 2.0
    rg = 1e-4
    ln2 = 0.5 * np.log(sig) ** 2
    reff = rg * np.exp(5 * ln2)
    mass_col = 1e-4                      # g/cm^2 of condensate
    ndz = 3 * mass_col / (4 * np.pi * rho_p * rg ** 3) * np.exp(-9 * ln2)

    radii, dr = vj.get_r_grid(r_min=1e-7, n_radii=60)
    wave = np.array([0.5, 5.0])
    qext = np.full((len(radii), len(wave)), 2.0)
    ext, scat, cosb = vj._calc_optics(
        wave, radii, dr, qext, 0.9 * qext, 0.5 * qext,
        qc=np.array([1.0]), rg=np.array([rg]), ndz=np.array([ndz]),
        sig=sig, rho_p=rho_p, colden=np.array([1.0]),
        reff=np.array([reff]))
    expect = 3.0 * mass_col / (2.0 * rho_p * reff)
    np.testing.assert_allclose(ext[0], expect, rtol=0.05)
    np.testing.assert_allclose(scat[0] / ext[0], 0.9, rtol=1e-6)


def test_variable_fsed_profile():
    atmo = _atmo(fsed=6.0, param="exp", b=2.0, eps=1e-2)
    z = atmo.z_level
    # anchored: fsed(z_alpha) = fsed (z_alpha defaults to top of grid)
    assert atmo.fsed_at(atmo.z_alpha) == pytest.approx(6.0)
    # decreasing toward depth, floored at eps
    assert atmo.fsed_at(z[-1]) < atmo.fsed_at(z[0])
    assert atmo.fsed_at(-1e12) >= 1e-2
    # exact integral vs numerical quadrature
    zg = np.linspace(z[-1], z[0], 20001)
    num = np.trapezoid(atmo.fsed_at(zg), zg)
    assert atmo.fsed_integral(z[-1], z[0]) == pytest.approx(num, rel=1e-5)


def test_compute_end_to_end_physics():
    atmo = _atmo('H2O', fsed=2.0, t0=400.0)
    out = vj.compute(atmo)
    opd = out['opd_per_layer']
    w0 = out['single_scattering']
    g0 = out['asymmetry']
    assert opd.shape[1] == 196
    assert np.all(np.isfinite(opd)) and opd.min() >= 0
    assert opd.max() > 0, 'a 400 K H2-atmosphere must form a water cloud'
    assert np.all((w0 >= 0) & (w0 <= 1))
    assert np.all((g0 >= -1) & (g0 <= 1))
    cond = out['condensibles']['H2O']
    qt = cond['q_t']
    # qt never increases with altitude above the base (sedimentation);
    # 2% slack for the per-layer adaptive sublayer refinement, which
    # controls the condensate column, not the layer-mean qt
    above = qt[:-1] <= qt[1:] * 1.02 + 1e-20
    assert above[np.nonzero(qt[:-1])[0]].all()
    # condensate only where there is supersaturation
    assert (cond['q_c'] <= qt + 1e-25).all()
    # particle sizes are physical where cloud exists
    has = cond['q_c'] > 0
    assert np.all(cond['r_eff'][has] > 0)
    assert np.all(cond['r_eff'][has] < 1.0)


def test_fsed_controls_vertical_extent():
    """Higher fsed -> more settling -> optically thinner, more compact."""
    thin = vj.compute(_atmo('H2O', fsed=6.0, t0=400.0))
    thick = vj.compute(_atmo('H2O', fsed=0.5, t0=400.0))
    assert thick['opd_per_layer'].sum() > thin['opd_per_layer'].sum()


def test_virtual_cloud_depletes_entering_qt():
    """A condensation point below the grid depletes the vapor entering
    the bottom of the model when do_virtual=True."""
    # warm deep atmosphere: base below the grid for KCl
    nlevel = 31
    pressure = np.logspace(-3, 1.2, nlevel)
    temperature = 900.0 * (pressure / pressure[-1]) ** 0.12
    atmo = vj.Atmosphere('KCl', fsed=1.0, mmw=MMW)
    atmo.gravity = GRAV
    atmo.ptk(df=pd.DataFrame({'pressure': pressure,
                              'temperature': temperature,
                              'kz': np.zeros(nlevel) + 1e9}))
    gas_mw, rho_p = vj.GAS_PROPERTIES['KCl']
    q_deep = vj._deep_abundance('KCl', 1.0) * gas_mw / MMW
    q_enter = vj._virtual_base(atmo, 'KCl', q_deep, rho_p, gas_mw)
    pvap_bot = vj.pvaps.KCl(temperature[-1])
    qvs_bot = pvap_bot / (pressure[-1] * 1e6) * gas_mw / MMW
    if qvs_bot < q_deep:
        assert q_enter < q_deep          # virtual layer depleted it
    else:
        assert q_enter == q_deep


def test_compute_am01_eq17_fsed_scaling_table():
    """AM01 eq. (17) literature pin on the FULL compute() pipeline.

    Ackerman & Marley (2001) close the size distribution with
    r_eff = r_w fsed^(1/alpha) exp(-(alpha+6)/2 ln^2 sigma) *
    exp(5/2 ln^2 sigma), where vfall(r_w) = w* = K/L and alpha is the
    local log-slope of the fall velocity at r_w.  Sweep fsed over a
    fixed profile and check compute()'s r_eff against the published
    closure with r_w and alpha recomputed INDEPENDENTLY here (bisection
    on the fall-velocity law, symmetric finite-difference slope) — the
    "reff ~ fsed^(1/alpha) scaling table" of the paper.
    """
    from scipy.optimize import brentq

    fseds = np.array([0.5, 1.0, 2.0, 4.0])
    conds = {}
    for f in fseds:
        out = vj.compute(_atmo('H2O', fsed=float(f), t0=400.0))
        conds[f] = out['condensibles']['H2O']
    cloudy = np.all([c['q_c'] > 0 for c in conds.values()], axis=0)
    assert cloudy.any(), 'no layer is cloudy across the whole fsed sweep'
    ilay = int(np.nonzero(cloudy)[0][-1])    # deepest common cloudy layer

    atmo = _atmo('H2O', fsed=1.0, t0=400.0)  # same structure every run
    _, rho_p = vj.GAS_PROPERTIES['H2O']
    t_l = atmo.t_layer[ilay]
    p_l = atmo.p_layer[ilay] * 1e6
    w_star = atmo.kz_layer[ilay] / atmo.mixl[ilay]
    rw = brentq(lambda r: vj.vfall(r, GRAV, MMW, t_l, p_l, rho_p) - w_star,
                1e-9, 1.0, xtol=1e-14)
    alpha = (np.log(vj.vfall(rw * 1.1, GRAV, MMW, t_l, p_l, rho_p)
                    / vj.vfall(rw / 1.1, GRAV, MMW, t_l, p_l, rho_p))
             / np.log(1.1 ** 2))
    ln2 = 0.5 * np.log(atmo.sig) ** 2        # ln^2(sigma)/2, sigma = 2
    expect = (rw * fseds ** (1.0 / alpha)
              * np.exp(-(alpha + 6.0) * ln2) * np.exp(5.0 * ln2))
    measured = np.array([conds[f]['r_eff'][ilay] for f in fseds])
    np.testing.assert_allclose(measured, expect, rtol=0.15)
    # the scaling-table exponent itself: d ln r_eff / d ln fsed = 1/alpha
    slope = np.polyfit(np.log(fseds), np.log(measured), 1)[0]
    assert slope == pytest.approx(1.0 / alpha, rel=0.1)


def test_analytic_mode_still_available():
    out = vj.compute(_atmo('H2O', t0=400.0), solver='analytic')
    assert out['opd_per_layer'].shape[1] == 196
    assert out['opd_per_layer'].max() > 0


def test_virga_3d(tmp_path):
    """Per-column clouds on a tiny GCM grid through the user API."""
    from picaso_tpu import justdoit as jdi

    nlevel, nlon, nlat = 25, 3, 2
    pressure = np.logspace(-4, 2, nlevel)
    base_t = 400.0 * (pressure / pressure[-1]) ** 0.1
    temp = np.zeros((nlevel, nlon, nlat))
    for g in range(nlon):
        for t in range(nlat):
            temp[:, g, t] = base_t * (1 + 0.05 * g - 0.02 * t)
    case = jdi.inputs()
    case.phase_angle(0, num_gangle=2, num_tangle=2)
    case.gravity(gravity=25, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.atmosphere_3d({'lat': np.array([-30.0, 30.0]),
                        'lon': np.array([-60.0, 0.0, 60.0]),
                        'pressure': pressure, 'temperature': temp,
                        'kz': np.zeros((nlevel, nlon, nlat)) + 1e9,
                        'H2': np.zeros((nlevel, nlon, nlat)) + 0.84,
                        'He': np.zeros((nlevel, nlon, nlat)) + 0.16})
    case.virga_3d('H2O', fsed=1.0)
    cld = case.inputs['clouds']['profile']
    assert cld['opd'].shape == (nlevel - 1, 196, nlon, nlat)
    assert np.isfinite(cld['opd']).all()
    assert cld['opd'].max() > 0
    # columns differ because their temperatures differ
    assert not np.allclose(cld['opd'][..., 0, 0], cld['opd'][..., 2, 0])


def test_sublayer_temperature_follows_lapse():
    """Sub-layer refinement must COOL going up through a layer that is
    hotter below (the dtdlnp sign regression).  The layer spans
    ~900-926 K where KCl qvs crosses the 5e-3 entry mixing ratio: with
    the correct sign the upper sublayers drop below saturation and
    condense; with the inverted sign every t_mid lands in (926, 951) K
    where qvs > qt, so nothing condenses and qt passes unchanged."""
    nlevel = 41
    pressure = np.logspace(-4, 2, nlevel)
    t_prof = 1565.0 * (pressure / pressure[-1]) ** 0.08
    atmo = vj.Atmosphere('KCl', fsed=10.0, mmw=MMW)
    atmo.gravity = GRAV
    atmo.ptk(df=pd.DataFrame({'pressure': pressure,
                              'temperature': t_prof,
                              'kz': np.zeros(nlevel) + 1e9}))
    gas_mw, rho_p = vj.GAS_PROPERTIES['KCl']
    q_below = 5e-3
    qc_l, qt_l, q_above = vj._layer(atmo, 'KCl', q_below, 20, rho_p,
                                    gas_mw)
    assert qc_l > 0.0
    assert q_above < 0.8 * q_below


def test_mixed_mieff_and_fallback_share_one_wave_grid(tmp_path):
    """Two condensates where only one has a .mieff file must co-add
    optics on ONE wave grid (the mieff table's), not crash or silently
    sum arrays sampled on different grids."""
    nw, nr = 7, 10
    wave = np.linspace(0.4, 6, nw)
    radii = np.logspace(-6, -3, nr)
    lines = [f'{nw} {nr}']
    for r in radii:
        lines.append(f'{r:.6e}')
        for w in wave:
            lines.append(f'{w:.4f} 1.0 2.0 1.6')
    (tmp_path / 'MgSiO3.mieff').write_text('\n'.join(lines))

    nlevel = 41
    pressure = np.logspace(-4, 2, nlevel)
    atmo = vj.Atmosphere(['H2O', 'MgSiO3'], fsed=1.0, mmw=MMW)
    atmo.gravity = GRAV
    atmo.ptk(df=pd.DataFrame({
        'pressure': pressure,
        'temperature': 300.0 * (pressure / pressure[-1]) ** 0.05,
        'kz': np.zeros(nlevel) + 1e9}))
    out = vj.compute(atmo, directory=str(tmp_path))
    assert out['opd_per_layer'].shape == (nlevel - 1, nw)
    assert np.isfinite(out['opd_per_layer']).all()
    np.testing.assert_allclose(np.sort(1e4 / out['wave']),
                               np.sort(1e4 / wave), rtol=1e-3)


def test_h2o_pvap_no_overflow():
    """H2O pvap must not overflow np.exp on extreme profiles.

    np.where evaluates both branches, so the (unselected) liquid branch
    used to overflow for T < 32.2 K where its denominator crosses zero;
    hot layers must stay finite too (clamped exponent).
    """
    import warnings

    import numpy as np

    from picaso_tpu.virga import pvaps

    t = np.array([5.0, 30.0, 32.0, 33.0, 150.0, 300.0, 2000.0, 6000.0])
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        p = pvaps.H2O(t)
    assert np.all(np.isfinite(p)) and np.all(p >= 0)
    # selected-branch values are unchanged by the clamp
    tc = 280.0 - 273.16
    np.testing.assert_allclose(
        pvaps.H2O(np.array([280.0]))[0],
        6.112e3 * np.exp(17.502 * tc / (240.97 + tc)), rtol=1e-12)
