"""Visualization layer (matplotlib).

Port of the reference ``justplotit.py`` plotting surface.  The reference
renders with bokeh; this environment ships matplotlib, so every function
returns a matplotlib Figure (same names, same science content: spectra,
P-T profiles, mixing ratios, photon-attenuation / tau=1 maps, disco maps,
brightness temperature, climate convergence animation, phase curves).
"""

from __future__ import annotations

import numpy as np

from .wavelength import mean_regrid

__all__ = ['spectrum', 'pt', 'mixing_ratio', 'photon_attenuation',
           'taumap', 'disco', 'brightness_temperature',
           'animate_convergence', 'phase_curve', 'pt_adiabat',
           'mean_regrid']


def _fig(**kw):
    import matplotlib.pyplot as plt
    return plt.subplots(**kw)


def spectrum(wno, alb_or_flux, R=None, x_unit='micron', y_label='spectrum',
             ax=None, **plot_kwargs):
    """Plot (optionally binned-down) spectra (justplotit.py:31-120)."""
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = _fig(figsize=(9, 5))
    wno = np.asarray(wno)
    ys = (alb_or_flux if isinstance(alb_or_flux, (list, tuple))
          else [alb_or_flux])
    for y in ys:
        x, yy = (mean_regrid(wno, np.asarray(y), R=R) if R
                 else (wno, np.asarray(y)))
        xs = 1e4 / x if x_unit == 'micron' else x
        order = np.argsort(xs)
        ax.plot(xs[order], yy[order], **plot_kwargs)
    ax.set_xlabel('wavelength (micron)' if x_unit == 'micron'
                  else 'wavenumber (cm-1)')
    ax.set_ylabel(y_label)
    return ax.figure


def pt(full_output=None, pressure=None, temperature=None, ax=None,
       **plot_kwargs):
    """Pressure-temperature profile (log P inverted)."""
    if ax is None:
        _, ax = _fig(figsize=(5, 6))
    if full_output is not None:
        pressure = full_output['level']['pressure']
        temperature = full_output['level']['temperature']
    ax.semilogy(temperature, pressure, **plot_kwargs)
    ax.invert_yaxis()
    ax.set_xlabel('temperature (K)')
    ax.set_ylabel('pressure (bar)')
    return ax.figure


def mixing_ratio(profile_df, limit=1e-9, ax=None):
    """Abundance profiles vs pressure."""
    if ax is None:
        _, ax = _fig(figsize=(7, 6))
    p = np.asarray(profile_df['pressure'])
    for col in profile_df.keys():
        if col in ('pressure', 'temperature', 'kz', 'e-'):
            continue
        y = np.asarray(profile_df[col])
        if np.nanmax(y) < limit:
            continue
        ax.loglog(y, p, label=col)
    ax.invert_yaxis()
    ax.set_xlabel('mixing ratio (v/v)')
    ax.set_ylabel('pressure (bar)')
    ax.legend(fontsize=8, ncol=2)
    return ax.figure


def photon_attenuation(tau_p_surface, wno, at_tau=1, ax=None):
    """tau = at_tau pressure surfaces per species (justplotit.py:426)."""
    if ax is None:
        _, ax = _fig(figsize=(9, 5))
    wave = 1e4 / np.asarray(wno)
    order = np.argsort(wave)
    for name, press in tau_p_surface.items():
        ax.semilogy(wave[order], np.asarray(press)[order], label=name)
    ax.invert_yaxis()
    ax.set_xlabel('wavelength (micron)')
    ax.set_ylabel(f'pressure at tau={at_tau} (bar)')
    ax.legend(fontsize=8, ncol=2)
    return ax.figure


def taumap(full_output_or_xint, wno_index=0, title='tau map'):
    """Facet map of a disk quantity [ng, nt, nwno] (justplotit.py:1019)."""
    import matplotlib.pyplot as plt
    data = np.asarray(full_output_or_xint)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(data[:, :, wno_index].T, origin='lower', aspect='auto')
    fig.colorbar(im, ax=ax)
    ax.set_xlabel('gauss angle index (longitude)')
    ax.set_ylabel('chebyshev angle index (latitude)')
    ax.set_title(title)
    return fig


def disco(xint_at_top, wno, wavelength=None):
    """Disk intensity maps at chosen wavelengths (justplotit.py:692)."""
    import matplotlib.pyplot as plt
    wno = np.asarray(wno)
    waves = wavelength if wavelength is not None else [1e4 / wno[len(wno)
                                                                 // 2]]
    n = len(waves)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
    for ax, wv in zip(axes[0], waves):
        iw = int(np.argmin(np.abs(1e4 / wno - wv)))
        im = ax.imshow(np.asarray(xint_at_top)[:, :, iw].T,
                       origin='lower', aspect='auto')
        fig.colorbar(im, ax=ax)
        ax.set_title(f'{wv:.2f} um')
    return fig


def brightness_temperature(wno, flux, ax=None):
    """T_bright(lambda) from a thermal spectrum (justplotit.py:1781)."""
    from .constants import PLANCK_C1, PLANCK_C2
    if ax is None:
        _, ax = _fig(figsize=(9, 5))
    wno = np.asarray(wno)
    flux = np.asarray(flux)
    # flux = pi * B_l => invert Planck in per-cm wavelength units
    w_cm = 1.0 / wno
    with np.errstate(all='ignore'):
        tb = (PLANCK_C2 / w_cm
              / np.log(1.0 + np.pi * PLANCK_C1 / (flux * w_cm ** 5)))
    wave = 1e4 / wno
    order = np.argsort(wave)
    ax.plot(wave[order], tb[order])
    ax.set_xlabel('wavelength (micron)')
    ax.set_ylabel('brightness temperature (K)')
    return ax.figure


def animate_convergence(all_profiles, pressure, interval=200):
    """Climate iteration animation (justplotit.py:1839)."""
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation
    profs = np.asarray(all_profiles).reshape(-1, len(pressure))
    fig, ax = plt.subplots(figsize=(5, 6))
    line, = ax.semilogy(profs[0], pressure)
    ax.invert_yaxis()
    ax.set_xlim(profs.min() * 0.9, profs.max() * 1.1)
    ax.set_xlabel('temperature (K)')
    ax.set_ylabel('pressure (bar)')

    def update(i):
        line.set_xdata(profs[i])
        ax.set_title(f'iteration {i}')
        return line,

    return FuncAnimation(fig, update, frames=len(profs),
                         interval=interval)


def phase_curve(allout, to_plot='thermal', collapse='sum', R=None, ax=None):
    """Integrated quantity vs phase angle (justplotit.py:1325)."""
    if ax is None:
        _, ax = _fig(figsize=(7, 5))
    phases = sorted(allout.keys())
    vals = []
    for ph in phases:
        y = np.asarray(allout[ph][to_plot])
        vals.append(y.sum() if collapse == 'sum' else y.mean())
    ax.plot(phases, vals, marker='o')
    ax.set_xlabel('phase angle (radians)')
    ax.set_ylabel(f'{collapse}({to_plot})')
    return ax.figure


def pt_adiabat(climate_out, ax=None):
    """Converged climate P-T with the convective zone marked
    (justplotit.py:2157)."""
    if ax is None:
        _, ax = _fig(figsize=(5, 6))
    p = np.asarray(climate_out['pressure'])
    t = np.asarray(climate_out['temperature'])
    nstr = climate_out['cvz_locs']
    ax.semilogy(t, p, label='T(P)')
    conv = slice(nstr[1], nstr[2] + 2)
    ax.semilogy(t[conv], p[conv], lw=4, alpha=0.5, label='convective zone')
    if len(nstr) > 4 and nstr[4] > 0:
        conv2 = slice(nstr[4], nstr[5] + 2)
        ax.semilogy(t[conv2], p[conv2], lw=4, alpha=0.5,
                    label='convective zone 2')
    ax.invert_yaxis()
    ax.set_xlabel('temperature (K)')
    ax.set_ylabel('pressure (bar)')
    ax.legend()
    return ax.figure
