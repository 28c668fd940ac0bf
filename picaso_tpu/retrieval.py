"""Retrieval templates and posterior analysis.

Port of the reference ``retrieval.py`` layer: stamp runnable retrieval
scripts (free / grid / grid-plus / line retrievals against this framework's
samplers), and analyze finished runs (summary statistics, equal-weight
posterior bands, corner plots).
"""

from __future__ import annotations

import os
import textwrap

import numpy as np

__all__ = ['create_template', 'get_info', 'plot_pair', 'spread_plot',
           'data_output', 'summary']

_TEMPLATES = {
    'free': '''\
        """Free retrieval template (picaso_tpu).

        Edit the prior blocks + data path, then `python this_script.py`.
        The sampler batch (live points) evaluates through the vectorized
        forward model.
        """
        import numpy as np
        import pandas as pd
        from picaso_tpu import driver, justdoit as jdi

        config = driver.load_toml('{toml}')
        # supply data directly: (wavelength_micron, y, err)
        df = pd.read_csv(config['InputOutput']['observation_data'])
        data = (df[config['InputOutput']['coord_key']].values,
                df[config['InputOutput']['y_key']].values,
                df[config['InputOutput']['error_key']].values)
        result = driver.run(config, data=data, sampler='nested',
                            nlive=400, checkpoint_file='run.ckpt')
        np.savez('posterior.npz', samples=result['samples_equal'],
                 logz=result['logz'],
                 names=[p['path'] for p in result['fitpars']])
    ''',
    'grid': '''\
        """Grid retrieval template: chi-square fit a precomputed model grid."""
        import numpy as np
        import pandas as pd
        from picaso_tpu.analyze import GridFitter

        fitter = GridFitter('my_grid', location='path/to/models')
        df = pd.read_csv('data.csv')
        res = fitter.fit_grid('my_grid', 'dataset1',
                              df['central_wavelength'].values,
                              df['y'].values, df['err'].values,
                              offset=True)
        print(fitter.best_fit('my_grid', 'dataset1'))
    ''',
    'gridplus': '''\
        """Grid-plus retrieval: interpolated grid + free offset/scale
        parameters sampled with the nested sampler."""
        import numpy as np
        import pandas as pd
        from picaso_tpu.analyze import GridFitter
        from picaso_tpu.sampler import nested_sample

        fitter = GridFitter('my_grid', location='path/to/models')
        df = pd.read_csv('data.csv')
        wl = df['central_wavelength'].values
        y, e = df['y'].values, df['err'].values
        pnames = ['tint', 'mh']       # grid axes to interpolate
        los = fitter.grid_params[pnames].min().values
        his = fitter.grid_params[pnames].max().values

        def transform(u):
            return los + u * (his - los)

        def loglike(thetas):
            out = []
            for t in np.atleast_2d(thetas):
                model = fitter.interp_models(pnames, t)
                binned = np.interp(wl, 1e4 / fitter.wavenumber[::-1],
                                   model[::-1])
                out.append(-0.5 * np.sum((y - binned) ** 2 / e ** 2))
            return np.array(out)

        res = nested_sample(loglike, transform, len(pnames), nlive=200)
        np.savez('posterior.npz', samples=res['samples_equal'])
    ''',
    'line': '''\
        """Line (on-the-fly chemistry) retrieval: visscher equilibrium
        chemistry with retrieved mh/cto + PT parameters."""
        import numpy as np
        from picaso_tpu import driver
        config = driver.load_toml('{toml}')
        config['chemistry']['method'] = 'visscher'
        result = driver.run(config, sampler='nested', nlive=400)
        np.savez('posterior.npz', samples=result['samples_equal'])
    ''',
}


def create_template(kind='free', output_dir='.', toml=None):
    """Write a runnable retrieval script (retrieval.py:38 semantics)."""
    if kind not in _TEMPLATES:
        raise ValueError(f'kind must be one of {list(_TEMPLATES)}')
    from .refdata import refdata_path
    toml = toml or refdata_path('input_tomls', 'driver_example.toml')
    script = textwrap.dedent(_TEMPLATES[kind]).format(toml=toml)
    path = os.path.join(output_dir, f'{kind}_retrieval.py')
    with open(path, 'w') as f:
        f.write(script)
    return path


def get_info(result):
    """Summary of a sampler result: medians + 1-sigma (retrieval.py:139)."""
    samples = np.asarray(result['samples_equal'])
    names = [p['path'] for p in result.get('fitpars',
                                           [{'path': f'p{i}'} for i in
                                            range(samples.shape[1])])]
    info = {}
    for i, name in enumerate(names):
        lo, med, hi = np.percentile(samples[:, i], [16, 50, 84])
        info[name] = dict(median=med, minus=med - lo, plus=hi - med)
    if 'logz' in result:
        info['ln_evidence'] = result['logz']
    return info


def summary(result):
    info = get_info(result)
    lines = []
    for k, v in info.items():
        if isinstance(v, dict):
            lines.append(f"{k} = {v['median']:.4g} "
                         f"(+{v['plus']:.2g}/-{v['minus']:.2g})")
        else:
            lines.append(f'{k} = {v:.4g}')
    return '\n'.join(lines)


def plot_pair(result, parameters=None, bins=25):
    """Corner plot of the equal-weight posterior (retrieval.py:605)."""
    import matplotlib.pyplot as plt
    samples = np.asarray(result['samples_equal'])
    names = [p['path'] for p in result.get('fitpars',
                                           [{'path': f'p{i}'} for i in
                                            range(samples.shape[1])])]
    if parameters is not None:
        idx = [names.index(p) for p in parameters]
        samples = samples[:, idx]
        names = parameters
    n = samples.shape[1]
    fig, axes = plt.subplots(n, n, figsize=(2.2 * n, 2.2 * n))
    axes = np.atleast_2d(axes)
    for i in range(n):
        for j in range(n):
            ax = axes[i][j]
            if j > i:
                ax.axis('off')
            elif i == j:
                ax.hist(samples[:, i], bins=bins, histtype='step')
                ax.set_yticks([])
            else:
                ax.hist2d(samples[:, j], samples[:, i], bins=bins)
            if i == n - 1:
                ax.set_xlabel(names[j], fontsize=8)
            if j == 0 and i > 0:
                ax.set_ylabel(names[i], fontsize=8)
    fig.tight_layout()
    return fig


def spread_plot(result, model_fn, wl, y=None, e=None, n_draws=50,
                percentiles=(16, 50, 84), seed=0):
    """Posterior predictive band (retrieval.py:370-455)."""
    import matplotlib.pyplot as plt
    rng = np.random.default_rng(seed)
    samples = np.asarray(result['samples_equal'])
    draws = samples[rng.integers(0, len(samples), n_draws)]
    models = np.array([model_fn(t) for t in draws])
    lo, med, hi = np.percentile(models, percentiles, axis=0)
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.fill_between(wl, lo, hi, alpha=0.3, label='posterior band')
    ax.plot(wl, med, label='median model')
    if y is not None:
        ax.errorbar(wl, y, yerr=e, fmt='.', color='k', label='data')
    ax.set_xlabel('wavelength (micron)')
    ax.legend()
    return fig, (lo, med, hi)


def data_output(result, filename):
    """Persist posterior samples + metadata (retrieval.py:456)."""
    np.savez(filename,
             samples=np.asarray(result['samples_equal']),
             weights=np.asarray(result.get('weights', [])),
             logz=result.get('logz', np.nan),
             names=[p['path'] for p in result.get('fitpars', [])])
    return filename
