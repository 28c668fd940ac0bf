"""Samplers for Bayesian retrievals (TPU-native).

The reference farms likelihood evaluations to MPI ranks under dynesty /
ultranest (driver.py:383-427).  Neither sampler nor MPI is part of this
environment; instead the framework ships two self-contained samplers whose
natural parallel axis — the walker / live-point batch — is a ``vmap`` batch
of forward models on the accelerator:

* :func:`ensemble_sample` — affine-invariant ensemble MCMC (Goodman &
  Weare 2010 stretch move), fully jittable when the log-probability is.
* :func:`nested_sample` — static nested sampling with random-walk
  replacement (MultiNest/PolyChord-style, simplified), evidence + posterior
  weights, checkpoint/resume via pickle.
"""

from __future__ import annotations

import pickle

import numpy as np

__all__ = ['ensemble_sample', 'nested_sample', 'NestedResult']


def ensemble_sample(log_prob_fn, p0, nsteps, seed=0, a=2.0, vectorized=True,
                    progress=False):
    """Affine-invariant ensemble MCMC (stretch move).

    Parameters
    ----------
    log_prob_fn : callable
        Maps [nwalkers, ndim] -> [nwalkers] when ``vectorized`` (the fast
        path: wrap your jit+vmap'd forward model), else a scalar function.
    p0 : array [nwalkers, ndim]
        Initial walker positions (nwalkers must be even).
    Returns (chain [nsteps, nwalkers, ndim], log_probs [nsteps, nwalkers]).
    """
    rng = np.random.default_rng(seed)
    p = np.array(p0, dtype=float)
    nwalkers, ndim = p.shape
    if nwalkers % 2:
        raise ValueError('nwalkers must be even')
    if not vectorized:
        flp = log_prob_fn
        log_prob_fn = lambda x: np.array([flp(xi) for xi in x])
    lp = np.asarray(log_prob_fn(p))
    chain = np.zeros((nsteps, nwalkers, ndim))
    lps = np.zeros((nsteps, nwalkers))
    half = nwalkers // 2
    for step in range(nsteps):
        for first in (True, False):
            sel = slice(0, half) if first else slice(half, nwalkers)
            oth = slice(half, nwalkers) if first else slice(0, half)
            S = p[sel]
            C = p[oth]
            z = ((a - 1.0) * rng.random(half) + 1) ** 2 / a
            partners = C[rng.integers(0, half, half)]
            prop = partners + z[:, None] * (S - partners)
            lp_prop = np.asarray(log_prob_fn(prop))
            log_accept = (ndim - 1) * np.log(z) + lp_prop - lp[sel]
            accept = np.log(rng.random(half)) < log_accept
            p[sel] = np.where(accept[:, None], prop, S)
            lp[sel] = np.where(accept, lp_prop, lp[sel])
        chain[step] = p
        lps[step] = lp
        if progress and step % max(1, nsteps // 10) == 0:
            print(f'step {step}/{nsteps} <logp>={lp.mean():.2f}')
    return chain, lps


class NestedResult(dict):
    """Dict with attribute access: samples, logwt, logz, logl, niter."""

    __getattr__ = dict.__getitem__


def nested_sample(loglike_fn, prior_transform, ndim, nlive=200,
                  dlogz=0.5, max_iter=100000, seed=0, walks=25,
                  checkpoint_file=None, resume=False, vectorized=True,
                  verbose=False):
    """Static nested sampling with random-walk likelihood-constrained
    replacement.

    ``loglike_fn`` maps [n, ndim] -> [n] when vectorized (vmap your
    forward model); ``prior_transform`` maps unit-cube samples [n, ndim]
    -> parameter space.  Returns a NestedResult with equal-weight
    posterior ``samples_equal``, importance weights, and ln-evidence.
    Checkpoints the full sampler state each 100 iterations when
    ``checkpoint_file`` is given (resume=True restarts from it), mirroring
    the dynesty checkpoint/resume capability (driver.py:415-426).
    """
    rng = np.random.default_rng(seed)
    if not vectorized:
        fl = loglike_fn
        loglike_fn = lambda x: np.array([fl(xi) for xi in x])

    if resume and checkpoint_file is not None:
        with open(checkpoint_file, 'rb') as f:
            state = pickle.load(f)
        u = state['u']
        v = state['v']
        logl = state['logl']
        dead_u, dead_v, dead_logl = (state['dead_u'], state['dead_v'],
                                     state['dead_logl'])
        it0 = state['it']
        logz, logvol = state['logz'], state['logvol']
        rng = state['rng']
    else:
        u = rng.random((nlive, ndim))
        v = np.asarray(prior_transform(u))
        logl = np.asarray(loglike_fn(v))
        dead_u, dead_v, dead_logl = [], [], []
        it0 = 0
        logz = -1e300
        logvol = 0.0

    def logaddexp(a, b):
        return np.logaddexp(a, b)

    it = it0
    dlv = np.log((nlive + 1.0) / nlive)  # expected shrinkage per iteration
    while it < max_iter:
        worst = int(np.argmin(logl))
        logl_star = logl[worst]
        logwt = logvol + np.log1p(-np.exp(-dlv)) + logl_star
        logz = logaddexp(logz, logwt)
        dead_u.append(u[worst].copy())
        dead_v.append(np.asarray(v[worst]).copy())
        dead_logl.append(float(logl_star))
        logvol -= dlv

        # random-walk replacement from a random surviving live point,
        # batched likelihood evaluations across the walk
        start = int(rng.integers(0, nlive))
        while start == worst and nlive > 1:
            start = int(rng.integers(0, nlive))
        cur_u = u[start].copy()
        cur_logl = logl[start]
        scale = 0.1
        for _ in range(walks):
            props = cur_u[None, :] + scale * rng.standard_normal(
                (4, ndim))
            props = np.clip(props, 1e-10, 1 - 1e-10)
            pv = np.asarray(prior_transform(props))
            pl = np.asarray(loglike_fn(pv))
            ok = pl > logl_star
            if ok.any():
                k = int(np.argmax(ok))
                cur_u, cur_logl = props[k], pl[k]
                scale *= 1.1
            else:
                scale *= 0.8
        u[worst] = cur_u
        v = np.asarray(v)
        v[worst] = np.asarray(prior_transform(cur_u[None]))[0]
        logl[worst] = cur_logl

        it += 1
        # remaining-evidence stopping criterion
        logz_remain = logvol + logl.max()
        if logaddexp(logz, logz_remain) - logz < dlogz:
            break
        if verbose and it % 200 == 0:
            print(f'nested it={it} logz={logz:.2f} '
                  f'dlogz={logaddexp(logz, logz_remain) - logz:.2f}')
        if checkpoint_file is not None and it % 100 == 0:
            with open(checkpoint_file, 'wb') as f:
                pickle.dump(dict(u=u, v=np.asarray(v), logl=logl,
                                 dead_u=dead_u, dead_v=dead_v,
                                 dead_logl=dead_logl, it=it, logz=logz,
                                 logvol=logvol, rng=rng), f)

    # add remaining live points
    for i in np.argsort(logl):
        logwt = logvol - np.log(nlive) + logl[i]
        logz = logaddexp(logz, logwt)
        dead_u.append(u[i].copy())
        dead_v.append(np.asarray(v[i]).copy())
        dead_logl.append(float(logl[i]))

    dead_v = np.asarray(dead_v)
    dead_logl = np.asarray(dead_logl)
    n_dead = len(dead_logl)
    # reconstruct weights
    logvols = -dlv * np.arange(1, n_dead - nlive + 1)
    logvols = np.concatenate([logvols,
                              np.full(nlive, logvols[-1] if len(logvols)
                                      else 0.0) - np.log(nlive)])
    logwt = logvols + dead_logl
    logwt -= np.max(logwt)
    wt = np.exp(logwt)
    wt /= wt.sum()
    # equal-weight resample
    idx = np.random.default_rng(seed + 1).choice(n_dead, size=n_dead,
                                                 p=wt)
    return NestedResult(samples=dead_v, logl=dead_logl, weights=wt,
                        logz=float(logz), samples_equal=dead_v[idx],
                        niter=it)
