"""Tridiagonal solver correctness vs dense/scipy references."""

import numpy as np
import scipy.linalg

from picaso_tpu.rt.tridiag import tridiag_solve


def _dense_solve(a, b, c, d):
    L = len(b)
    M = np.zeros((L, L))
    for i in range(L):
        M[i, i] = b[i]
        if i > 0:
            M[i, i - 1] = a[i]
        if i < L - 1:
            M[i, i + 1] = c[i]
    return np.linalg.solve(M, d)


def test_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    L, nw = 12, 7
    b = 4.0 + rng.standard_normal((L, nw))
    a = rng.standard_normal((L, nw))
    c = rng.standard_normal((L, nw))
    d = rng.standard_normal((L, nw))
    x = np.asarray(tridiag_solve(a, b, c, d))
    for w in range(nw):
        expect = _dense_solve(a[:, w], b[:, w], c[:, w], d[:, w])
        np.testing.assert_allclose(x[:, w], expect, rtol=1e-10)


def test_tridiag_matches_scipy_banded():
    rng = np.random.default_rng(1)
    L = 40
    b = 5.0 + rng.standard_normal(L)
    a = rng.standard_normal(L)
    c = rng.standard_normal(L)
    d = rng.standard_normal(L)
    ab = np.zeros((3, L))
    ab[0, 1:] = c[:-1]
    ab[1] = b
    ab[2, :-1] = a[1:]
    expect = scipy.linalg.solve_banded((1, 1), ab, d)
    x = np.asarray(tridiag_solve(a[:, None], b[:, None], c[:, None],
                                 d[:, None]))[:, 0]
    np.testing.assert_allclose(x, expect, rtol=1e-9)
