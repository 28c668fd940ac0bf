"""Radiative-transfer kernels (Toon89 two-stream, spherical harmonics,
transmission geometry, batched tridiagonal/banded solvers)."""

from . import toon, tridiag, transit

__all__ = ['toon', 'tridiag', 'transit']
