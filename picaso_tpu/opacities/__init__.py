"""Opacity ingestion and on-device interpolation (monochromatic sqlite,
correlated-k tables, continuum, synthetic factory)."""

from . import assemble, db

__all__ = ['assemble', 'db']
