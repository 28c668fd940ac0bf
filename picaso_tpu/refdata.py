"""Reference-data location.

Small public data tables (Raman cross sections, cloud wavelength grids,
adiabat tables, base-case profiles) ship inside the package under
``picaso_tpu/refdata``.  Larger artifacts (opacity databases, CK tables,
stellar grids) live wherever the ``picaso_refdata`` /
``picaso_tpu_refdata`` environment variable points, using the same directory
layout as the reference distribution so existing downloads work unchanged.
"""

from __future__ import annotations

import json
import os

__all__ = ['refdata_path', 'bundled_refdata', 'external_refdata',
           'load_default_config']

_BUNDLED = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'refdata')


def bundled_refdata() -> str:
    return _BUNDLED


def external_refdata():
    """User-pointed refdata dir (reference-compatible layout), or None."""
    return (os.environ.get('picaso_tpu_refdata')
            or os.environ.get('picaso_refdata'))


def refdata_path(*parts) -> str:
    """Resolve a refdata-relative path, preferring the external dir."""
    ext = external_refdata()
    if ext is not None:
        p = os.path.join(ext, *parts)
        if os.path.exists(p):
            return p
    p = os.path.join(_BUNDLED, *parts)
    if os.path.exists(p):
        return p
    raise FileNotFoundError(
        f'reference data {"/".join(parts)} not found in '
        f'{ext or "(no external refdata set)"} or bundled {_BUNDLED}')


def load_default_config() -> dict:
    """The master default configuration tree (reference config.json layout)."""
    with open(refdata_path('config.json')) as f:
        return json.load(f)
