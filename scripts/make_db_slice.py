#!/usr/bin/env python
"""Build a narrow-wavelength slice of a production opacity DB.

Usage:
    python scripts/make_db_slice.py SRC.db DST.db WMIN_UM WMAX_UM [MOL ...]

The production R=15k monochromatic database is a ~7 GB download
(picaso_tpu.data.get_data('resampled_opacity')); a 0.5-0.7 um slice is
tens of MB and un-skips the real-data golden regression
(tests/test_goldens.py) over the covered window: point the test at the
slice with PICASO_TPU_GOLDEN_DB=DST.db or install it as
$picaso_refdata/opacities/opacities.db.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from picaso_tpu.opacities.factory import slice_db

if __name__ == '__main__':
    if len(sys.argv) < 5:
        print(__doc__)
        sys.exit(1)
    src, dst, wmin, wmax = sys.argv[1:5]
    mols = sys.argv[5:] or None
    out = slice_db(src, dst, [float(wmin), float(wmax)], molecules=mols)
    print(f'wrote {out} ({os.path.getsize(out)/1e6:.1f} MB)')
