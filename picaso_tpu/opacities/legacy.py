"""Legacy 1460-grid ASCII correlated-K table reader (Lupu tables).

The reference parses this format with hard-coded row/column arithmetic
over a fixed 3-tokens-per-line layout (optics.py:768-1058
``get_legacy_data_1460``).  Here the file is treated as a flat
whitespace-token stream and consumed section by section, which is robust
to line-wrapping differences; the section order and sizes follow the
reference's documented layout for the 24-species / 73x20 P-T / 200
window / 8-gauss tables:

  n_species, species names, elemental abundances
  [max_pc, max_tc, max_ele] (Fortran order), nwno, window centers,
  4-token variant marker, window widths, 4 filler tokens, nc_t,
  nc_p per temperature, dummy header block, pressures (millibar),
  temperatures, (ngauss1, ngauss2, gfrac, ngauss), gauss points and
  weights, 2 filler tokens, kappa [windows, 2*ngauss, max_pc, max_tc]
  (Fortran order, log10 cm^2/g).

Round-tripped by :func:`write_legacy_ascii` (tests/test_factory_ck.py);
absolute offsets inside the dummy blocks may need adjustment for
specific historical files.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ['load_legacy_ck_1460', 'write_legacy_ascii']

# layout constants of the 1460-point Lupu grid (optics.py:783-787)
MAX_ELE = 35
MAX_TC = 73
MAX_PC = 20
MAX_WINDOWS = 200
NGAUSS = 8
N_DUMMY = 37      # tokens in the header block before the pressure table
N_SPECIES = 24


class _Tokens:
    def __init__(self, path):
        with open(path) as f:
            self.toks = f.read().split()
        self.i = 0

    def take(self, n):
        out = self.toks[self.i:self.i + n]
        if len(out) != n:
            raise ValueError(f'legacy ascii truncated: wanted {n} tokens '
                             f'at offset {self.i}, got {len(out)}')
        self.i += n
        return out

    def floats(self, n):
        return np.array(self.take(n), dtype=np.float64)

    def ints(self, n):
        return np.array(self.take(n), dtype=np.float64).astype(int)


def load_legacy_ck_1460(path, max_tc=MAX_TC, max_pc=MAX_PC,
                        max_ele=MAX_ELE, max_windows=MAX_WINDOWS,
                        nspecies=N_SPECIES):
    """Parse a legacy ascii_data CK table into a dict of arrays.

    Returns dict with molecules, abunds [npt, max_ele], wno, delta_wno,
    pressures (bar), temps, nc_p, gauss_pts, gauss_wts, and
    kappa [max_pc, max_tc, nwno, ngauss] (log10, as stored).
    """
    if os.path.isdir(path):
        path = os.path.join(path, 'ascii_data')
    tk = _Tokens(path)
    n_sp = tk.ints(1)[0]
    if n_sp != nspecies:
        nspecies = n_sp
    molecules = tk.take(nspecies)
    abunds = tk.floats(max_ele * max_pc * max_tc).reshape(
        (max_pc, max_tc, max_ele), order='F')
    nwno = tk.ints(1)[0]
    wno = tk.floats(max_windows - 4)
    marker = tk.floats(4)
    delta_wno = tk.floats(max_windows - 4)
    tk.take(4)
    nc_t = tk.ints(1)[0]
    nc_p = tk.ints(max_tc)
    tk.take(N_DUMMY)
    pressures = tk.floats(max_pc * max_tc) / 1e3   # millibar -> bar
    temps = tk.floats(nc_t)
    ng1, ng2 = tk.ints(2)
    gfrac = tk.floats(1)[0]
    ngauss = tk.ints(1)[0]
    gpw = tk.floats(2 * ngauss).reshape(ngauss, 2)
    tk.take(2)
    kappa = tk.floats(max_windows * 2 * ngauss * max_pc * max_tc).reshape(
        (max_windows, 2 * ngauss, max_pc, max_tc), order='F')
    kappa = kappa.swapaxes(1, 3).swapaxes(0, 2)[:, :, :nwno, :ngauss]
    # per-point (P, T) labels for the abundance table, zero-P rows dropped
    pt_press = pressures.reshape(max_tc, max_pc)
    keep = pressures.reshape(max_tc, max_pc) > 0
    return dict(molecules=list(molecules),
                abunds=abunds.reshape(max_pc * max_tc, max_ele, order='F'),
                nwno=nwno, wno=wno[:nwno], delta_wno=delta_wno[:nwno],
                marker=marker, nc_p=nc_p,
                pressures=pressures, temps=temps,
                pressure_labels=pt_press[keep],
                temperature_labels=np.repeat(temps, max_pc).reshape(
                    max_tc, max_pc)[keep],
                gauss_pts=gpw[:, 0], gauss_wts=gpw[:, 1], gfrac=gfrac,
                ngauss=ngauss, kappa=kappa)


def write_legacy_ascii(path, molecules, abunds, wno, delta_wno, nc_p,
                       pressures_bar, temps, gauss_pts, gauss_wts, kappa,
                       gfrac=0.95, max_ele=MAX_ELE, max_windows=None):
    """Emit the legacy token layout (for round-trip tests / migration).

    kappa: [max_pc, max_tc, nwno, ngauss] log10 values; zero-padded out
    to [max_windows, 2*ngauss] in the window/gauss dims like the
    historical files.
    """
    max_pc, max_tc, nwno, ngauss = kappa.shape
    if max_windows is None:
        max_windows = nwno + 4
    toks = [len(molecules)]
    toks += list(molecules)
    ab = np.zeros((max_pc, max_tc, max_ele))
    ab[:, :, :abunds.shape[-1]] = np.asarray(abunds).reshape(
        max_pc, max_tc, -1, order='F')
    toks += list(ab.ravel(order='F'))
    toks += [nwno]
    w = np.zeros(max_windows - 4)
    w[:nwno] = wno
    toks += list(w)
    toks += [9.0, 9.0, 9.0, 9.0]          # variant marker (non-zero)
    dw = np.zeros(max_windows - 4)
    dw[:nwno] = delta_wno
    toks += list(dw)
    toks += [0.0] * 4
    toks += [len(temps)]
    toks += list(np.asarray(nc_p, int))
    toks += [0.0] * N_DUMMY
    toks += list(np.asarray(pressures_bar) * 1e3)
    toks += list(temps)
    toks += [ngauss // 2, ngauss // 2, gfrac, ngauss]
    toks += [v for p_w in zip(gauss_pts, gauss_wts) for v in p_w]
    toks += [0.0] * 2
    kap = np.zeros((max_windows, 2 * ngauss, max_pc, max_tc))
    kap[:nwno, :ngauss] = np.moveaxis(np.asarray(kappa), (0, 1), (2, 3))
    toks += list(kap.ravel(order='F'))
    toks += [0.0] * 2
    with open(path, 'w') as f:
        for i in range(0, len(toks), 3):
            f.write(' '.join(str(t) for t in toks[i:i + 3]) + '\n')
