"""picaso_tpu: TPU-native exoplanet/brown-dwarf spectroscopy, climate, and
retrieval framework (JAX/XLA/Pallas).

A ground-up reimplementation of the capabilities of PICASO
(natashabatalha/picaso) designed for TPU hardware: HBM-resident opacity
grids, vmapped/sharded radiative-transfer kernels over the wavelength axis,
jit-compiled climate iteration, and device-mesh parallelism for phase
curves, model grids, and retrievals.

Subsystem map (see README.md):
justdoit (user API) / pipeline (fused forward) / rt (kernels) /
opacities (ingestion + interpolation + factory) / climate (RCE solver) /
chemistry / virga (clouds) / analyze + sampler + retrieval + driver
(fitting) / parallel (mesh sharding) / justplotit / io_utils / references /
data.
"""

__version__ = '0.2.0'

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache, on by default.

    Cold-start wall-clock is a first-class metric for the climate solver
    (BASELINE: RCE end-to-end < 60 s): with a warmed disk cache a fresh
    process skips the 30-60 s XLA compile of the fused Newton programs
    (measured 158 s -> 44 s end-to-end on TPU v5e).  Opt out with
    PICASO_TPU_NO_COMPILE_CACHE=1 or point the dir elsewhere with
    PICASO_TPU_COMPILE_CACHE=<dir>.
    """
    if _os.environ.get('PICASO_TPU_NO_COMPILE_CACHE') == '1':
        return
    import jax

    cache_dir = _os.environ.get(
        'PICASO_TPU_COMPILE_CACHE',
        _os.path.join(_os.path.expanduser('~'), '.cache',
                      'picaso_tpu_xla'))
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:
        pass  # older jax without the knobs — cache is an optimization only


_enable_compilation_cache()

from . import constants, units
from .disco import make_geometry
from .justdoit import inputs, opannection, picaso

__all__ = ['inputs', 'opannection', 'picaso', 'make_geometry', 'constants',
           'units', '__version__']
