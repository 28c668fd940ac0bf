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

from . import constants, units
from .disco import make_geometry
from .justdoit import inputs, opannection, picaso

__all__ = ['inputs', 'opannection', 'picaso', 'make_geometry', 'constants',
           'units', '__version__']
