"""picaso_tpu: TPU-native exoplanet/brown-dwarf spectroscopy, climate, and
retrieval framework (JAX/XLA/Pallas).

A ground-up reimplementation of the capabilities of PICASO
(natashabatalha/picaso) designed for TPU hardware: HBM-resident opacity
grids, vmapped/sharded radiative-transfer kernels over the wavelength axis,
jit-compiled climate iteration, and pjit/mesh parallelism for phase curves,
model grids, and retrievals.
"""

__version__ = '0.1.0'

from . import constants, units
from .disco import make_geometry
from .justdoit import inputs, opannection, picaso

__all__ = ['inputs', 'opannection', 'picaso', 'make_geometry', 'constants',
           'units', '__version__']
