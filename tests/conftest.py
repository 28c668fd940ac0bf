"""Test configuration: CPU backend with 8 virtual devices + float64.

Numerical-parity tests run in float64 on the host CPU backend (the reference
numba kernels are float64); sharding tests use the 8 virtual CPU devices.
TPU-specific performance paths are exercised by bench.py on real hardware.

NOTE: this sandbox pre-imports jax via a sitecustomize hook that registers
the remote 'axon' TPU backend and sets JAX_PLATFORMS=axon, so plain env-var
overrides are too late — we must go through jax.config here.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # for any subprocesses tests spawn
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
