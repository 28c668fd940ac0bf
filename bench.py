"""Headline benchmark: full-resolution 1D reflected+thermal spectrum rate.

Workload (BASELINE.md config 1+2 merged): nwno = 50,000 monochromatic
wavelength points, 90 layers, 6 molecules + 2 CIA continua + Rayleigh,
cloudy, 5 half-sphere Gauss disk angles — the same shape as the reference's
R=15k sqlite workload.  Metric: complete spectra per second on the attached
accelerator, steady-state (post-compile), with temperatures perturbed every
call so nothing is cached.

``vs_baseline``: ratio against a single-host CPU run of the same program
(measured in a JAX_PLATFORMS=cpu subprocess on a wavelength slice and scaled
linearly to full resolution).  Note XLA-CPU is itself faster than the
reference's per-wavelength numba loops, so this ratio *understates* the
speedup over the actual reference baseline.

Prints exactly one JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NWNO = 50_000
NLEVEL = 91
N_ITER = 15


def build_problem(nwno, dtype=np.float32):
    from picaso_tpu.opacities import factory
    from picaso_tpu import pipeline

    wno = np.linspace(300.0, 33000.0, nwno)  # ~0.3-33 um
    grid = factory.synthetic_opacity_grid(
        wno, molecules=('H2O', 'CH4', 'CO', 'NH3', 'CO2', 'H2S'),
        ntemp=15, npress=10, dtype=dtype)
    pressure = np.logspace(-6, 2.5, NLEVEL)
    temperature = np.clip(1200.0 * (pressure / 50.0) ** 0.08, 150.0, None)
    nlevel = NLEVEL
    mix = {'H2': np.zeros(nlevel) + 0.84, 'He': np.zeros(nlevel) + 0.155,
           'H2O': np.zeros(nlevel) + 1e-3, 'CH4': np.zeros(nlevel) + 5e-4,
           'CO': np.zeros(nlevel) + 3e-4, 'NH3': np.zeros(nlevel) + 1e-4,
           'CO2': np.zeros(nlevel) + 1e-5, 'H2S': np.zeros(nlevel) + 1e-5}
    nlayer = nlevel - 1
    cld = {'opd': np.repeat(np.linspace(0.0, 1.0, nlayer) ** 2, nwno),
           'g0': np.zeros(nlayer * nwno) + 0.85,
           'w0': np.zeros(nlayer * nwno) + 0.95}
    scene, config = pipeline.scene_from_arrays(
        pressure, temperature, mix, grid, gravity=2500.0,
        radius=7.1492e9, mass=1.898e30, cld=cld, dtype=dtype)
    import dataclasses
    import jax
    config = dataclasses.replace(
        config, use_pallas=jax.default_backend() not in ('cpu', 'gpu'))
    return scene, grid, config


def measure(nwno, n_iter, dtype=np.float32):
    import jax
    from picaso_tpu import pipeline

    scene, grid, config = build_problem(nwno, dtype)
    out = pipeline.forward(scene, grid, config)   # compile
    jax.block_until_ready(out)

    # pre-stage the perturbed scenes so host work is out of the timing loop
    scenes = [scene._replace(tlevel=scene.tlevel * (1 + 0.001 * i),
                             tlayer=scene.tlayer * (1 + 0.001 * i))
              for i in range(n_iter)]
    jax.block_until_ready(scenes)

    t0 = time.perf_counter()
    outs = None
    for s in scenes:
        outs = pipeline.forward(s, grid, config)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return n_iter / dt


def main():
    if '--cpu-baseline' in sys.argv:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        nwno_cpu = 5_000
        rate = measure(nwno_cpu, 5)
        # linear scaling in nwno (workload is embarrassingly parallel there)
        print(json.dumps({'cpu_rate_full': rate * nwno_cpu / NWNO}))
        return

    import jax
    rate = measure(NWNO, N_ITER)

    # CPU baseline in a clean subprocess (this process owns the TPU backend)
    try:
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--cpu-baseline'],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        cpu_rate = json.loads(res.stdout.strip().splitlines()[-1]
                              )['cpu_rate_full']
        vs_baseline = rate / cpu_rate
    except Exception:
        vs_baseline = float('nan')

    print(json.dumps({
        'metric': 'full-res 1D reflected+thermal spectra/sec '
                  f'(nwno={NWNO}, nlevel={NLEVEL}, '
                  f'{jax.devices()[0].platform})',
        'value': round(rate, 4),
        'unit': 'spectra/s',
        'vs_baseline': (round(vs_baseline, 2)
                        if vs_baseline == vs_baseline else None),
    }))


if __name__ == '__main__':
    main()
