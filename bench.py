"""Benchmarks for every BASELINE.md config, at production workload shapes.

Headline metric (the printed JSON line's value): full-resolution 1D
reflected+thermal spectrum rate at the PRODUCTION opacity-table shape —
the ragged 1060-point (T, P) grid of the real monochromatic DBs, 16
molecules, nwno = 50,000 (R~15k window), 90 layers, 2 CIA continua,
Rayleigh, cloudy, 10 half-sphere Gauss disk angles.  The opacity cube is
synthetic-valued but production-SIZED (16 x 1060 x 50k f32 = 3.4 GB in
HBM), so HBM pressure, the ragged index math, and molecule count match
the real workload.  Steady-state rate, temperatures perturbed every call.

The other BASELINE configs ride in the same JSON line under "extra":
  - climate_s / climate_661_s / climate_cloudy_s / climate_diseq_s: the
    four production climate modes (chemeq 196-bin legacy EGP, 661-bin
    grid, virga-coupled cloudy, disequilibrium resort-rebin+quench), all
    solved in ONE fresh TPU subprocess: the axon relay's per-process
    device handshake costs anywhere from seconds to ~4 minutes (relay
    weather, not framework work), so paying it once instead of
    once-per-mode is the difference between fitting the driver window
    and timing out (round 4 paid it 8x and was killed).  Per-mode time
    covers opannection + setup + the full RCE solve in that process
    (persistent XLA disk cache warm, the steady cold-START a user sees).
  - sh4_spectra_per_s / sh4_fullres_spectra_per_s: SH 4-stream
    reflected+thermal rate, native f32 in-process (rt/sh.py incoming
    grouping) at nwno=2000 and the full 5e4 grid;
    sh4_phase_curve_points_per_s is BASELINE config #4 (3D disco-ball
    phase curve through SH4, one batched dispatch).
  - likelihoods_per_s: batched forward + chi^2 (the retrieval
    nested-sampling inner loop) at production shape.
  - gather_stage_ms / rt_stage_ms / rt_exp_utilization: per-stage
    split of the forward program.  Both stages are timed DIRECTLY
    (the jitted gather kernel; the jitted dual-pass RT megakernel on
    precomputed inputs) — no wall-clock subtraction — and the exp peak
    comes from a 64-deep dependent-exp chain (one HBM read+write per
    64 exps, so bandwidth is <2% of the microbenchmark's cost; the
    round-4 version streamed 4 exps/element and measured HBM bandwidth,
    not VPU throughput, which is how it reported utilization > 1).
  - transit_spectra_per_s: full-res transmission rate.
  - vs_reference_numpy: measured rate of the ACTUAL reference
    implementation (numba shimmed to pure numpy — numba isn't installed
    here; note compiled numba would be faster than this numpy figure) on
    the same physics at a wavelength slice, scaled linearly in nwno.
    Cached in bench_cache.json (the reference's rate doesn't change
    round to round) — refresh with PICASO_BENCH_REFRESH=1.
  - vs_baseline (top-level): ratio against this same XLA program on one
    CPU host — a conservative lower bound (XLA-CPU already beats the
    reference's loops).  Also cached.

Budget discipline: PICASO_BENCH_BUDGET_S (default 750 s) is a hard
deadline.  After every stage the would-be-final JSON is written to
BENCH_PARTIAL.json; a stage only starts if its estimated cost fits the
remaining budget (skips are recorded in extra.skipped); SIGTERM/SIGINT
print the final line from whatever has been gathered.  Stdout carries
ONLY the final JSON line.

Prints exactly one JSON line.
"""

import dataclasses
import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get('PICASO_BENCH_BUDGET_S', 750))
_HERE = os.path.dirname(os.path.abspath(__file__))


def _mark(msg):
    """Stage progress on stderr (stdout carries ONLY the JSON line)."""
    print(f'[bench +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def _remaining():
    return _BUDGET_S - (time.perf_counter() - _T0)


NWNO = 50_000
NLEVEL = 91
# enough timed iterations to amortize the axon relay's ~25-45 ms
# device->host round trip (paid once per timed region at the final
# block_until_ready): at ~7 ms/spectrum, 30 iterations keep the bias
# under ~15%; fewer (round 3 used 15, and only 2 for the batched path)
# systematically under-reports the faster configurations
N_ITER = 30

MOLECULES_16 = ('H2O', 'CH4', 'CO', 'NH3', 'CO2', 'H2S', 'TiO', 'VO',
                'Na', 'K', 'FeH', 'C2H2', 'HCN', 'PH3', 'SO2', 'CrH')
MIX_16 = {'H2O': 1e-3, 'CH4': 5e-4, 'CO': 3e-4, 'NH3': 1e-4, 'CO2': 1e-5,
          'H2S': 3e-5, 'TiO': 1e-7, 'VO': 1e-8, 'Na': 1e-6, 'K': 1e-7,
          'FeH': 1e-8, 'C2H2': 1e-7, 'HCN': 1e-7, 'PH3': 1e-6,
          'SO2': 1e-8, 'CrH': 1e-9}


def build_problem(nwno, dtype=np.float32, nlevel=NLEVEL, production=True,
                  blocked='f32'):
    """Scene + grid + config at the requested size.

    production=True uses the ragged 1060-point PT grid with 16 molecules
    (the real table shape); False keeps a small regular grid (used by
    tests and the verify drives for quick iteration).  blocked='int16'
    stores the Pallas gather layout quantized (half the HBM).
    """
    from picaso_tpu.opacities import factory
    from picaso_tpu import pipeline

    wno = np.linspace(300.0, 33000.0, nwno)  # ~0.3-33 um
    if production:
        grid = factory.synthetic_opacity_grid_ragged(
            wno, molecules=MOLECULES_16, dtype=dtype)
        mix_vals = MIX_16
    else:
        grid = factory.synthetic_opacity_grid(
            wno, molecules=('H2O', 'CH4', 'CO', 'NH3', 'CO2', 'H2S'),
            ntemp=15, npress=10, dtype=dtype)
        mix_vals = {m: MIX_16[m] for m in grid.molecules}
    pressure = np.logspace(-6, 2.5, nlevel)
    temperature = np.clip(1200.0 * (pressure / 50.0) ** 0.08, 150.0, None)
    mix = {'H2': np.zeros(nlevel) + 0.84, 'He': np.zeros(nlevel) + 0.155}
    for m, v in mix_vals.items():
        mix[m] = np.zeros(nlevel) + v
    nlayer = nlevel - 1
    cld = {'opd': np.repeat(np.linspace(0.0, 1.0, nlayer) ** 2, nwno),
           'g0': np.zeros(nlayer * nwno) + 0.85,
           'w0': np.zeros(nlayer * nwno) + 0.95}
    scene, config = pipeline.scene_from_arrays(
        pressure, temperature, mix, grid, gravity=2500.0,
        radius=7.1492e9, mass=1.898e30, cld=cld, rstar=6.96e10,
        dtype=dtype)
    import jax
    use_pallas = jax.default_backend() not in ('cpu', 'gpu')
    config = dataclasses.replace(config, use_pallas=use_pallas)
    if use_pallas:
        grid = grid.with_blocked_table(quantize=(blocked == 'int16'))
    return scene, grid, config


def _warm_tunnel():
    """Absorb the one-time device->host handshake before any timed region.

    On the axon remote-TPU relay the FIRST device-to-host readback of a
    process pays a long, wildly variable (seconds to minutes) tunnel
    handshake; every subsequent transfer is fast.  This is relay
    infrastructure, not framework work — measured timings must exclude
    it (round-2's climate_first_compile_s=484 s was almost entirely this
    stall: the true cold-compile RCE solve is ~35 s).
    """
    import jax
    import jax.numpy as jnp
    np.asarray(jnp.zeros(1))


def _rate(fn, scenes, n_iter, n_pass=3):
    """Best-of-n_pass rate: a timed region of ~n_iter*6 ms can eat a
    single ~40 ms relay hiccup (20% one-sided noise at n_iter=30), so
    repeat the whole pass and keep the fastest — the standard min-time
    estimator for a deterministic device-bound workload."""
    import jax
    _warm_tunnel()
    out = fn(scenes[0])
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(n_pass):
        t0 = time.perf_counter()
        for s in scenes[1:n_iter + 1]:
            out = fn(s)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_iter / best


def _perturbed(scene, n):
    return [scene._replace(tlevel=scene.tlevel * (1 + 0.001 * i),
                           tlayer=scene.tlayer * (1 + 0.001 * i))
            for i in range(n + 1)]


def measure(nwno, n_iter, dtype=np.float32, production=True,
            config_patch=None, blocked='f32'):
    from picaso_tpu import pipeline

    scene, grid, config = build_problem(nwno, dtype, production=production,
                                        blocked=blocked)
    if config_patch:
        config = dataclasses.replace(config, **config_patch)
    scenes = _perturbed(scene, n_iter)
    return _rate(lambda s: pipeline.forward(s, grid, config), scenes,
                 n_iter)


HBM_PEAK_GBPS = 819.0   # TPU v5e HBM2 peak per chip


def _roofline(rate, grid, nlayer, fused=True):
    """Achieved-HBM-bandwidth accounting for the fused forward.

    Analytic byte count (XLA cost analysis would need a second remote
    compile, and the relay's /remote_compile endpoint is unreliable):
    the opacity gather reads [nmol, block] rows for 4 (1/T, logP)
    neighbors per layer; with the fused-optics megakernels
    (pipeline.SpectrumConfig.fuse_optics) the RT stages then re-read
    only the 6 per-source fields (the 13-field RTProps set never exists
    in HBM), otherwise they write + read the full property set.  The
    gather stage alone is memory-bound and was measured at ~470 GB/s
    (~95% of what its access pattern can achieve; docs/architecture.md
    "Memory layout"); the remaining wall-clock is VPU-bound
    transcendental work in the RT megakernels, which is why the
    whole-program fraction of HBM peak sits well below 1 — the kernel
    set is compute-limited, not bandwidth-limited, past the
    blocked-gather optimization.
    """
    nmol = len(grid.molecules)
    nwno = int(np.asarray(grid.wno).shape[0])
    gather_bytes = 4 * nlayer * nmol * nwno * 4        # neighbor rows
    if fused:
        # reflected reads 6 source fields, thermal 5 + the level
        # blackbody; one taugas write+read between gather and RT
        props_bytes = (6 + 5 + 1) * nlayer * nwno * 4 + 2 * nlayer * nwno * 4
    else:
        props_bytes = 13 * nlayer * nwno * 4 * 2       # write + read
    total = gather_bytes + props_bytes
    gbps = total * rate / 1e9
    return {'hbm_gbytes_per_spectrum': round(total / 1e9, 3),
            'hbm_achieved_gbps': round(gbps, 1),
            'hbm_roof_frac': round(gbps / HBM_PEAK_GBPS, 3),
            'hbm_note': 'whole-program; the memory-bound gather stage '
                        'runs at ~470 GB/s, the rest is VPU-bound RT '
                        'compute (see docs/architecture.md)'}


def _measure_exp_peak():
    """Device exp throughput from a 64-deep DEPENDENT exp chain.

    Each element does 64 serial exps between one HBM read and one HBM
    write, so memory traffic is 8 bytes / 64 exps — under 2% of the
    kernel's cost at any plausible exp rate — and XLA fuses the chain
    into a single elementwise kernel.  Different vector chunks pipeline
    independently, so this measures VPU exp THROUGHPUT, not latency.
    (The round-4 microbenchmark did 4 exps per element over a 128 MB
    array: HBM-bandwidth-bound, which underestimated the peak several
    fold and pushed the reported "utilization" past 1.)
    """
    import jax
    import jax.numpy as jnp

    n = 4 * 1024 * 1024
    chain = 64
    x = jnp.linspace(0.1, 1.5, n).astype(jnp.float32)

    @jax.jit
    def run(x, c):
        y = x
        for _ in range(chain):
            y = jnp.exp(-y) + c   # fixed point ~0.567: stable, no overflow
        return y

    y = run(x, jnp.float32(0.0))
    jax.block_until_ready(y)
    reps = 16
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            y = run(x, jnp.float32(1e-6 * i))   # defeat relay dedupe
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    return chain * reps * n / best


def _rt_utilization(scene, grid, config, headline_rate, scenes):
    """Achieved-vs-peak accounting for the VPU-bound RT stage.

    Both stages are timed DIRECTLY with the same jitted kernels the
    forward program runs — gather via pipeline.gather_taugas, RT via
    the dual-pass megakernel (rt/pallas_toon.spectrum_pallas_fused) on
    precomputed inputs — so no stage time is inferred by subtraction.
    The analytic exp census matches the kernel source after the round-4
    exp-reuse pass (pallas_toon.py): reflected 5 exps per disk angle
    (x_up, e_u0dt, e_u1, the two ssterm exponentials) + 1 shared
    (exptrm), thermal 1 per angle (midpoint transmission; the full-layer
    one is its square) + 2 shared (exptrm, midpoint exptrm), all per
    [nlayer, nwno] element, + the b_top row.  The level blackbody is
    computed OUTSIDE the megakernel and is excluded here.  exp dominates
    the kernel's VPU time but divides/rsqrt/the Thomas sweeps also run
    on the VPU, so utilization is an honest floor.
    """
    import jax
    from picaso_tpu import pipeline
    from picaso_tpu.rt import toon
    from picaso_tpu.rt.pallas_toon import spectrum_pallas_fused

    n = min(len(scenes) - 1, 20)
    gather = jax.jit(pipeline.gather_taugas, static_argnames=('config',))
    out = gather(scenes[0], grid, config)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for s in scenes[1:n + 1]:
            out = gather(s, grid, config)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    gather_s = best / n

    # RT stage: the dual-pass megakernel on precomputed inputs, exactly
    # as forward invokes it (pipeline.forward fused-optics path)
    import jax.numpy as jnp
    tg = out.astype(scene.cld_opd.dtype)
    dtype = scene.cld_opd.dtype
    nlayer = int(scene.tlayer.shape[0])
    nwno = int(np.asarray(grid.wno).shape[0])
    tr = jnp.zeros((nlayer, nwno), dtype) + 1e-4
    rf = jnp.full((nlayer, nwno), 0.99999, dtype)
    all_b = toon.blackbody(scene.tlevel, 1.0 / grid.wno).astype(dtype)
    ptfac = scene.plevel[0] / (scene.plevel[1] - scene.plevel[0])

    def rt(all_b, tg):
        return spectrum_pallas_fused(
            all_b, tg, tr, scene.cld_opd, scene.cld_w0, scene.cld_g0,
            rf, ptfac, scene.surf_reflect, scene.ubar0, scene.ubar1,
            scene.cos_theta, scene.F0PI, controls=config.controls,
            stream=config.stream, delta_eddington=config.delta_eddington,
            hard_surface=config.hard_surface)

    o = rt(all_b, tg)
    jax.block_until_ready(o)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            o = rt(all_b * (1 + 1e-6 * i), tg)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    rt_s = best / n

    nang = int(np.asarray(scene.ubar0).size)
    per_lw = nlayer * nwno
    exp_reflected = (5 * nang + 1) * per_lw
    exp_thermal = (1 * nang + 2) * per_lw + nwno   # + b_top row
    exp_total = exp_reflected + exp_thermal

    peak_exp_per_s = _measure_exp_peak()
    achieved = exp_total / rt_s
    other_ms = max(0.0, 1e3 * (1.0 / headline_rate - gather_s - rt_s))
    return {
        'gather_stage_ms': round(gather_s * 1e3, 2),
        'rt_stage_ms': round(rt_s * 1e3, 2),
        'other_stage_ms': round(other_ms, 2),
        'rt_exp_per_spectrum_M': round(exp_total / 1e6, 1),
        'device_exp_peak_G_per_s': round(peak_exp_per_s / 1e9, 1),
        'rt_exp_utilization': round(achieved / peak_exp_per_s, 3),
        'rt_util_note': 'RT megakernel timed directly (no subtraction); '
                        'peak from a 64-deep dependent-exp chain; exp is '
                        'the dominant but not sole VPU term, so this is '
                        'a utilization floor'}


def measure_spectra_and_transit(nwno, n_iter, extra):
    # headline + transit rates from ONE production problem: the table is
    # two ~3.4 GB HBM copies, so building it twice OOMs a 16 GB chip
    from picaso_tpu import pipeline

    scene, grid, config = build_problem(nwno)
    scenes = _perturbed(scene, n_iter)
    headline = _rate(lambda s: pipeline.forward(s, grid, config), scenes,
                     n_iter)
    _mark(f'headline rate {headline:.1f}/s; rt utilization')
    roofline = _roofline(headline, grid, NLEVEL - 1)
    try:
        roofline.update(_rt_utilization(scene, grid, config, headline,
                                        scenes))
    except Exception as e:
        roofline['rt_util_error'] = f'{type(e).__name__}: {e}'[:160]
    _mark('transit')
    cfg_t = dataclasses.replace(config, reflected=False, thermal=False,
                                transmission=True)
    transit = _rate(lambda s: pipeline.forward(s, grid, cfg_t), scenes,
                    n_iter)
    # batched-retrieval configuration: 8 scenes through forward_batch =
    # ONE dispatch (the production likelihood path; the reference farms
    # these to MPI ranks).  Rate is per-spectrum.  NOTE: the relay's
    # device->host round trip (~25-45 ms) is paid once per timed region,
    # so the batch loop must run enough iterations to amortize it — the
    # round-3 "batching regression" (122.6 vs 132.3/s) was exactly this
    # bias: 2 batch dispatches vs 15 single dispatches under one ~40 ms
    # readback.  Isolated try: a failure here must not discard the
    # already-measured headline.
    import jax
    import jax.numpy as jnp
    _mark('batched + likelihood')
    try:
        nb = 8
        n_rep = 20
        batches = [pipeline.stack_scenes(scenes[i * nb:(i + 1) * nb])
                   for i in range(max(1, (n_iter + 1) // nb))]
        out = pipeline.forward_batch(batches[0], grid, config)
        jax.block_until_ready(out)
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_rep):
                out = pipeline.forward_batch(batches[i % len(batches)],
                                             grid, config)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        roofline['batched8_spectra_per_s'] = round(n_rep * nb / best, 2)

        # retrieval-likelihood rate: batched forward + chi^2 against a
        # data vector, ONE scalar logL per scene — the production
        # nested-sampling inner loop (replaces the MPI pool, reference
        # driver.py:406-427).  The chi^2 is its own tiny jit on the
        # forward_batch outputs: wrapping forward_batch in a new jit
        # would recompile the whole production-shape program (~minutes
        # on the relay) to save one sub-ms dispatch.
        y = out['albedo'][0] if isinstance(out, dict) else None

        @jax.jit
        def chi2(alb, y):
            return -0.5 * jnp.sum((alb - y[None]) ** 2, axis=-1)

        def loglike(b, y):
            return chi2(pipeline.forward_batch(b, grid, config)['albedo'],
                        y)

        ll = loglike(batches[0], y)
        jax.block_until_ready(ll)
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_rep):
                ll = loglike(batches[i % len(batches)], y)
            jax.block_until_ready(ll)
            best = min(best, time.perf_counter() - t0)
        roofline['likelihoods_per_s'] = round(n_rep * nb / best, 2)
        batches = out = ll = None
    except Exception as e:
        roofline['batched8_error'] = f'{type(e).__name__}: {e}'[:160]
    if _remaining() > 60:
        _mark('int16 quantized table')
        if grid.log_kappa_blocked is not None:
            # int16 fixed-point table (opannection(blocked='int16')):
            # halves the gather stage's HBM traffic at ~1e-3 dex
            # quantization error.  Drop the f32 blocked copy first so the
            # quantization's transpose temp + the int16 copy fit
            # alongside the flat table.
            try:
                grid = grid._replace(log_kappa_blocked=None)
                gq = grid.with_blocked_table(quantize=True)
                grid = None
                jax.block_until_ready(gq.log_kappa_blocked)
                roofline['quantized_spectra_per_s'] = round(_rate(
                    lambda s: pipeline.forward(s, gq, config), scenes,
                    n_iter), 2)
            except Exception as e:
                roofline['quantized_error'] = f'{type(e).__name__}: {e}'[:160]
    else:
        extra.setdefault('skipped', []).append('int16')
    return headline, transit, roofline


# the four production climate modes (reference climate.py:2842-3124):
# chemeq on both production grids (196-bin legacy EGP and 661-bin,
# optics.py:1390-1395), cloudy (virga microphysics in the loop), and
# diseq (MLT kzz + Zahnle-Marley quench, per-gas resort-rebin tables).
# ALL FOUR run sequentially in ONE fresh subprocess (one relay
# handshake), each appending its result line to a progress file the
# parent can read even if the child is killed at the deadline.
_CLIMATE_CHILD = r'''
import json, sys, time
import numpy as np

progress_path, budget_s, nlevel = sys.argv[1], float(sys.argv[2]), int(sys.argv[3])
t_start = time.perf_counter()
import jax, jax.numpy as jnp
np.asarray(jnp.zeros(1))   # absorb the axon-relay d2h handshake
handshake_s = time.perf_counter() - t_start
from picaso_tpu import justdoit as jdi
from picaso_tpu.opacities.ck import synthetic_ck_table

prog = open(progress_path, 'a')
def emit(d):
    prog.write(json.dumps(d) + '\n'); prog.flush()
emit({'handshake_s': round(handshake_s, 2)})

MODES = [
    ('chemeq', {}, 700.0, None, {}),
    ('661', {'grid661': True}, 700.0, None, {}),
    ('cloudy', {}, 400.0, 'cloudy', {}),
    ('diseq', {'with_per_gas': True}, 700.0, 'quench',
     {'diseq_chem': True}),
]

def run_mode(ck_kwargs, teff, extra, climate_kwargs):
    t0 = time.perf_counter()
    opa_ck = jdi.opannection(ck_table=synthetic_ck_table(**ck_kwargs),
                             method='preweighted')
    case = jdi.inputs(calculation='brown')
    case.phase_angle(0)
    case.gravity(gravity=100.0, gravity_unit=jdi.u.Unit('m/(s**2)'))
    case.effective_temp(teff)
    case.setup_nostar()
    case.setup_climate()
    pressure = np.logspace(-4, 2.5, nlevel)
    guess = np.clip(teff * (pressure / 10.0) ** 0.12, 250.0, 2800.0)
    case.inputs_climate(temp_guess=guess, pressure=pressure,
                        rcb_guess=nlevel - 20, rfacv=0.0)
    if extra == 'cloudy':
        case.inputs['climate']['cloudy'] = True
        case.inputs['climate']['virga_kwargs'] = {
            'condensates': ['H2O'], 'fsed': 3.0, 'mh': 1.0, 'mmw': 2.2}
    elif extra == 'quench':
        case.inputs['approx']['chem_params']['quench'] = True
    out = case.climate(opa_ck, verbose=False, **climate_kwargs)
    return time.perf_counter() - t0, bool(out['converged'])

est = 150.0   # first-mode estimate; later modes use observed times
for name, ck_kwargs, teff, extra, ckw in MODES:
    if time.perf_counter() - t_start > budget_s - 0.8 * est:
        emit({'mode': name, 'skipped': 'deadline'})
        continue
    try:
        s, conv = run_mode(ck_kwargs, teff, extra, ckw)
        est = max(60.0, s)
        emit({'mode': name, 's': round(s, 2), 'converged': conv})
    except Exception as e:
        emit({'mode': name, 'error': f'{type(e).__name__}: {e}'[:200]})
'''


def measure_climate_all(extra, budget_s):
    """All four climate modes in one fresh TPU subprocess.

    The child appends one JSON line per completed mode to a progress
    file; on deadline the parent kills the child and keeps whatever
    completed.  Per-mode time = opannection + setup + full RCE solve
    (fresh process, warm persistent XLA disk cache — the cold-start a
    user sees; the relay handshake is excluded and reported separately).
    """
    progress = os.path.join(_HERE, '.bench_climate_progress.jsonl')
    try:
        os.remove(progress)
    except OSError:
        pass
    child_budget = max(60.0, budget_s - 15.0)
    try:
        subprocess.run(
            [sys.executable, '-c', _CLIMATE_CHILD, progress,
             str(child_budget), str(NLEVEL)],
            capture_output=True, text=True, timeout=budget_s, cwd=_HERE)
    except subprocess.TimeoutExpired:
        extra['climate_note'] = 'child hit the parent deadline; partial'
    try:
        with open(progress) as f:
            lines = [json.loads(l) for l in f if l.strip()]
    except OSError:
        lines = []
    try:
        os.remove(progress)
    except OSError:
        pass
    got = False
    for d in lines:
        if 'handshake_s' in d:
            extra['climate_handshake_s'] = d['handshake_s']
            continue
        key = 'climate' if d['mode'] == 'chemeq' else f"climate_{d['mode']}"
        if 's' in d:
            extra[f'{key}_s'] = d['s']
            extra[f'{key}_converged'] = d['converged']
            got = True
        elif 'error' in d:
            extra[f'{key}_error'] = d['error']
        else:
            extra.setdefault('skipped', []).append(key)
    if not got and 'climate_note' not in extra:
        extra['climate_error'] = 'climate child produced no results'


def measure_sh(nwno=2000, n_iter=20, production=False, streams=(4, 2)):
    """SH 2/4-stream reflected+thermal rates, IN-PROCESS on the TPU.

    Runs the native f32 path (rt/sh.py precision='auto': incoming-field
    block-row pairing + expm1-hardened sources; ~2e-3 max relative
    error vs the f64 oracle) — no x64 subprocess, no global flag flip.
    Both streams take their Pallas megakernels (rt/pallas_sh.py) when
    the backend supports it (config.use_pallas from build_problem).
    """
    from picaso_tpu import pipeline

    scene, grid, config = build_problem(nwno, production=production)
    out = {}
    for stream in streams:
        cfg = dataclasses.replace(config, rt_method=1, stream=stream)
        scenes = _perturbed(scene, n_iter)
        out[f'sh{stream}_rate'] = _rate(
            lambda s: pipeline.forward(s, grid, cfg), scenes, n_iter)
    return out


def measure_sh4_phase_curve(nwno=2000, n_phase=4, n_iter=10):
    """BASELINE config #4: SH4 reflected+thermal 3D phase curve.

    One batched dispatch computes every phase point of the disco ball
    (Gauss x Chebyshev 6x6 disk, geometry varying per phase) through the
    SH 4-stream solver — the single-program replacement for the
    reference's joblib fan-out (justdoit.py:4741-4777 with rt_method
    'SH', fluxes.py:2675/2979).  Reported as phase-points (full
    reflected+thermal disco spectra) per second.
    """
    import jax
    from picaso_tpu import disco as disco_mod
    from picaso_tpu import pipeline

    scene, grid, config = build_problem(nwno, production=False)
    cfg = dataclasses.replace(config, rt_method=1, stream=4,
                              use_pallas=False)
    phases = np.linspace(0.0, 2 * np.pi, n_phase, endpoint=False)
    dtype = np.asarray(scene.cld_opd).dtype
    phase_scenes = []
    for i, p in enumerate(phases):
        g = disco_mod.make_geometry(float(p), num_gangle=6, num_tangle=6)
        phase_scenes.append(scene._replace(
            ubar0=np.asarray(g.ubar0, dtype),
            ubar1=np.asarray(g.ubar1, dtype),
            gweight=np.asarray(g.gweight, dtype),
            tweight=np.asarray(g.tweight, dtype),
            cos_theta=np.asarray(g.cos_theta, dtype),
            tlevel=scene.tlevel * (1 + 0.001 * i),
            tlayer=scene.tlayer * (1 + 0.001 * i)))
    batch = pipeline.stack_scenes(phase_scenes)
    out = pipeline.forward_batch(batch, grid, cfg)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_iter):
            b = batch._replace(tlevel=batch.tlevel * (1 + 1e-4 * i),
                               tlayer=batch.tlayer * (1 + 1e-4 * i))
            out = pipeline.forward_batch(b, grid, cfg)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_iter * n_phase / best


def _reference_numpy_subprocess():
    """Time the actual reference (pure numpy via the numba shim) on the
    same physics at a wavelength slice; returns spectra/s scaled to NWNO."""
    code = r'''
import json, sys, time
import numpy as np
sys.path.insert(0, 'tests')
import refshim
jdi_ref = refshim.load_reference('justdoit')
from picaso_tpu.opacities import factory
nwno = 2000
wno = np.linspace(300.0, 33000.0, nwno)
db = '/tmp/bench_ref_syn.db'
import os
if not os.path.exists(db):
    factory.build_synthetic_db(db, wno,
        molecules=('H2O','CH4','CO','NH3','CO2','H2S'), ntemp=10, npress=8)
opa = jdi_ref.opannection(filename_db=db)
opa.get_opacities = type(opa).get_opacities.__get__(opa)
case = jdi_ref.inputs()
case.phase_angle(0, num_gangle=10, num_tangle=1)
case.gravity(gravity=25, gravity_unit=jdi_ref.u.Unit('m/(s**2)'))
case.setup_nostar()
case.atmosphere(filename=jdi_ref.jupiter_pt(), sep=r'\s+')
case.approx(raman='none')
case.spectrum(opa, calculation='thermal')       # warm caches
n = 3
t0 = time.perf_counter()
for i in range(n):
    case.spectrum(opa, calculation='reflected+thermal')
dt = (time.perf_counter() - t0) / n
print(json.dumps({"ref_rate_at_slice": 1.0/dt, "nwno": nwno}))
'''
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True, timeout=1800, env=env, cwd=_HERE)
    d = json.loads(res.stdout.strip().splitlines()[-1])
    # reference cost is linear in nwno (per-wavelength loops)
    return d['ref_rate_at_slice'] * d['nwno'] / NWNO


def _cpu_baseline_subprocess():
    """This same XLA program on one CPU host, in a clean subprocess."""
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--cpu-baseline'],
        capture_output=True, text=True, timeout=1800, env=env, cwd=_HERE)
    return json.loads(res.stdout.strip().splitlines()[-1])['cpu_rate_full']


def _load_baseline_cache():
    """reference-numpy + XLA-CPU rates from bench_cache.json.

    Neither changes round to round (the reference is frozen; the CPU
    baseline only moves when the forward program changes materially), so
    they are measured once, stamped with the commit, and reused — two
    ~1-5 minute subprocesses the TPU bench window doesn't have to pay.
    Refresh with PICASO_BENCH_REFRESH=1 or scripts/refresh_bench_cache.py.
    """
    if os.environ.get('PICASO_BENCH_REFRESH') == '1':
        return None
    try:
        with open(os.path.join(_HERE, 'bench_cache.json')) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


# ---------------------------------------------------------------------------
# incremental emission + deadline plumbing
# ---------------------------------------------------------------------------

_RESULT = {'metric': None, 'value': None, 'unit': 'spectra/s',
           'vs_baseline': None, 'extra': {}}
_PRINTED = [False]


def _emit_partial():
    try:
        with open(os.path.join(_HERE, 'BENCH_PARTIAL.json'), 'w') as f:
            json.dump(_RESULT, f)
    except OSError:
        pass


_EMIT_LOCK = threading.Lock()


def _emit_final():
    # single-print guard must be atomic once the watchdog thread exists
    with _EMIT_LOCK:
        if _PRINTED[0]:
            return
        _PRINTED[0] = True
    _RESULT['extra']['bench_elapsed_s'] = round(
        time.perf_counter() - _T0, 1)
    print(json.dumps(_RESULT), flush=True)


def _on_signal(signum, frame):
    _RESULT['extra']['terminated_by'] = signal.Signals(signum).name
    _emit_final()
    os._exit(0)


def _start_watchdog():
    """Print the final JSON at the deadline even if the main thread is
    wedged inside a C call.

    Python signal handlers only run between bytecodes; a relay
    handshake or XLA compile that hangs (observed: >15 min of 'relay
    weather' on a contended day) keeps the main thread inside a C
    extension, so SIGTERM from the driver's `timeout` never reaches
    _on_signal and the round's record becomes rc=124/parsed=null (the
    round-4 failure mode, which the signal handler alone did NOT fix).
    A daemon thread needs only the GIL (socket waits and XLA compiles
    release it): it emits whatever has been gathered and exits 0.
    """
    def _watch():
        grace = 15.0  # let a final in-flight stage record first
        while True:
            left = _BUDGET_S + grace - (time.perf_counter() - _T0)
            if left <= 0:
                break
            time.sleep(min(left, 5.0))
        _RESULT['extra']['terminated_by'] = 'watchdog'
        _emit_final()
        sys.stdout.flush()
        os._exit(0)

    threading.Thread(target=_watch, daemon=True).start()


def main():
    if '--cpu-baseline' in sys.argv:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        nwno_cpu = 5_000
        rate = measure(nwno_cpu, 5, production=False)
        print(json.dumps({'cpu_rate_full': rate * nwno_cpu / NWNO}))
        return

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    _start_watchdog()

    import gc

    import jax
    extra = _RESULT['extra']
    # the axon relay's compile endpoint intermittently returns
    # RESOURCE_EXHAUSTED for perfectly-sized programs (multi-tenant
    # contention; the same program compiles fine minutes later) — retry
    # the headline measurement a few times before giving up
    rate = None
    nwno_used = NWNO
    _mark('headline: build + measure')
    for attempt in range(4):
        try:
            rate, transit_rate, roofline = measure_spectra_and_transit(
                NWNO, N_ITER, extra)
            extra['transit_spectra_per_s'] = round(transit_rate, 2)
            extra.update(roofline)
            break
        except Exception as e:
            extra['transit_error'] = f'{type(e).__name__}: {e}'[:200]
            jax.clear_caches()
            time.sleep(45 * (attempt + 1))
    if rate is None:
        # degradation ladder for a contended relay: one more plain-f32
        # attempt first (a flaky relay should still yield the
        # full-quality headline), then the int16 table — a CAPACITY
        # rung, it shrinks the program's footprint by 2.2 GB at full
        # shape but measures ~4% slower than f32 (the post-dedup gather
        # is VPU-bound; see gather_probe.py) — then progressively
        # smaller wavelength grids (reported as such — no extrapolation
        # of the headline)
        for blocked, nw in (('f32', NWNO), ('int16', NWNO),
                            ('f32', 37_500), ('f32', 25_000)):
            try:
                rate = measure(nw, N_ITER, blocked=blocked)
                nwno_used = nw
                if blocked == 'int16' or nw != NWNO:
                    extra['headline_note'] = (
                        f'relay refused the full-size program after '
                        f'retries; measured blocked={blocked} nwno={nw}')
                break
            except Exception as e:
                extra['headline_error'] = f'{type(e).__name__}: {e}'[:200]
                jax.clear_caches()
                time.sleep(45)

    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = 'backend-unavailable'
    _RESULT['metric'] = (
        '1D reflected+thermal spectra/sec at production table shape '
        f'(1060-pt ragged PT grid, 16 molecules, nwno={nwno_used}, '
        f'nlevel={NLEVEL}, {platform})')
    _RESULT['value'] = round(rate, 4) if rate is not None else None
    _emit_partial()

    # cached baselines first: free, and they complete the vs_* story
    # even if a later stage eats the budget
    cache = _load_baseline_cache()
    if cache and rate is not None:
        ref_rate = cache.get('reference_numpy_spectra_per_s')
        cpu_rate = cache.get('cpu_rate_full')
        extra['baseline_cache'] = {
            k: cache.get(k) for k in ('commit', 'date')}
        if ref_rate:
            extra['reference_numpy_spectra_per_s'] = round(ref_rate, 5)
            extra['vs_reference_numpy'] = round(rate / ref_rate, 1)
            # numba is not installable in this image, so the BASELINE
            # ">50x vs numba-CPU" target is checked by inference:
            # published numba-vs-numpy speedups for loop-heavy float
            # kernels of this shape are 10-30x, so a compiled reference
            # would run at most ~30x the measured numpy rate.
            extra['reference_numba_estimated'] = round(ref_rate * 30.0, 4)
            extra['vs_reference_numba_floor'] = round(
                rate / (ref_rate * 30.0), 1)
            # the BASELINE ">50x vs numba-CPU" target is stated for a
            # v5e-8; the floor above is ONE chip.  Wavelength sharding is
            # collective-free through the whole RT pass (parallel.py; the
            # 8-virtual-device equality tests and dryrun_multichip
            # exercise the exact program), so 8-chip scaling of this
            # embarrassingly-parallel axis is linear to first order.
            extra['vs_reference_numba_floor_v5e8_est'] = round(
                8 * rate / (ref_rate * 30.0), 1)
        if cpu_rate:
            _RESULT['vs_baseline'] = round(rate / cpu_rate, 2)
    _emit_partial()

    # release the ~7 GB of device tables before the subprocess configs
    # (they share the one chip)
    gc.collect()
    jax.clear_caches()
    gc.collect()

    # SH native f32 in-process, at the SH-bench slice AND full resolution
    if _remaining() > 90:
        _mark('SH native f32 (nwno=2000)')
        try:
            sh = measure_sh(nwno=2000)
            extra['sh4_spectra_per_s'] = round(sh['sh4_rate'], 3)
            extra['sh2_spectra_per_s'] = round(sh['sh2_rate'], 3)
            _mark('SH full-res')
            sh_full = measure_sh(nwno=NWNO, n_iter=8, streams=(4, 2))
            extra['sh4_fullres_spectra_per_s'] = round(
                sh_full['sh4_rate'], 3)
            extra['sh2_fullres_spectra_per_s'] = round(
                sh_full['sh2_rate'], 3)
            extra['sh_note'] = ('native f32 in-process; SH2 and SH4 via '
                                'their Pallas megakernels '
                                '(rt/pallas_sh.py); nwno=2000 '
                                f'and full-res nwno={NWNO}, '
                                'reflected+thermal')
        except Exception as e:
            extra['sh4_error'] = f'{type(e).__name__}: {e}'[:200]
            jax.clear_caches()
    else:
        extra.setdefault('skipped', []).append('sh')
    _emit_partial()
    if _remaining() > 45:
        _mark('SH4 3D phase curve')
        try:
            extra['sh4_phase_curve_points_per_s'] = round(
                measure_sh4_phase_curve(), 3)
            extra['sh4_phase_curve_note'] = (
                'BASELINE config #4: 4-phase 3D disco ball (6x6 '
                'gauss-cheby facets), SH4 reflected+thermal, one batched '
                'dispatch, nwno=2000')
        except Exception as e:
            extra['sh4_phase_curve_error'] = f'{type(e).__name__}: {e}'[:200]
            jax.clear_caches()
    else:
        extra.setdefault('skipped', []).append('sh4_phase_curve')
    _emit_partial()
    gc.collect()
    jax.clear_caches()
    gc.collect()

    # all four climate modes, one subprocess, deadline-aware
    if _remaining() > 90:
        _mark('climate (all modes, one subprocess)')
        try:
            measure_climate_all(extra, budget_s=_remaining() - 15)
        except Exception as e:
            extra['climate_error'] = f'{type(e).__name__}: {e}'[:200]
    else:
        extra.setdefault('skipped', []).append('climate')
    _emit_partial()

    # baselines not cached: measure only with time to spare
    if cache is None and rate is not None:
        if _remaining() > 120:
            _mark('reference numpy subprocess')
            try:
                ref_rate = _reference_numpy_subprocess()
                extra['reference_numpy_spectra_per_s'] = round(ref_rate, 5)
                extra['vs_reference_numpy'] = round(rate / ref_rate, 1)
                extra['reference_numba_estimated'] = round(
                    ref_rate * 30.0, 4)
                extra['vs_reference_numba_floor'] = round(
                    rate / (ref_rate * 30.0), 1)
                extra['vs_reference_numba_floor_v5e8_est'] = round(
                    8 * rate / (ref_rate * 30.0), 1)
            except Exception as e:
                extra['reference_error'] = f'{type(e).__name__}: {e}'[:200]
        else:
            extra.setdefault('skipped', []).append('reference_numpy')
        if _remaining() > 120:
            _mark('cpu baseline subprocess')
            try:
                _RESULT['vs_baseline'] = round(
                    rate / _cpu_baseline_subprocess(), 2)
            except Exception:
                pass
        else:
            extra.setdefault('skipped', []).append('cpu_baseline')

    _emit_final()


if __name__ == '__main__':
    main()
