"""Verify drive: SH 2/4-stream forward on TPU vs CPU-f64 cross-check."""
import dataclasses, json, subprocess, sys, os
import numpy as np

def run(platform):
    code = f'''
import sys, json, dataclasses
import numpy as np
import jax
jax.config.update('jax_enable_x64', True)
{"jax.config.update('jax_platforms', 'cpu')" if platform == 'cpu' else ''}
_ = np.asarray(jax.numpy.zeros(1))
import bench
from picaso_tpu import pipeline
scene, grid, config = bench.build_problem(500, production=False)
for stream in (2, 4):
    cfg = dataclasses.replace(config, rt_method=1, stream=stream,
                              use_pallas=False)
    out = pipeline.forward(scene, grid, cfg)
    alb = np.asarray(out['albedo'], np.float64)
    th = np.asarray(out['thermal'], np.float64)
    np.save(f'/tmp/sh_verify_{platform}_s{{stream}}_alb.npy', alb)
    np.save(f'/tmp/sh_verify_{platform}_s{{stream}}_th.npy', th)
    print(json.dumps({{"stream": stream, "platform": "{platform}",
        "alb_nan": int(np.isnan(alb).sum()), "alb_min": float(alb.min()),
        "alb_max": float(alb.max()), "th_nan": int(np.isnan(th).sum())}}))
'''
    env = dict(os.environ)
    if platform == 'cpu':
        env['JAX_PLATFORMS'] = 'cpu'
    r = subprocess.run([sys.executable, '-c', code], capture_output=True,
                       text=True, timeout=1200, cwd='/root/repo', env=env)
    print(r.stdout, r.stderr[-500:] if r.returncode else '')
    return r.returncode

rc1 = run('axon')
rc2 = run('cpu')
for s in (2, 4):
    a_t = np.load(f'/tmp/sh_verify_axon_s{s}_alb.npy')
    a_c = np.load(f'/tmp/sh_verify_cpu_s{s}_alb.npy')
    t_t = np.load(f'/tmp/sh_verify_axon_s{s}_th.npy')
    t_c = np.load(f'/tmp/sh_verify_cpu_s{s}_th.npy')
    ra = np.max(np.abs(a_t - a_c) / np.maximum(np.abs(a_c), 1e-12))
    rt = np.max(np.abs(t_t - t_c) / np.maximum(np.abs(t_c), 1e-12))
    print(f'SH{s}: TPU-vs-CPU max rel albedo {ra:.2e} thermal {rt:.2e}')
