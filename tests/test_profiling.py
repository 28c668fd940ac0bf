"""Tracing/profiling/observability layer (SURVEY §5)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from picaso_tpu import profiling


def test_timer_accumulates():
    t = profiling.Timer()
    with t('work') as h:
        h.append(jnp.ones(128) * 2)
    with t('work') as h:
        h.append(jnp.ones(128) * 3)
    s = t.summary()
    assert s['work']['calls'] == 2
    assert s['work']['total_s'] > 0


def test_device_timer_perturbed():
    f = jax.jit(lambda x: (x ** 2).sum())
    dt = profiling.device_timer(f, jnp.arange(256.0), iters=3,
                                perturb=lambda i: jnp.arange(256.0) + i)
    assert dt > 0


def test_cost_analysis_flops():
    f = lambda a, b: a @ b
    a = jnp.ones((64, 64))
    cost = profiling.cost_analysis(f, a, a)
    assert cost.get('flops', 0) >= 2 * 64 ** 3 * 0.9


def test_runlog_jsonl(tmp_path):
    path = tmp_path / 'run.jsonl'
    log = profiling.RunLog(str(path))
    log.log('climate_iteration', it=0, mean_dT=12.5,
            temperature=np.linspace(100, 500, 40), nstr=[0, 20, 39])
    log.log('converged', it=3)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]['event'] == 'climate_iteration'
    assert lines[0]['temperature']['shape'] == [40]
    assert lines[0]['temperature']['min'] == 100.0
    assert lines[1]['it'] == 3


def test_trace_writes(tmp_path):
    with profiling.trace(str(tmp_path / 'tr')) as d:
        jax.block_until_ready(jnp.ones(64).sum())
    import os
    found = any(f for _, _, fs in os.walk(d) for f in fs)
    assert found
