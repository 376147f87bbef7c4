"""Profiling helpers smoke tests."""
import jax.numpy as jnp

from mpc_cbf_tpu.utils.profiling import StepTimer, annotate


def test_step_timer_stats():
    t = StepTimer()
    for _ in range(10):
        with t.measure():
            jnp.ones(8).sum().block_until_ready()
    s = t.stats()
    assert s["n"] == 10
    assert 0 < s["p50_ms"] <= s["p99_ms"] <= s["max_ms"]


def test_annotate_context():
    with annotate("phase"):
        assert float(jnp.sum(jnp.arange(4))) == 6.0
