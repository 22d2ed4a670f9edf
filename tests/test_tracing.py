"""Tracing/profiling subsystem tests."""

import os

import jax
import jax.numpy as jnp

from graspnet_tpu.utils.tracing import StageTimer, device_trace


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert set(s) == {"a", "b"} and t.counts["a"] == 2
    assert "a=" in t.report() and "b=" in t.report()


def test_device_trace_noop():
    with device_trace(None):
        pass  # must not start a profiler


def test_device_trace_captures(tmp_path):
    d = str(tmp_path / "trace")
    with device_trace(d):
        jnp.square(jnp.arange(8.0)).block_until_ready()
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace artifacts written"
