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


def test_compile_cache_enable(tmp_path, monkeypatch):
    from graspnet_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "_configured", None)
    monkeypatch.setenv("GRASPNET_COMPILE_CACHE", str(tmp_path / "xla"))
    path = compile_cache.enable()
    assert path == str(tmp_path / "xla") and os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path
    # idempotent + off switch
    assert compile_cache.enable() == path
    # a different explicit path reconfigures rather than lying about the dir
    other = str(tmp_path / "xla2")
    assert compile_cache.enable(other) == other
    assert jax.config.jax_compilation_cache_dir == other
    monkeypatch.setattr(compile_cache, "_configured", None)
    monkeypatch.setenv("GRASPNET_COMPILE_CACHE", "off")
    assert compile_cache.enable() is None
