"""graspnet_tpu — a TPU-native (JAX/XLA/Pallas) grasp-detection framework.

Re-designed from scratch with the capability set of the GraspNet-1Billion
baseline (CVPR 2020) as extended by the Swiss-Battery-Technology-Center fork:
a two-stage grasp detector over single-frame point clouds, plus the full
surrounding stack (data pipeline, training, collision filtering, NMS, AP
evaluation, capture/app entry points).

Design goals (TPU-first, not a port):
  * every geometry op (FPS, ball/cylinder query, kNN, 3-NN interpolation) is a
    fixed-shape, vmap-able JAX function with a Pallas kernel on the hot path;
  * the model is a pure function over a params pytree — jit/pjit/shard_map
    compose for data- and candidate-parallel execution on device meshes;
  * variable-size sets (objectness masks, collision-filtered grasps) are
    carried as masks, never boolean indexing, so everything stays static-shape
    under XLA.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache() -> None:
    """Point XLA at an on-disk compilation cache so every CLI / service
    process reuses compiled programs (first compile of the full 20k-point
    program costs up to ~90s on a shared chip; cached startups take ~2s).
    Opt out with GRASPNET_TPU_NO_COMPILE_CACHE=1 or override the location
    with JAX_COMPILATION_CACHE_DIR.
    """
    import os

    if os.environ.get("GRASPNET_TPU_NO_COMPILE_CACHE"):
        return
    # CPU-only runs (unit tests, multichip dryruns on virtual devices) skip
    # the cache: XLA:CPU AOT entries record host machine features and reloads
    # across differing feature sets risk SIGILL; CPU compiles are fast anyway.
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "graspnet_tpu", "xla"
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program, even fast-compiling ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is best-effort, never fatal
        pass


def _honor_jax_platforms_env() -> None:
    """Make JAX_PLATFORMS work even when a site hook force-set the platform
    list via jax.config at interpreter start (which shadows the env var).
    Lets users run any CLI on CPU with JAX_PLATFORMS=cpu when no accelerator
    is reachable."""
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax

        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:  # noqa: BLE001
        pass


_honor_jax_platforms_env()
_enable_persistent_compilation_cache()

from graspnet_tpu.config import GraspNetConfig  # noqa: F401,E402
