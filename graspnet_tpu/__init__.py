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


# NOTE: the persistent XLA compilation cache is enabled by
# graspnet_tpu.utils.compile_cache.enable(), called from the Trainer /
# GraspPipeline constructors and the bench scripts AFTER the backend is
# initialized — never at package import, where the backend is unknown and a
# silent CPU fallback would cache machine-feature-pinned AOT entries that
# can SIGILL on other hosts.


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

from graspnet_tpu.config import GraspNetConfig  # noqa: F401,E402
