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

from graspnet_tpu.config import GraspNetConfig  # noqa: F401
