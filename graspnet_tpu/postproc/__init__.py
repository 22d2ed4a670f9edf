"""Post-processing: grasp containers, NMS, collision filtering.

Native re-implementation of the external graspnetAPI surface the reference
depends on (GraspGroup / Grasp / .nms() / .sort_by_score() / .save_npy(),
used at reference test.py:11,89-103) plus utils/collision_detector.py — the
vendored graspnetAPI directory in the reference is empty, so this framework
ships its own.
"""

from graspnet_tpu.postproc.grasp import Grasp, GraspGroup, GRASP_ARRAY_LEN
from graspnet_tpu.postproc.nms import grasp_nms
from graspnet_tpu.postproc.collision import (
    ModelFreeCollisionDetector,
    collision_ious,
    detect_batch,
)
from graspnet_tpu.postproc.voxel import voxel_down_sample
from graspnet_tpu.postproc.gripper import (
    gripper_mesh,
    grasp_group_meshes,
    save_meshes_ply,
)

__all__ = [
    "gripper_mesh",
    "grasp_group_meshes",
    "save_meshes_ply",
    "Grasp",
    "GraspGroup",
    "GRASP_ARRAY_LEN",
    "grasp_nms",
    "ModelFreeCollisionDetector",
    "collision_ious",
    "detect_batch",
    "voxel_down_sample",
]
