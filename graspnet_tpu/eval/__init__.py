"""AP evaluation: native re-implementation of the graspnetAPI evaluator.

The reference depends on the external `graspnetAPI` package for
`GraspNetEval.eval_all` (reference test.py:110-114); its vendored copy is
empty, so this framework ships its own implementation of the published
GraspNet-1Billion metric: Precision@k over the top-50 grasps per frame,
averaged over k=1..50 and friction coefficients mu in {0.2,...,1.2}, with
force-closure grasp scoring against the dataset object models and
scene-level collision rejection.
"""

from graspnet_tpu.eval.force_closure import (
    estimate_normals,
    find_contacts,
    force_closure_min_friction,
)
from graspnet_tpu.eval.ap import GraspNetEval, eval_frame, precision_at_k

__all__ = [
    "GraspNetEval",
    "eval_frame",
    "precision_at_k",
    "estimate_normals",
    "find_contacts",
    "force_closure_min_friction",
]
