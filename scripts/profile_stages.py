"""Per-stage device timing of the inference pipeline (run on TPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu import ops
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import init_graspnet, graspnet_forward, pred_decode
from graspnet_tpu.models.backbone import backbone_forward
from graspnet_tpu.models import heads


def _sync(out):
    """Force real completion: device_get one element of every output leaf
    (block_until_ready does not synchronize through the tunneled backend)."""
    jax.device_get(
        jax.tree_util.tree_map(lambda x: x.ravel()[:1], out)
    )


def timeit(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)  # compile
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn_j(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:42s} {np.median(times)*1000:9.2f} ms")
    return out


def main():
    cfg = GraspNetConfig()
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.uniform(-0.5, 0.5, (1, cfg.num_point, 3)), jnp.float32)
    params = init_graspnet(jax.random.PRNGKey(0), cfg)

    from graspnet_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    print(f"backend: {jax.default_backend()}")

    # FPS variants
    timeit("fps pure-JAX (20000->2048)", lambda x: ops.furthest_point_sample(x, 2048, use_pallas=False), cloud)
    try:
        from graspnet_tpu.ops.pallas.fps import fps_pallas

        timeit("fps pallas   (20000->2048)", lambda x: fps_pallas(x, 2048), cloud)
    except Exception as e:
        print("fps pallas failed:", type(e).__name__, str(e)[:200])

    # ball query at sa1 scale
    inds = ops.furthest_point_sample(cloud, 2048, use_pallas=False)
    centers = ops.gather_points(cloud, inds)
    timeit(
        "ball_query sa1 (2048c x 20000p, ns=64)",
        lambda x, c: ops.ball_query(x, c, 0.04, 64),
        cloud,
        centers,
    )
    idx64 = ops.ball_query(cloud, centers, 0.04, 64)
    timeit(
        "group_points alone (2048x64 gather)",
        lambda x, i: ops.group_points(x, i),
        cloud,
        idx64,
    )
    grouped = ops.group_points(cloud, idx64) - centers[:, :, None, :]
    from graspnet_tpu.nn import layers as nnl

    timeit(
        "sa1 mlp alone (1,2048,64,3)->128 + max",
        lambda g: jnp.max(nnl.shared_mlp(params["backbone"]["sa1"]["mlp"], g)[0], axis=2),
        grouped,
    )
    timeit(
        "group+mlp sa1 (2048x64x3 -> 128)",
        lambda x, c: _sa_mlp(params, x, c, cfg),
        cloud,
        centers,
    )

    # per-stage backbone breakdown
    from graspnet_tpu.models.backbone import _fp_stage, _sa_stage

    bp = params["backbone"]
    stage_in = {"xyz": cloud, "feat": None}
    carried = []
    for name, sa in (("sa1", cfg.sa1), ("sa2", cfg.sa2), ("sa3", cfg.sa3), ("sa4", cfg.sa4)):
        x, f = stage_in["xyz"], stage_in["feat"]
        out = timeit(
            f"{name} ({x.shape[1]}->{sa.npoint}, ns={sa.nsample})",
            lambda xx, ff=None: _sa_stage(bp[name], sa, xx, ff, train=False, eps=cfg.bn_eps)[:2],
            *( (x,) if f is None else (x, f) ),
        )
        stage_in = {"xyz": out[0], "feat": out[1]}
        carried.append(out)
    (s1x, s1f), (s2x, s2f), (s3x, s3f), (s4x, s4f) = carried
    # inputs MUST be passed as args: a nullary jitted lambda embeds the
    # arrays as HLO constants and XLA constant-folds the whole stage away
    f1 = timeit(
        "fp1 (512<-256)",
        lambda a, b, c, d: _fp_stage(bp["fp1"], a, b, c, d, train=False, eps=cfg.bn_eps)[0],
        s3x, s4x, s3f, s4f,
    )
    timeit(
        "fp2 (1024<-512)",
        lambda a, b, c, d: _fp_stage(bp["fp2"], a, b, c, d, train=False, eps=cfg.bn_eps)[0],
        s2x, s3x, s2f, f1,
    )

    # full backbone
    timeit(
        "backbone full",
        lambda p, x: backbone_forward(p, x, cfg, train=False)[0],
        params["backbone"],
        cloud,
    )

    # cylinder crop at stage-2 scale
    seeds = centers[:, :1024]
    rots = jnp.tile(jnp.eye(3), (1, 1024, 1, 1))
    timeit(
        "cylinder_query_multi (1024s x 4d x 20000p)",
        lambda x, s, r: heads.cylinder_query_multi_depth(
            x, s, r, cfg.cylinder_radius, cfg.hmin, cfg.hmax_list, cfg.crop_nsample
        ),
        cloud,
        seeds,
        rots,
    )
    timeit(
        "crop_forward (query+group+mlp+pool)",
        lambda p, s, x, r: heads.crop_forward(p["crop"], s, x, r, cfg)[0],
        params,
        seeds,
        cloud,
        rots,
    )

    # end to end
    def full(p, x):
        ep = graspnet_forward(p, x, cfg, train=False)
        return pred_decode(ep, cfg)

    timeit("FULL forward+decode", full, params, cloud)


def _sa_mlp(params, cloud, centers, cfg):
    idx = ops.ball_query(cloud, centers, 0.04, 64)
    grouped = ops.group_points(cloud, idx) - centers[:, :, None, :]
    grouped = grouped / 0.04
    from graspnet_tpu.nn import layers as nnl

    out, _ = nnl.shared_mlp(params["backbone"]["sa1"]["mlp"], grouped)
    return jnp.max(out, axis=2)


if __name__ == "__main__":
    main()
