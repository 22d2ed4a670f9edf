"""True per-stage device timings via in-jit scan loops (slope method).

The tunneled backend adds a large fixed RPC cost to every host-side sync,
which swamps per-stage measurements (scripts/profile_stages.py).  Each stage
is looped K times *inside* one jitted program with a serializing data
dependency; timing the same program at two different K and taking the slope
(T(K2) - T(K1)) / (K2 - K1) cancels both the RPC floor and compile-cache
effects.  A trivial-op slope is reported as the scan-overhead baseline.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu import ops
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import init_graspnet, graspnet_forward, pred_decode
from graspnet_tpu.models.backbone import backbone_forward
from graspnet_tpu.models import heads

from slope_timing import dump_records, timeit  # noqa: E402 — shared harness


def main():
    cfg = GraspNetConfig()
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.uniform(-0.5, 0.5, (1, cfg.num_point, 3)), jnp.float32)
    params = init_graspnet(jax.random.PRNGKey(0), cfg)
    from graspnet_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    print(f"backend: {jax.default_backend()}")

    timeit("scan overhead baseline (x + 1)", lambda x: x + 1.0, cloud)

    timeit("fps pure-JAX (20000->2048)",
           lambda x: ops.furthest_point_sample(x, 2048, use_pallas=False), cloud)
    from graspnet_tpu.ops.pallas.fps import fps_pallas, fps_chain_pallas
    timeit("fps pallas   (20000->2048)", lambda x: fps_pallas(x, 2048), cloud)
    npts = (cfg.sa1.npoint, cfg.sa2.npoint, cfg.sa3.npoint, cfg.sa4.npoint)
    timeit("fps chain    (20000->2048->1024->512->256)",
           lambda x: fps_chain_pallas(x, npts), cloud)

    bp = params["backbone"]
    from graspnet_tpu.models.backbone import _fp_stage, _sa_stage

    chain = fps_chain_pallas(cloud, npts)
    inds = dict(zip(("sa1", "sa2", "sa3", "sa4"), chain))
    stage_in = (cloud, None)
    carried = []
    for name, sa in (("sa1", cfg.sa1), ("sa2", cfg.sa2), ("sa3", cfg.sa3), ("sa4", cfg.sa4)):
        x, f = stage_in
        pre = inds[name]
        if f is None:
            timeit(
                f"{name} w/ precomputed inds ({x.shape[1]}->{sa.npoint})",
                lambda xx, ii: _sa_stage(bp[name], sa, xx, None, train=False,
                                         eps=cfg.bn_eps, inds=ii)[:2],
                x, pre,
            )
        else:
            timeit(
                f"{name} w/ precomputed inds ({x.shape[1]}->{sa.npoint})",
                lambda xx, ff, ii: _sa_stage(bp[name], sa, xx, ff, train=False,
                                             eps=cfg.bn_eps, inds=ii)[:2],
                x, f, pre,
            )
        xx, ff, _, _, _ = _sa_stage(bp[name], sa, x, f, train=False, eps=cfg.bn_eps,
                                 inds=pre)
        stage_in = (xx, ff)
        carried.append((xx, ff))
    (s1x, s1f), (s2x, s2f), (s3x, s3f), (s4x, s4f) = carried
    timeit("fp1 (512<-256)",
           lambda a, b, c, d: _fp_stage(bp["fp1"], a, b, c, d, train=False, eps=cfg.bn_eps)[0],
           s3x, s4x, s3f, s4f)
    f1 = _fp_stage(bp["fp1"], s3x, s4x, s3f, s4f, train=False, eps=cfg.bn_eps)[0]
    timeit("fp2 (1024<-512)",
           lambda a, b, c, d: _fp_stage(bp["fp2"], a, b, c, d, train=False, eps=cfg.bn_eps)[0],
           s2x, s3x, s2f, f1)

    timeit("backbone full",
           lambda x: backbone_forward(bp, x, cfg, train=False)[0], cloud)

    seeds = s2x[:, :1024]
    rots = jnp.tile(jnp.eye(3), (1, 1024, 1, 1))
    timeit("crop_forward (1024s x 4d x 20000p)",
           lambda x, s, r: heads.crop_forward(params["crop"], s, x, r, cfg)[0],
           cloud, seeds, rots)

    sf = jnp.asarray(rng.uniform(-1, 1, (1, 1024, 256)), jnp.float32)
    timeit("approach_forward",
           lambda f: heads.approach_forward(params["approach"], seeds, f, cfg)["view_score"],
           sf)

    def full(x):
        ep = graspnet_forward(params, x, cfg, train=False)
        return pred_decode(ep, cfg)

    timeit("FULL forward+decode", full, cloud)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the stage_ms JSON here")
    _args = ap.parse_args()
    main()
    if _args.out:
        dump_records(_args.out, source="scripts/device_stage_times.py")
