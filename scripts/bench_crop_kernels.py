"""Slope-method device timings for the individual fused Pallas kernels.

Isolates where the 8.3 ms forward+decode goes: each fused stage is looped
K times inside one jitted scan with a serializing dependency; the slope
between two K values cancels the tunneled backend's RPC floor.
"""

import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import init_graspnet
from graspnet_tpu.nn.layers import shared_mlp_init

from slope_timing import dump_records, timeit  # noqa: E402 — shared harness


def main():
    cfg = GraspNetConfig()
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.uniform(-0.5, 0.5, (1, cfg.num_point, 3)), jnp.float32)
    params = init_graspnet(jax.random.PRNGKey(0), cfg)
    from graspnet_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    print(f"backend: {jax.default_backend()}")

    from graspnet_tpu.ops.pallas.crop import (
        crop_fused_pallas, fold_bn_eval, sa1_fused_pallas, sa_feat_fused_pallas,
    )
    from graspnet_tpu.ops.pallas.fps import fps_pallas

    key = jax.random.PRNGKey(1)
    seeds = jax.random.uniform(key, (1, 1024, 3), minval=-0.5, maxval=0.5)
    rot = jnp.tile(jnp.eye(3)[None, None], (1, 1024, 1, 1))

    crop_layers = shared_mlp_init(jax.random.PRNGKey(2), (3, 64, 128, 256))
    fw = tuple(x for p in fold_bn_eval(crop_layers, 1e-5) for x in p)

    timeit(
        "crop_fused (1024 seeds x 4 depths, 20k pts)",
        lambda x: crop_fused_pallas(
            x, seeds, rot, fw, 0.05, -0.02, (0.01, 0.02, 0.03, 0.04), 64
        ),
        cloud,
    )

    sa1_layers = shared_mlp_init(jax.random.PRNGKey(3), (3, 64, 64, 128))
    xyz2048 = jax.random.uniform(key, (1, 2048, 3), minval=-0.5, maxval=0.5)
    timeit(
        "sa1_fused (2048 seeds, 20k pts, ns=64)",
        lambda x: sa1_fused_pallas(x, xyz2048, sa1_layers, 0.04, 64, 1e-5),
        cloud,
    )

    feat2048 = jax.random.normal(key, (1, 2048, 128))
    sa2_layers = shared_mlp_init(jax.random.PRNGKey(4), (131, 128, 128, 256))
    xyz1024 = xyz2048[:, :1024]
    timeit(
        "sa2_fused (1024 seeds, 2048 pts, ns=32, C=128)",
        lambda x: sa_feat_fused_pallas(x, xyz1024, feat2048, sa2_layers, 0.1, 32, 1e-5),
        xyz2048,
    )
    feat1024 = jax.random.normal(key, (1, 1024, 256))
    sa3_layers = shared_mlp_init(jax.random.PRNGKey(5), (259, 128, 128, 256))
    xyz512 = xyz2048[:, :512]
    timeit(
        "sa3_fused (512 seeds, 1024 pts, ns=16, C=256)",
        lambda x: sa_feat_fused_pallas(x, xyz512, feat1024, sa3_layers, 0.2, 16, 1e-5),
        xyz1024,
    )
    feat512 = jax.random.normal(key, (1, 512, 256))
    sa4_layers = shared_mlp_init(jax.random.PRNGKey(6), (259, 128, 128, 256))
    xyz256 = xyz2048[:, :256]
    timeit(
        "sa4_fused (256 seeds, 512 pts, ns=16, C=256)",
        lambda x: sa_feat_fused_pallas(x, xyz256, feat512, sa4_layers, 0.3, 16, 1e-5),
        xyz512,
    )

    timeit("fps_pallas 20000->2048", lambda x: fps_pallas(x, 2048), cloud)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the stage_ms JSON here")
    _args = ap.parse_args()
    main()
    if _args.out:
        dump_records(_args.out, source="scripts/bench_crop_kernels.py")
