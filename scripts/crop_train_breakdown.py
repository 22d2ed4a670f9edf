"""Sub-stage slope timings of the TRAIN-mode crop path (diagnostic).

crop_forward(train=True) = Pallas multi-depth cylinder query -> XLA gather
+ rotate -> shared_mlp with batch-stats BN.  Times each piece at the
training operating point (B=2, 20k pts, 1024 seeds x 4 depths x 64 samples)
to locate the 11.5 ms (scripts/train_stage_times.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from slope_timing import dump_records, timeit  # noqa: E402


def main():
    from graspnet_tpu import ops
    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.nn import layers as nn
    from graspnet_tpu.models import heads
    from graspnet_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    cfg = GraspNetConfig()
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    B = 2
    cloud = jnp.asarray(rng.uniform(-0.4, 0.4, (B, cfg.num_point, 3)), jnp.float32)
    seeds = cloud[:, :1024]
    rots = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1024, 1, 1))
    params = heads.init_crop(jax.random.PRNGKey(0), cfg)

    from graspnet_tpu.ops.pallas.query import cylinder_query_multi_pallas

    def query(x, s, r):
        return cylinder_query_multi_pallas(
            x, s, r, cfg.cylinder_radius, cfg.hmin, tuple(cfg.hmax_list),
            cfg.crop_nsample,
        )

    timeit("cylinder query pallas (B=2)", query, cloud, seeds, rots)
    idx = jax.jit(query)(cloud, seeds, rots)

    def gather_rotate(x, s, r, i):
        b, ns_, nd, ss = i.shape
        grouped = ops.group_points(x, i.reshape(b, ns_ * nd, ss))
        grouped = grouped.reshape(b, ns_, nd, ss, 3) - s[:, :, None, None, :]
        return jnp.einsum("bndsi,bnij->bndsj", grouped, r)

    timeit("gather + rotate (XLA)", gather_rotate, cloud, seeds, rots, idx)
    grouped = jax.jit(gather_rotate)(cloud, seeds, rots, idx)

    from graspnet_tpu.ops.pallas.crop import crop_group_pallas

    def group_fused(x, s, r):
        return crop_group_pallas(
            x, s, r, cfg.cylinder_radius, cfg.hmin, tuple(cfg.hmax_list),
            cfg.crop_nsample,
        )

    timeit("fused query+gather+rotate (Pallas)", group_fused, cloud, seeds, rots)

    def mlp_train(g, p):
        out, stats = nn.shared_mlp(p, g, train=True, eps=cfg.bn_eps)
        return jnp.max(out, axis=3), stats

    timeit("shared_mlp train BN + pool", mlp_train, grouped, params["mlp"])

    def mlp_eval(g, p):
        out, _ = nn.shared_mlp(p, g, train=False, eps=cfg.bn_eps)
        return jnp.max(out, axis=3)

    timeit("shared_mlp eval BN + pool", mlp_eval, grouped, params["mlp"])

    def mlp_train_bwd(g, p):
        def f(q):
            out, _ = nn.shared_mlp(q, g, train=True, eps=cfg.bn_eps)
            pooled = jnp.max(out, axis=3)
            return jnp.sum(pooled * pooled)

        loss, grads = jax.value_and_grad(f)(p)
        return loss, grads

    # consume ALL leaves so the backward pass cannot be DCE'd
    def mlp_train_bwd_sum(g, p):
        loss, grads = mlp_train_bwd(g, p)
        return loss + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))

    timeit("shared_mlp train fwd+bwd (all grads)", mlp_train_bwd_sum, grouped,
           params["mlp"])

    def mlp_train_bwd_remat(g, p):
        @jax.checkpoint
        def fwd(q, gg):
            out, _ = nn.shared_mlp(q, gg, train=True, eps=cfg.bn_eps)
            return jnp.max(out, axis=3)

        def f(q):
            pooled = fwd(q, g)
            return jnp.sum(pooled * pooled)

        loss, grads = jax.value_and_grad(f)(p)
        return loss + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))

    timeit("shared_mlp train fwd+bwd (remat)", mlp_train_bwd_remat, grouped,
           params["mlp"])

    from graspnet_tpu.ops.pallas.mlp_train import crop_mlp_train_pallas

    def mlp_train_fused(g, p):
        return crop_mlp_train_pallas(p, g, cfg.bn_eps)

    timeit("fused mlp train fwd (pallas)", mlp_train_fused, grouped,
           params["mlp"])

    def mlp_train_fused_bwd(g, p):
        def f(q):
            pooled, _ = crop_mlp_train_pallas(q, g, cfg.bn_eps)
            return jnp.sum(pooled * pooled)

        loss, grads = jax.value_and_grad(f)(p)
        return loss + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))

    timeit("fused mlp train fwd+bwd (pallas)", mlp_train_fused_bwd, grouped,
           params["mlp"])

    def full_train(x, s, r, p):
        out, stats = heads.crop_forward(p, s, x, r, cfg, train=True)
        return out, stats

    timeit("crop_forward train (full)", full_train, cloud, seeds, rots, params)

    def full_train_bwd(x, s, r, p):
        def f(q):
            out, _ = heads.crop_forward(q, s, x, r, cfg, train=True)
            return jnp.sum(out * out)

        loss, grads = jax.value_and_grad(f)(p)
        return loss + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(grads))

    timeit("crop_forward train fwd+bwd (full)", full_train_bwd, cloud, seeds,
           rots, params)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the stage_ms JSON here")
    _args = ap.parse_args()
    main()
    if _args.out:
        dump_records(_args.out, source="scripts/crop_train_breakdown.py")
