"""Dense / BatchNorm / SharedMLP primitives.

Numerical semantics match torch so converted reference checkpoints reproduce
outputs bit-for-bit in eval mode:
  * dense == 1x1 convolution (reference pytorch_utils.py:67-121): x @ W + b
    on the trailing channel axis;
  * batch_norm eval: (x - running_mean) / sqrt(running_var + 1e-5) * scale
    + offset (torch BatchNorm eval path);
  * batch_norm train: normalize with biased batch variance, update running
    stats with unbiased variance under the caller-supplied momentum
    (torch semantics; the reference schedules momentum 0.5 -> 0.001 via
    BNMomentumScheduler, pytorch_utils.py:271-296);
  * shared_mlp == stack of [dense -> bn -> relu] (pytorch_utils.py:11-36).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------- dense ----


def dense_init(key: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    """Kaiming-normal (fan_in) init, matching the reference's conv init."""
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * jnp.sqrt(2.0 / in_dim)
    p = {"kernel": w}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(params: Params, x: jax.Array) -> jax.Array:
    w = params["kernel"]
    if w.shape[0] <= 4:
        # tiny contraction dim (e.g. the xyz->C first layer): the MXU pads K
        # to 128, wasting >30x; a VPU broadcast-sum is effectively free.
        y = x[..., 0:1] * w[0]
        for i in range(1, w.shape[0]):
            y = y + x[..., i : i + 1] * w[i]
    else:
        y = jnp.matmul(x, w, preferred_element_type=x.dtype)
    if "bias" in params:
        y = y + params["bias"]
    return y


# ----------------------------------------------------------- batch norm ----


def batch_norm_init(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "offset": jnp.zeros((dim,), jnp.float32),
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def batch_norm(
    params: Params,
    x: jax.Array,
    *,
    train: bool = False,
    eps: float = 1e-5,
) -> Tuple[jax.Array, Optional[Params]]:
    """Normalize over all axes but the last.

    Returns (y, batch_stats) where batch_stats is {'mean','var'} (biased and
    unbiased respectively, ready for the running-stat update) in train mode,
    else None.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        n = 1
        for a in axes:
            n *= x.shape[a]
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean), axis=axes)  # biased, for normalization
        unbiased = var * (n / max(n - 1, 1))
        y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["offset"]
        return y, {"mean": mean, "var": unbiased}
    inv = jax.lax.rsqrt(params["var"] + eps)
    y = (x - params["mean"]) * inv * params["scale"] + params["offset"]
    return y, None


def bn_update_running(params: Params, stats: Params, momentum) -> Params:
    """running <- (1 - m) * running + m * batch (torch convention)."""
    out = dict(params)
    out["mean"] = (1.0 - momentum) * params["mean"] + momentum * stats["mean"]
    out["var"] = (1.0 - momentum) * params["var"] + momentum * stats["var"]
    return out


# ------------------------------------------------------------ SharedMLP ----


def shared_mlp_init(key: jax.Array, dims: Tuple[int, ...], bn: bool = True) -> List[Params]:
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 1):
        layer = dense_init(keys[i], dims[i], dims[i + 1], use_bias=not bn)
        if bn:
            layer["bn"] = batch_norm_init(dims[i + 1])
        layers.append(layer)
    return layers


def shared_mlp(
    layers: List[Params],
    x: jax.Array,
    *,
    train: bool = False,
    eps: float = 1e-5,
) -> Tuple[jax.Array, Optional[List[Params]]]:
    """[dense -> bn -> relu] stack. Returns (y, per-layer batch stats | None)."""
    stats_out: List[Optional[Params]] = []
    for layer in layers:
        x = dense(layer, x)
        if "bn" in layer:
            x, stats = batch_norm(layer["bn"], x, train=train, eps=eps)
            stats_out.append(stats)
        else:
            stats_out.append(None)
        x = jax.nn.relu(x)
    return x, (stats_out if train else None)


def shared_mlp_update_stats(layers: List[Params], stats: List[Optional[Params]], momentum) -> List[Params]:
    out = []
    for layer, st in zip(layers, stats):
        new_layer = dict(layer)
        if st is not None and "bn" in layer:
            new_layer["bn"] = bn_update_running(layer["bn"], st, momentum)
        out.append(new_layer)
    return out
