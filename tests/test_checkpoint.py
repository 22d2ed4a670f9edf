"""Checkpoint converter tests: synthetic torch state dict -> params pytree.

The published reference checkpoints are not available in this environment, so
a synthetic state dict with the reference's exact module names/shapes
(view_estimator.backbone.sa1.mlp_module.layer0.conv.weight, ...) is generated
here; the converter must produce a pytree structurally identical to
init_graspnet's and map values correctly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graspnet_tpu import checkpoint
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import init_graspnet

torch = pytest.importorskip("torch")


def make_reference_state_dict(cfg: GraspNetConfig, rng):
    """Synthetic torch state dict with the reference GraspNet's names."""
    sd = {}

    def conv(prefix, cin, cout, bias, ndim):
        shape = (cout, cin) + (1,) * ndim
        sd[f"{prefix}.weight"] = torch.from_numpy(
            rng.normal(size=shape).astype(np.float32)
        )
        if bias:
            sd[f"{prefix}.bias"] = torch.from_numpy(
                rng.normal(size=cout).astype(np.float32)
            )

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.from_numpy(rng.normal(size=c).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.from_numpy(rng.normal(size=c).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(
            rng.normal(size=c).astype(np.float32)
        )
        sd[f"{prefix}.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 2, size=c).astype(np.float32)
        )
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    def shared_mlp(prefix, dims):
        for i in range(len(dims) - 1):
            conv(f"{prefix}.layer{i}.conv", dims[i], dims[i + 1], bias=False, ndim=2)
            bn(f"{prefix}.layer{i}.bn.bn", dims[i + 1])

    bb = "view_estimator.backbone"
    for k, sa in (("sa1", cfg.sa1), ("sa2", cfg.sa2), ("sa3", cfg.sa3), ("sa4", cfg.sa4)):
        shared_mlp(f"{bb}.{k}.mlp_module", sa.mlp)
    shared_mlp(f"{bb}.fp1.mlp", cfg.fp1_mlp)
    shared_mlp(f"{bb}.fp2.mlp", cfg.fp2_mlp)

    c, v2 = cfg.seed_feature_dim, 2 + cfg.num_view
    vp = "view_estimator.vpmodule"
    conv(f"{vp}.conv1", c, c, bias=True, ndim=1)
    bn(f"{vp}.bn1", c)
    conv(f"{vp}.conv2", c, v2, bias=True, ndim=1)
    bn(f"{vp}.bn2", v2)
    conv(f"{vp}.conv3", v2, v2, bias=True, ndim=1)

    shared_mlp("grasp_generator.crop.mlps", cfg.crop_mlp)

    cc, h = cfg.crop_mlp[-1], cfg.head_hidden
    for head, out in (("operation", 3 * cfg.num_angle), ("tolerance", cfg.num_angle)):
        p = f"grasp_generator.{head}"
        conv(f"{p}.conv1", cc, h, bias=True, ndim=1)
        bn(f"{p}.bn1", h)
        conv(f"{p}.conv2", h, h, bias=True, ndim=1)
        bn(f"{p}.bn2", h)
        conv(f"{p}.conv3", h, out, bias=True, ndim=1)
    return sd


def test_convert_structure_matches_init(rng):
    cfg = GraspNetConfig.tiny()
    sd = make_reference_state_dict(cfg, rng)
    got = checkpoint.convert_torch_state_dict(sd)
    want = init_graspnet(jax.random.PRNGKey(0), cfg)

    got_tree = jax.tree_util.tree_structure(got)
    want_tree = jax.tree_util.tree_structure(want)
    assert got_tree == want_tree

    for (pg, g), (pw, w) in zip(
        jax.tree_util.tree_leaves_with_path(got),
        jax.tree_util.tree_leaves_with_path(want),
    ):
        assert g.shape == w.shape, f"{pg}: {g.shape} vs {w.shape}"


def test_convert_value_mapping(rng):
    cfg = GraspNetConfig.tiny()
    sd = make_reference_state_dict(cfg, rng)
    params = checkpoint.convert_torch_state_dict(sd)
    w = sd["view_estimator.backbone.sa1.mlp_module.layer0.conv.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["sa1"]["mlp"][0]["kernel"]), w[:, :, 0, 0].T
    )
    np.testing.assert_array_equal(
        np.asarray(params["approach"]["bn1"]["mean"]),
        sd["view_estimator.vpmodule.bn1.running_mean"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(params["operation"]["conv3"]["bias"]),
        sd["grasp_generator.operation.conv3.bias"].numpy(),
    )


def test_tar_roundtrip(rng, tmp_path):
    cfg = GraspNetConfig.tiny()
    sd = make_reference_state_dict(cfg, rng)
    path = str(tmp_path / "checkpoint.tar")
    torch.save(
        {"model_state_dict": sd, "epoch": 3, "loss": 0.5, "optimizer_state_dict": {}},
        path,
    )
    params = checkpoint.load_torch_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(params["crop"]["mlp"][0]["bn"]["scale"]),
        sd["grasp_generator.crop.mlps.layer0.bn.bn.weight"].numpy(),
    )


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    cfg = GraspNetConfig.tiny()
    params = init_graspnet(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "native_ckpt")
    checkpoint.save(path, params)
    restored = checkpoint.restore(path)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def params_to_reference_state_dict(params):
    """Inverse of convert_torch_state_dict: params pytree -> torch state dict
    with the reference's exact module names/shapes.  Used by the rehearsal
    (tests/test_rehearsal.py) to fabricate a 'published' checkpoint whose
    weights are a healthy init instead of raw noise."""
    sd = {}

    def put_conv(prefix, layer, ndim):
        w = np.asarray(layer["kernel"]).T  # (out, in)
        sd[f"{prefix}.weight"] = torch.from_numpy(
            w.reshape(w.shape + (1,) * ndim).copy()
        )
        if "bias" in layer:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(layer["bias"]).copy())

    def put_bn(prefix, bn_p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(bn_p["scale"]).copy())
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(bn_p["offset"]).copy())
        sd[f"{prefix}.running_mean"] = torch.from_numpy(np.asarray(bn_p["mean"]).copy())
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.asarray(bn_p["var"]).copy())
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    def put_mlp(prefix, layers):
        for i, layer in enumerate(layers):
            put_conv(f"{prefix}.layer{i}.conv", layer, ndim=2)
            if "bn" in layer:
                put_bn(f"{prefix}.layer{i}.bn.bn", layer["bn"])

    bb = "view_estimator.backbone"
    for k in ("sa1", "sa2", "sa3", "sa4"):
        put_mlp(f"{bb}.{k}.mlp_module", params["backbone"][k]["mlp"])
    for k in ("fp1", "fp2"):
        put_mlp(f"{bb}.{k}.mlp", params["backbone"][k]["mlp"])

    def put_head(prefix, head):
        for c in ("conv1", "conv2", "conv3"):
            put_conv(f"{prefix}.{c}", head[c], ndim=1)
        for b in ("bn1", "bn2"):
            put_bn(f"{prefix}.{b}", head[b])

    put_head("view_estimator.vpmodule", params["approach"])
    put_mlp("grasp_generator.crop.mlps", params["crop"]["mlp"])
    put_head("grasp_generator.operation", params["operation"])
    put_head("grasp_generator.tolerance", params["tolerance"])
    return sd


def test_inverse_roundtrip(rng):
    """convert(inverse(params)) must reproduce params exactly."""
    cfg = GraspNetConfig.tiny()
    params = init_graspnet(jax.random.PRNGKey(1), cfg)
    sd = params_to_reference_state_dict(params)
    back = checkpoint.convert_torch_state_dict(sd)
    la, lb = jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
