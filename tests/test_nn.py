"""Layer parity vs torch eval/train semantics (torch CPU as oracle)."""

import numpy as np
import pytest

from graspnet_tpu.nn import layers as nn

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _rand_bn(rng, c):
    return {
        "scale": jnp.asarray(rng.normal(size=c).astype(np.float32)),
        "offset": jnp.asarray(rng.normal(size=c).astype(np.float32)),
        "mean": jnp.asarray(rng.normal(size=c).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, size=c).astype(np.float32)),
    }


def _to_torch_bn(p, c):
    # .copy() everywhere: np.asarray of a CPU jax array can be zero-copy, and
    # torch updates running stats in-place during train-mode forward.
    m = torch.nn.BatchNorm2d(c)
    m.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    m.bias.data = torch.from_numpy(np.asarray(p["offset"]).copy())
    m.running_mean.data = torch.from_numpy(np.asarray(p["mean"]).copy())
    m.running_var.data = torch.from_numpy(np.asarray(p["var"]).copy())
    return m


class TestDense:
    def test_matches_conv1x1(self, rng):
        cin, cout = 16, 24
        w = rng.normal(size=(cin, cout)).astype(np.float32)
        b = rng.normal(size=cout).astype(np.float32)
        x = rng.normal(size=(2, 10, 7, cin)).astype(np.float32)

        got = np.asarray(nn.dense({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x)))

        conv = torch.nn.Conv2d(cin, cout, 1)
        conv.weight.data = torch.from_numpy(w.T[:, :, None, None].copy())
        conv.bias.data = torch.from_numpy(b)
        with torch.no_grad():
            want = conv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestBatchNorm:
    def test_eval_matches_torch(self, rng):
        c = 12
        p = _rand_bn(rng, c)
        x = rng.normal(size=(2, 5, 6, c)).astype(np.float32)
        got, stats = nn.batch_norm(p, jnp.asarray(x), train=False)
        assert stats is None
        m = _to_torch_bn(p, c).eval()
        with torch.no_grad():
            want = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_train_matches_torch(self, rng):
        c = 8
        p = _rand_bn(rng, c)
        x = rng.normal(size=(3, 4, 5, c)).astype(np.float32)
        got, stats = nn.batch_norm(p, jnp.asarray(x), train=True)
        m = _to_torch_bn(p, c).train()
        momentum = 0.25
        m.momentum = momentum
        want = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
        # running-stat update parity
        new_bn = nn.bn_update_running(p, stats, momentum)
        np.testing.assert_allclose(np.asarray(new_bn["mean"]), m.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_bn["var"]), m.running_var.numpy(), atol=1e-5)


class TestSharedMLP:
    def test_stack_matches_torch(self, rng):
        dims = (5, 8, 6)
        x = rng.normal(size=(2, 9, 4, dims[0])).astype(np.float32)
        import jax

        params = nn.shared_mlp_init(jax.random.PRNGKey(0), dims, bn=True)
        # randomize bn stats so eval mode is non-trivial
        for layer in params:
            c = layer["kernel"].shape[1]
            layer["bn"] = _rand_bn(rng, c)
        got, _ = nn.shared_mlp(params, jnp.asarray(x), train=False)

        y = torch.from_numpy(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            for layer in params:
                cin, cout = layer["kernel"].shape
                conv = torch.nn.Conv2d(cin, cout, 1, bias=False)
                conv.weight.data = torch.from_numpy(
                    np.asarray(layer["kernel"]).T[:, :, None, None].copy()
                )
                y = conv(y)
                y = _to_torch_bn(layer["bn"], cout).eval()(y)
                y = torch.relu(y)
        want = y.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
