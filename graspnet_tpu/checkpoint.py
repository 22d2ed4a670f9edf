"""Checkpoint I/O: torch .tar converter + orbax-backed native checkpoints.

The reference publishes single-file torch checkpoints
(`checkpoint-rs.tar` / `checkpoint-kn.tar`, reference README.md:74-83) saved
as {epoch, optimizer_state_dict, loss, model_state_dict} (train.py:211-219).
`convert_torch_state_dict` maps that state dict onto this framework's params
pytree so published weights reproduce bit-for-bit; `save` / `restore` are the
native orbax path used by the trainer.

Name mapping (torch module tree -> pytree):
  view_estimator.backbone.sa{k}.mlp_module.layer{i}.conv.weight -> backbone.sa{k}.mlp[i].kernel
  ...layer{i}.bn.bn.{weight,bias,running_mean,running_var}      -> ...mlp[i].bn.{scale,offset,mean,var}
  view_estimator.backbone.fp{k}.mlp.layer{i}.*                  -> backbone.fp{k}.mlp[i].*
  view_estimator.vpmodule.{conv1..3,bn1,bn2}                    -> approach.*
  grasp_generator.crop.mlps.layer{i}.*                          -> crop.mlp[i].*
  grasp_generator.{operation,tolerance}.{conv1..3,bn1,bn2}      -> operation/tolerance.*

Torch conv weights are (out, in, 1[, 1]) and become (in, out) dense kernels.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _conv_kernel(w: np.ndarray) -> jnp.ndarray:
    """(out, in, 1) or (out, in, 1, 1) torch conv weight -> (in, out) kernel."""
    w = np.asarray(w)
    while w.ndim > 2:
        assert w.shape[-1] == 1, f"not a 1x1 conv: {w.shape}"
        w = w[..., 0]
    return jnp.asarray(w.T.copy())


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
        "offset": jnp.asarray(np.asarray(sd[prefix + ".bias"])),
        "mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"])),
    }


def _shared_mlp(sd: Dict[str, np.ndarray], prefix: str) -> list:
    """Collect layer{i}.conv/bn entries under `prefix` into a SharedMLP list."""
    layers = []
    i = 0
    while f"{prefix}.layer{i}.conv.weight" in sd:
        layer: Dict[str, Any] = {
            "kernel": _conv_kernel(sd[f"{prefix}.layer{i}.conv.weight"])
        }
        if f"{prefix}.layer{i}.conv.bias" in sd:
            layer["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.layer{i}.conv.bias"]))
        if f"{prefix}.layer{i}.bn.bn.weight" in sd:
            layer["bn"] = _bn(sd, f"{prefix}.layer{i}.bn.bn")
        layers.append(layer)
        i += 1
    if not layers:
        raise KeyError(f"no SharedMLP layers found under '{prefix}'")
    return layers


def _conv_head(sd: Dict[str, np.ndarray], prefix: str, convs=("conv1", "conv2", "conv3"), bns=("bn1", "bn2")) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for c in convs:
        out[c] = {"kernel": _conv_kernel(sd[f"{prefix}.{c}.weight"])}
        if f"{prefix}.{c}.bias" in sd:
            out[c]["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.{c}.bias"]))
    for b in bns:
        out[b] = _bn(sd, f"{prefix}.{b}")
    return out


def convert_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Torch model state dict -> graspnet_tpu params pytree."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}
    # tolerate DataParallel 'module.' wrapping (reference train.py:215-218)
    if all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    bb = "view_estimator.backbone"
    params = {
        "backbone": {
            **{
                f"sa{k}": {"mlp": _shared_mlp(sd, f"{bb}.sa{k}.mlp_module")}
                for k in (1, 2, 3, 4)
            },
            **{f"fp{k}": {"mlp": _shared_mlp(sd, f"{bb}.fp{k}.mlp")} for k in (1, 2)},
        },
        "approach": _conv_head(sd, "view_estimator.vpmodule"),
        "crop": {"mlp": _shared_mlp(sd, "grasp_generator.crop.mlps")},
        "operation": _conv_head(sd, "grasp_generator.operation"),
        "tolerance": _conv_head(sd, "grasp_generator.tolerance"),
    }
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference torch .tar checkpoint and convert the model weights."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    return convert_torch_state_dict(sd)


# ------------------------------------------------------------ native path --


def save(path: str, payload: Any) -> None:
    """Save a pytree checkpoint (params / opt state / step) via orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def restore(path: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)
