"""PyTorch-checkpoint -> flax-pytree converters.

Needed for float-tolerance parity with the reference from day one
(SURVEY.md §7 step 1): the reference ships DiffWave checkpoints as
``{'model_state_dict': ...}`` pickles with *weight-normalized* convs
(``WaveNet.py:28,67,72`` — parameters stored as ``weight_g``/``weight_v``),
and improved-diffusion UNets as raw state dicts. Classifier checkpoints are
whole-module pickles (``create_model:8``) — load those with torch in an
environment that has the reference classes, then pass ``module.state_dict()``
here.

All converters are numpy-only after the initial ``torch.load``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def fuse_weight_norm(sd: Dict[str, Any], prefix: str) -> np.ndarray:
    """w = g * v / ||v||_2 over all dims except dim 0 (torch weight_norm)."""
    g = _np(sd[prefix + "weight_g"]).astype(np.float64)
    v = _np(sd[prefix + "weight_v"]).astype(np.float64)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                keepdims=True))
    return (g * v / norm).astype(np.float32)


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv1d (out, in, k) -> flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0)).copy()


def _dense(sd, prefix):
    return {"kernel": _np(sd[prefix + "weight"]).T.copy(),
            "bias": _np(sd[prefix + "bias"]).copy()}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """torch.load a checkpoint file; unwraps the reference's
    ``{'model_state_dict': ...}`` wrapper (``diffwave_ddpm.py:406-407``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    if hasattr(ckpt, "state_dict"):
        return ckpt.state_dict()
    return ckpt


def convert_diffwave(sd: Dict[str, Any], num_res_layers: int = 36
                     ) -> Dict[str, Any]:
    """Reference WaveNet state dict -> flax params for
    :class:`audiopure_tpu.models.wavenet.WaveNet` (weight norm fused)."""
    sd = {k: v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    p["init_conv"] = {
        "kernel": _conv_w(fuse_weight_norm(sd, "init_conv.0.conv.")),
        "bias": _np(sd["init_conv.0.conv.bias"]),
    }
    p["fc_t1"] = _dense(sd, "residual_layer.fc_t1.")
    p["fc_t2"] = _dense(sd, "residual_layer.fc_t2.")

    for n in range(num_res_layers):
        rb = f"residual_layer.residual_blocks.{n}."
        p[f"res_block_{n}"] = {
            "fc_t": _dense(sd, rb + "fc_t."),
            "dilated_conv": {
                "kernel": _conv_w(fuse_weight_norm(
                    sd, rb + "dilated_conv_layer.conv.")),
                "bias": _np(sd[rb + "dilated_conv_layer.conv.bias"]),
            },
            "res_conv": {
                "kernel": _conv_w(fuse_weight_norm(sd, rb + "res_conv.")),
                "bias": _np(sd[rb + "res_conv.bias"]),
            },
            "skip_conv": {
                "kernel": _conv_w(fuse_weight_norm(sd, rb + "skip_conv.")),
                "bias": _np(sd[rb + "skip_conv.bias"]),
            },
        }

    p["final_conv1"] = {
        "kernel": _conv_w(fuse_weight_norm(sd, "final_conv.0.conv.")),
        "bias": _np(sd["final_conv.0.conv.bias"]),
    }
    p["final_conv2"] = {
        "kernel": _conv_w(_np(sd["final_conv.2.conv.weight"])),
        "bias": _np(sd["final_conv.2.conv.bias"]),
    }
    return {"params": p}


def convert_diffwave_checkpoint(path: str, num_res_layers: int = 36
                                ) -> Dict[str, Any]:
    return convert_diffwave(load_torch_state_dict(path), num_res_layers)
