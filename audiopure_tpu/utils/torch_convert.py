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


# ---------------------------------------------------------------------------
# Improved-Diffusion UNet
# ---------------------------------------------------------------------------

def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """torch conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(_np(w), (2, 3, 1, 0)).copy()


def _gn(sd, prefix):
    return {"scale": _np(sd[prefix + "weight"]),
            "bias": _np(sd[prefix + "bias"])}


def _conv1d_as_dense(sd, prefix):
    """torch conv1d k=1 (out, in, 1) -> flax Dense (in, out)."""
    return {"kernel": _np(sd[prefix + "weight"])[:, :, 0].T.copy(),
            "bias": _np(sd[prefix + "bias"])}


def _resblock(sd, prefix):
    """torch ResBlock (``unet.py:107-171``) -> our ResBlock params."""
    out = {
        "GroupNorm_0": _gn(sd, prefix + "in_layers.0."),
        "in_conv": {"kernel": _conv2d_w(sd[prefix + "in_layers.2.weight"]),
                    "bias": _np(sd[prefix + "in_layers.2.bias"])},
        "emb_proj": _dense(sd, prefix + "emb_layers.1."),
        "GroupNorm_1": _gn(sd, prefix + "out_layers.0."),
        "out_conv": {"kernel": _conv2d_w(sd[prefix + "out_layers.3.weight"]),
                     "bias": _np(sd[prefix + "out_layers.3.bias"])},
    }
    if prefix + "skip_connection.weight" in sd:
        out["skip_conv"] = {
            "kernel": _conv2d_w(sd[prefix + "skip_connection.weight"]),
            "bias": _np(sd[prefix + "skip_connection.bias"])}
    return out


def _attention(sd, prefix):
    """torch AttentionBlock (``unet.py:200-230``) -> our params. The qkv
    1x1-conv channel layout ([head-major, (q,k,v)-minor]) matches our
    (B, T, H, 3ch) reshape, so a plain transpose suffices."""
    return {
        "GroupNorm_0": _gn(sd, prefix + "norm."),
        "qkv": _conv1d_as_dense(sd, prefix + "qkv."),
        "proj_out": _conv1d_as_dense(sd, prefix + "proj_out."),
    }


def convert_improved_diffusion_unet(
    sd: Dict[str, Any],
    num_res_blocks: int = 3,
    channel_mult=(1, 2, 2, 2),
    attention_ds=(2, 4),
    class_cond: bool = False,
) -> Dict[str, Any]:
    """Improved-Diffusion UNet state dict -> flax params for
    :class:`audiopure_tpu.models.unet.UNetModel` (the audio repo config by
    default: ``script_util.py:11-126``)."""
    p: Dict[str, Any] = {}
    p["time_1"] = _dense(sd, "time_embed.0.")
    p["time_2"] = _dense(sd, "time_embed.2.")
    if class_cond:
        p["label_emb"] = {"embedding": _np(sd["label_emb.weight"])}

    p["in_conv"] = {"kernel": _conv2d_w(sd["input_blocks.0.0.weight"]),
                    "bias": _np(sd["input_blocks.0.0.bias"])}

    idx = 1
    ds = 1
    for level, mult in enumerate(channel_mult):
        for i in range(num_res_blocks):
            pre = f"input_blocks.{idx}."
            p[f"down_{level}_{i}"] = _resblock(sd, pre + "0.")
            if ds in attention_ds:
                p[f"down_attn_{level}_{i}"] = _attention(sd, pre + "1.")
            idx += 1
        if level != len(channel_mult) - 1:
            p[f"downsample_{level}"] = {
                "kernel": _conv2d_w(sd[f"input_blocks.{idx}.0.op.weight"]),
                "bias": _np(sd[f"input_blocks.{idx}.0.op.bias"])}
            idx += 1
            ds *= 2

    p["mid_res1"] = _resblock(sd, "middle_block.0.")
    p["mid_attn"] = _attention(sd, "middle_block.1.")
    p["mid_res2"] = _resblock(sd, "middle_block.2.")

    idx = 0
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            pre = f"output_blocks.{idx}."
            p[f"up_{level}_{i}"] = _resblock(sd, pre + "0.")
            sub = 1
            if ds in attention_ds:
                p[f"up_attn_{level}_{i}"] = _attention(sd, pre + f"{sub}.")
                sub += 1
            if level and i == num_res_blocks:
                p[f"upsample_{level}"] = {
                    "kernel": _conv2d_w(
                        sd[pre + f"{sub}.conv.weight"]),
                    "bias": _np(sd[pre + f"{sub}.conv.bias"])}
                ds //= 2
            idx += 1

    p["GroupNorm_0"] = _gn(sd, "out.0.")
    p["out_conv"] = {"kernel": _conv2d_w(sd["out.2.weight"]),
                     "bias": _np(sd["out.2.bias"])}
    return {"params": p}


def convert_unet_checkpoint(path: str, **kw) -> Dict[str, Any]:
    return convert_improved_diffusion_unet(load_torch_state_dict(path),
                                           **kw)


# ---------------------------------------------------------------------------
# WideResNet classifier (the reference's flagship mel classifier)
# ---------------------------------------------------------------------------

def _bn_pair(sd, prefix):
    params = {"scale": _np(sd[prefix + "weight"]),
              "bias": _np(sd[prefix + "bias"])}
    stats = {"mean": _np(sd[prefix + "running_mean"]),
             "var": _np(sd[prefix + "running_var"])}
    return params, stats


def convert_wideresnet(sd: Dict[str, Any], depth: int = 28,
                       widen_factor: int = 10) -> Dict[str, Any]:
    """Reference WideResNet state dict (``wideresnet.py:16-95`` naming:
    conv1, block{1,2,3}.layer.{i}.{bn1,conv1,bn2,conv2,convShortcut},
    bn1, fc) -> flax variables for ``models.convnets.WideResNet``
    (params + batch_stats). Classifier *module pickles* must first be
    loaded with torch and reduced to ``module.state_dict()``."""
    n = (depth - 4) // 6
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    p["Conv_0"] = {"kernel": _conv2d_w(sd["conv1.weight"])}

    widths_in = [16, 16 * widen_factor, 32 * widen_factor]
    blk_idx = 0
    for stage in range(3):
        for i in range(n):
            pre = f"block{stage + 1}.layer.{i}."
            name = f"WRNBlock_{blk_idx}"
            bp: Dict[str, Any] = {}
            bb: Dict[str, Any] = {}
            bp["BatchNorm_0"], bb["BatchNorm_0"] = _bn_pair(sd, pre + "bn1.")
            bp["Conv_0"] = {"kernel": _conv2d_w(sd[pre + "conv1.weight"])}
            bp["BatchNorm_1"], bb["BatchNorm_1"] = _bn_pair(sd, pre + "bn2.")
            bp["Conv_1"] = {"kernel": _conv2d_w(sd[pre + "conv2.weight"])}
            if pre + "convShortcut.weight" in sd:
                bp["Conv_2"] = {"kernel": _conv2d_w(
                    sd[pre + "convShortcut.weight"])}
            p[name] = bp
            bs[name] = bb
            blk_idx += 1
    del widths_in

    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn_pair(sd, "bn1.")
    p["Dense_0"] = _dense(sd, "fc.")
    return {"params": p, "batch_stats": bs}


def convert_wideresnet_checkpoint(path: str, **kw) -> Dict[str, Any]:
    return convert_wideresnet(load_torch_state_dict(path), **kw)


_VGG_CFG_E = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def convert_vgg19_bn(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference VGG19-BN state dict (torchvision naming:
    ``features.{i}.*`` conv/bn interleaved with ReLU/MaxPool,
    ``classifier.{0,3,6}.*``; ``vgg.py:31-89``) -> flax variables for
    ``models.convnets.VGG(cfg_key='E', batch_norm=True)``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    feat_idx = 0
    layer = 0
    for v in _VGG_CFG_E:
        if v == "M":
            feat_idx += 1
            continue
        p[f"Conv_{layer}"] = {
            "kernel": _conv2d_w(sd[f"features.{feat_idx}.weight"]),
            "bias": _np(sd[f"features.{feat_idx}.bias"])}
        bn = f"features.{feat_idx + 1}."
        p[f"BatchNorm_{layer}"], bs[f"BatchNorm_{layer}"] = _bn_pair(sd, bn)
        feat_idx += 3  # conv, bn, relu
        layer += 1
    for j, ci in enumerate((0, 3, 6)):
        p[f"Dense_{j}"] = _dense(sd, f"classifier.{ci}.")
    return {"params": p, "batch_stats": bs}


def convert_vgg19_bn_checkpoint(path: str) -> Dict[str, Any]:
    return convert_vgg19_bn(load_torch_state_dict(path))


def convert_m5(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference M5 state dict (``M5Net.py:4-38`` naming: conv1-4, bn1-4,
    fc1) -> flax variables for ``models.m5.M5``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    for i in range(4):
        p[f"Conv_{i}"] = {
            "kernel": _conv_w(_np(sd[f"conv{i + 1}.weight"])),
            "bias": _np(sd[f"conv{i + 1}.bias"])}
        p[f"BatchNorm_{i}"], bs[f"BatchNorm_{i}"] = _bn_pair(
            sd, f"bn{i + 1}.")
    p["Dense_0"] = _dense(sd, "fc1.")
    return {"params": p, "batch_stats": bs}


def convert_kws(sd: Dict[str, Any], gru_layers: int = 2) -> Dict[str, Any]:
    """Reference KWSModel state dict (``RCNN_KWS/model.py:5-91`` naming:
    CRNN_model.sepconv.{0,1}, CRNN_model.gru.*_l{n}[_reverse],
    attn_layer.{Wx_b,Vt}, apply_attn.U) -> flax variables for
    ``models.rcnn_kws.KWSModel``."""
    p: Dict[str, Any] = {}
    p["depthwise"] = {
        "kernel": _conv_w(_np(sd["CRNN_model.sepconv.0.weight"])),
        "bias": _np(sd["CRNN_model.sepconv.0.bias"])}
    p["pointwise"] = {
        "kernel": _conv_w(_np(sd["CRNN_model.sepconv.1.weight"])),
        "bias": _np(sd["CRNN_model.sepconv.1.bias"])}

    bigru: Dict[str, Any] = {}
    for layer in range(gru_layers):
        for direction, name in (("", "fwd"), ("_reverse", "bwd")):
            pre = f"CRNN_model.gru."
            suf = f"_l{layer}{direction}"
            bigru[f"{name}_{layer}"] = {
                "w_ih": {
                    "kernel": _np(sd[pre + f"weight_ih{suf}"]).T.copy(),
                    "bias": _np(sd[pre + f"bias_ih{suf}"])},
                "w_hh_kernel": _np(sd[pre + f"weight_hh{suf}"]).T.copy(),
                "w_hh_bias": _np(sd[pre + f"bias_hh{suf}"]),
            }
    p["BiGRU_0"] = bigru
    p["attn_w"] = _dense(sd, "attn_layer.Wx_b.")
    p["attn_v"] = {"kernel": _np(sd["attn_layer.Vt.weight"]).T.copy()}
    p["head"] = {"kernel": _np(sd["apply_attn.U.weight"]).T.copy()}
    return {"params": p}


def convert_dpn(sd: Dict[str, Any], num_blocks=(3, 4, 20, 3)
                ) -> Dict[str, Any]:
    """Reference DPN state dict (``dpn.py:16-100`` naming: conv1, bn1,
    layer{1-4}.{i}.{conv1,bn1,conv2,bn2,conv3,bn3,shortcut.0,shortcut.1},
    linear) -> flax variables for ``models.convnets.DPN``."""
    p: Dict[str, Any] = {"Conv_0": {"kernel": _conv2d_w(sd["conv1.weight"])}}
    bs: Dict[str, Any] = {}
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn_pair(sd, "bn1.")

    blk = 0
    for stage in range(4):
        for i in range(num_blocks[stage]):
            pre = f"layer{stage + 1}.{i}."
            name = f"DPNBottleneck_{blk}"
            bp: Dict[str, Any] = {}
            bb: Dict[str, Any] = {}
            for c in range(3):
                bp[f"Conv_{c}"] = {
                    "kernel": _conv2d_w(sd[pre + f"conv{c + 1}.weight"])}
                bp[f"BatchNorm_{c}"], bb[f"BatchNorm_{c}"] = _bn_pair(
                    sd, pre + f"bn{c + 1}.")
            if pre + "shortcut.0.weight" in sd:
                bp["Conv_3"] = {
                    "kernel": _conv2d_w(sd[pre + "shortcut.0.weight"])}
                bp["BatchNorm_3"], bb["BatchNorm_3"] = _bn_pair(
                    sd, pre + "shortcut.1.")
            p[name] = bp
            bs[name] = bb
            blk += 1
    p["Dense_0"] = _dense(sd, "linear.")
    return {"params": p, "batch_stats": bs}


def convert_resnext(sd: Dict[str, Any], depth: int = 29) -> Dict[str, Any]:
    """Reference CifarResNeXt state dict (``resnext.py:23-120`` naming:
    conv_1_3x3, bn_1, stage_{s}.stage_{s}_bottleneck_{i}.{conv_reduce,
    bn_reduce,conv_conv,bn,conv_expand,bn_expand,
    shortcut.shortcut_conv,shortcut.shortcut_bn}, classifier) -> flax
    variables for ``models.convnets.CifarResNeXt``."""
    block_depth = (depth - 2) // 9
    p: Dict[str, Any] = {
        "Conv_0": {"kernel": _conv2d_w(sd["conv_1_3x3.weight"])}}
    bs: Dict[str, Any] = {}
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn_pair(sd, "bn_1.")

    blk = 0
    for s in range(1, 4):
        for i in range(block_depth):
            pre = f"stage_{s}.stage_{s}_bottleneck_{i}."
            name = f"ResNeXtBottleneck_{blk}"
            bp: Dict[str, Any] = {}
            bb: Dict[str, Any] = {}
            for c, (cv, bn) in enumerate(
                    (("conv_reduce.", "bn_reduce."),
                     ("conv_conv.", "bn."),
                     ("conv_expand.", "bn_expand."))):
                bp[f"Conv_{c}"] = {
                    "kernel": _conv2d_w(sd[pre + cv + "weight"])}
                bp[f"BatchNorm_{c}"], bb[f"BatchNorm_{c}"] = _bn_pair(
                    sd, pre + bn)
            if pre + "shortcut.shortcut_conv.weight" in sd:
                bp["Conv_3"] = {"kernel": _conv2d_w(
                    sd[pre + "shortcut.shortcut_conv.weight"])}
                bp["BatchNorm_3"], bb["BatchNorm_3"] = _bn_pair(
                    sd, pre + "shortcut.shortcut_bn.")
            p[name] = bp
            bs[name] = bb
            blk += 1
    p["Dense_0"] = _dense(sd, "classifier.")
    return {"params": p, "batch_stats": bs}


def convert_densenet(sd: Dict[str, Any], depth: int = 100
                     ) -> Dict[str, Any]:
    """Reference DenseNet-BC state dict (``densenet.py:17-120`` naming:
    conv1, dense{1-3}.{i}.{bn1,conv1,bn2,conv2}, trans{1,2}.{bn1,conv1},
    bn, fc) -> flax variables for ``models.convnets.DenseNet``.

    The flax module creates its norm/conv layers inline, so names follow
    creation order: Conv_0 stem, then alternating BatchNorm_k / Conv_k.
    """
    n = (depth - 4) // 3 // 2
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    p["Conv_0"] = {"kernel": _conv2d_w(sd["conv1.weight"])}

    bn_i, conv_i = 0, 1

    def put_bn(prefix):
        nonlocal bn_i
        p[f"BatchNorm_{bn_i}"], bs[f"BatchNorm_{bn_i}"] = _bn_pair(
            sd, prefix)
        bn_i += 1

    def put_conv(prefix):
        nonlocal conv_i
        p[f"Conv_{conv_i}"] = {"kernel": _conv2d_w(sd[prefix + "weight"])}
        conv_i += 1

    for b in range(3):
        for i in range(n):
            pre = f"dense{b + 1}.{i}."
            put_bn(pre + "bn1.")
            put_conv(pre + "conv1.")
            put_bn(pre + "bn2.")
            put_conv(pre + "conv2.")
        if b < 2:
            pre = f"trans{b + 1}."
            put_bn(pre + "bn1.")
            put_conv(pre + "conv1.")

    put_bn("bn.")
    p["Dense_0"] = _dense(sd, "fc.")
    return {"params": p, "batch_stats": bs}


def convert_resnet(sd: Dict[str, Any], layers=(2, 2, 2, 2),
                   bottleneck: bool = False) -> Dict[str, Any]:
    """torchvision-style ResNet state dict (the reference's
    ``resnet.py:103-161`` naming: conv1, bn1, layer{1-4}.{i}.*, fc) ->
    flax variables for ``models.convnets.ResNet``."""
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    p["Conv_0"] = {"kernel": _conv2d_w(sd["conv1.weight"])}
    p["BatchNorm_0"], bs["BatchNorm_0"] = _bn_pair(sd, "bn1.")

    blk_name = "BottleneckBlock" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    blk_idx = 0
    for stage in range(4):
        for i in range(layers[stage]):
            pre = f"layer{stage + 1}.{i}."
            name = f"{blk_name}_{blk_idx}"
            bp: Dict[str, Any] = {}
            bb: Dict[str, Any] = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {
                    "kernel": _conv2d_w(sd[pre + f"conv{c + 1}.weight"])}
                bp[f"BatchNorm_{c}"], bb[f"BatchNorm_{c}"] = _bn_pair(
                    sd, pre + f"bn{c + 1}.")
            if pre + "downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": _conv2d_w(sd[pre + "downsample.0.weight"])}
                (bp[f"BatchNorm_{n_convs}"],
                 bb[f"BatchNorm_{n_convs}"]) = _bn_pair(
                    sd, pre + "downsample.1.")
            p[name] = bp
            bs[name] = bb
            blk_idx += 1

    p["Dense_0"] = _dense(sd, "fc.")
    return {"params": p, "batch_stats": bs}
