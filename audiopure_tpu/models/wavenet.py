"""DiffWave WaveNet epsilon-network in flax.

TPU-native redesign of the reference score net
(``diffusion_models/DiffWave_Unconditional/WaveNet.py:23-172``): an initial
1x1 conv + ReLU, ``num_res_layers`` gated dilated-conv residual blocks with
per-block FiLM-style timestep conditioning, skip-sum, and a final
conv -> ReLU -> zero-init conv head.

TPU-first choices:

* Internal layout is NWC ``(B, L, C)``: length maps to MXU rows, channels to
  lanes, so the k=3 dilated convs (256 -> 512 ch) tile directly onto the MXU.
  The public API still takes the reference's ``(B, 1, L)``.
* Weight normalization is *fused*: the reference trains with
  ``nn.utils.weight_norm`` (``WaveNet.py:28,67,72``) which at inference is an
  ordinary conv with ``w = g * v/||v||``; we parametrize the fused weight
  directly, and the checkpoint converter folds ``weight_g/weight_v`` on
  import (see ``utils/torch_convert.py``).
* The whole net is a single traced function — no Python control flow — so the
  reverse-diffusion ``lax.scan`` holds one compiled step for every t.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from audiopure_tpu.diffusion.schedule import diffusion_step_embedding


def swish(x):
    return x * nn.sigmoid(x)


class DilatedConvMM(nn.Module):
    """k=3 dilated conv as three shifted matmuls.

    On TPU a (B, L, 256) x (256, 512) dot per tap maps straight onto the MXU
    with no im2col materialization; XLA fuses the three taps' adds. Shares
    the parameter layout of ``nn.Conv`` (kernel (3, C_in, C_out)) so
    checkpoints interchange with the XLA-conv path.
    """

    features: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1),
                                         out_axis=2),
            (3, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        d = self.dilation
        L = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (d, d), (0, 0))).astype(self.dtype)
        k = kernel.astype(self.dtype)
        y = (xp[:, :L] @ k[0] + xp[:, d: d + L] @ k[1]
             + xp[:, 2 * d: 2 * d + L] @ k[2])
        return y + bias.astype(self.dtype)


def _maybe_wn(layer: nn.Module, enable: bool) -> nn.Module:
    """Torch-style weight normalization (per-out-channel, reference trains
    every Conv this way, ``WaveNet.py:28,67,72``). Fuse for inference with
    :func:`fuse_weight_norm_params`."""
    if not enable:
        return layer
    return nn.WeightNorm(layer, name=f"{layer.name}_wn")


class ResidualBlock(nn.Module):
    """Gated dilated-conv residual block (reference ``WaveNet.py:53-97``)."""

    res_channels: int
    skip_channels: int
    dilation: int
    dtype: Any = jnp.float32
    conv_impl: str = "xla"  # {'xla', 'matmul'}
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x, t_embed):
        # x: (B, L, C_res); t_embed: (B, D_out)
        part_t = nn.Dense(self.res_channels, name="fc_t",
                          dtype=self.dtype)(t_embed)
        # NOTE: the reference's ``h = x; h += part_t`` mutates x in place
        # (``WaveNet.py:78-84``), so its residual connection at :97 adds
        # the *biased* x — reproduced below (caught by the reference-golden
        # suite; the bias also rides the residual here).
        h = x + part_t[:, None, :]

        if self.conv_impl == "matmul":
            h = DilatedConvMM(2 * self.res_channels, self.dilation,
                              self.dtype, name="dilated_conv")(h)
        else:
            h = _maybe_wn(nn.Conv(
                features=2 * self.res_channels,
                kernel_size=(3,),
                kernel_dilation=(self.dilation,),
                padding="SAME",
                name="dilated_conv",
                dtype=self.dtype,
            ), self.weight_norm)(h)

        # named for the selective remat policy (remat='gates'): saving
        # exactly these two (B, L, C) tensors lets the backward rebuild
        # gate (their product), tanh' = 1-t^2 and sigmoid' = s(1-s)
        # without re-running ANY forward matmul — the block's only other
        # backward dependencies are the boundary x (saved by remat) and
        # elementwise recomputes
        tpart = checkpoint_name(jnp.tanh(h[..., : self.res_channels]),
                                "wavenet_gate_tanh")
        spart = checkpoint_name(nn.sigmoid(h[..., self.res_channels:]),
                                "wavenet_gate_sig")
        gate = tpart * spart

        res = _maybe_wn(nn.Conv(self.res_channels, (1,), name="res_conv",
                                dtype=self.dtype), self.weight_norm)(gate)
        skip = _maybe_wn(nn.Conv(self.skip_channels, (1,), name="skip_conv",
                                 dtype=self.dtype), self.weight_norm)(gate)
        return (x + part_t[:, None, :] + res) * math.sqrt(0.5), skip


class WaveNet(nn.Module):
    """DiffWave epsilon-predictor.

    ``__call__(audio, diffusion_steps)`` with audio ``(B, 1, L)`` and steps
    ``(B, 1)`` returns epsilon_theta of shape ``(B, 1, L)`` — the same
    contract as ``WaveNet_Speech_Commands.forward`` (``WaveNet.py:164-172``).
    """

    in_channels: int = 1
    res_channels: int = 256
    skip_channels: int = 256
    out_channels: int = 1
    num_res_layers: int = 36
    dilation_cycle: int = 12
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512
    dtype: Any = jnp.float32
    conv_impl: str = "xla"  # {'xla', 'matmul'} — same params either way
    weight_norm: bool = False  # torch-style WN for training parity
    # per-block gradient checkpointing: without it the full 36x256 train
    # step stores every block's (B, L, 2C) activations and OOMs at
    # batch 16 on one v5e (measured 17.5G of 15.75G HBM).
    #   True / 'block': keep only block-boundary states (~4.7G) for
    #     ~4/3 the forward FLOPs (the dilated conv re-runs on backward);
    #   'gates': additionally save the two named gate-transcendental
    #     tensors per block (~9.4G at batch 16) — the backward then
    #     recomputes only elementwise ops, NO forward matmuls, trading
    #     half the no-remat residency for none of 'block's recompute.
    remat: Any = False

    @nn.compact
    def __call__(self, audio: jnp.ndarray,
                 diffusion_steps: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(audio, 1, 2)  # (B, 1, L) -> (B, L, 1) NWC

        # timestep embedding: sinusoidal -> 2 swish MLP layers
        emb = diffusion_step_embedding(
            diffusion_steps, self.diffusion_step_embed_dim_in
        ).astype(self.dtype)
        emb = swish(nn.Dense(self.diffusion_step_embed_dim_mid,
                             name="fc_t1", dtype=self.dtype)(emb))
        emb = swish(nn.Dense(self.diffusion_step_embed_dim_out,
                             name="fc_t2", dtype=self.dtype)(emb))

        # init conv1x1 + relu
        h = _maybe_wn(nn.Conv(self.res_channels, (1,), name="init_conv",
                              dtype=self.dtype), self.weight_norm)(x)
        h = nn.relu(h)

        if self.remat == "gates":
            block_cls = nn.remat(
                ResidualBlock,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "wavenet_gate_tanh", "wavenet_gate_sig"))
        elif self.remat:
            block_cls = nn.remat(ResidualBlock)
        else:
            block_cls = ResidualBlock
        skip_sum = 0.0
        for n in range(self.num_res_layers):
            h, skip = block_cls(
                res_channels=self.res_channels,
                skip_channels=self.skip_channels,
                dilation=2 ** (n % self.dilation_cycle),
                name=f"res_block_{n}",
                dtype=self.dtype,
                conv_impl=self.conv_impl,
                weight_norm=self.weight_norm,
            )(h, emb)
            skip_sum = skip_sum + skip
        h = skip_sum * math.sqrt(1.0 / self.num_res_layers)

        # final conv1x1 -> relu -> zero-init conv1x1 (ZeroConv is not
        # weight-normalized in the reference)
        h = nn.relu(_maybe_wn(
            nn.Conv(self.skip_channels, (1,), name="final_conv1",
                    dtype=self.dtype), self.weight_norm)(h))
        h = nn.Conv(self.out_channels, (1,), name="final_conv2",
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype)(h)

        return jnp.swapaxes(h, 1, 2)  # (B, L, C_out) -> (B, C_out, L)


def make_wavenet(cfg) -> WaveNet:
    """Build from a ``WaveNetConfig`` (see ``config.py``)."""
    return WaveNet(
        in_channels=cfg.in_channels,
        res_channels=cfg.res_channels,
        skip_channels=cfg.skip_channels,
        out_channels=cfg.out_channels,
        num_res_layers=cfg.num_res_layers,
        dilation_cycle=cfg.dilation_cycle,
        diffusion_step_embed_dim_in=cfg.diffusion_step_embed_dim_in,
        diffusion_step_embed_dim_mid=cfg.diffusion_step_embed_dim_mid,
        diffusion_step_embed_dim_out=cfg.diffusion_step_embed_dim_out,
    )


def fuse_weight_norm_params(params):
    """Fold ``nn.WeightNorm`` scales into the wrapped conv kernels so a
    weight-norm-trained tree loads into the plain (inference/pallas) model.

    Equivalent to the torch export convention fused by
    ``utils/torch_convert.fuse_weight_norm``.
    """
    import jax.numpy as jnp

    def fuse(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        wn_keys = [k for k in tree if k.endswith("_wn")]
        for k, v in tree.items():
            if k.endswith("_wn"):
                continue
            out[k] = fuse(v)
        for wk in wn_keys:
            for scale_path, scale in tree[wk].items():
                layer = scale_path.split("/")[0]
                kernel = out[layer]["kernel"]
                axes = tuple(range(kernel.ndim - 1))
                norm = jnp.sqrt((kernel ** 2).sum(axis=axes, keepdims=True))
                out[layer] = dict(out[layer])
                out[layer]["kernel"] = scale * kernel / norm
        return out

    return {"params": fuse(params["params"]), **{
        k: v for k, v in params.items() if k != "params"}}
