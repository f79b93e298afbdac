"""Improved-Diffusion UNet for 32x32 mel-spectrograms, in flax.

TPU-native rebuild of
``Improved_Diffusion_Unconditional/improved_diffusion/unet.py:107-480``
with the audio repo's configuration (``script_util.py:11-126``):
in_channels=1, model_channels=128, channel_mult=(1,2,2,2), 3 res blocks per
level, QKV self-attention (4 heads) at downsample rates {2, 4}
(attention_resolutions "16,8" at image_size 32), scale-shift GroupNorm
conditioning, zero-init output convs.

Layout is NHWC; attention flattens spatial to a sequence and runs as two
MXU einsums with the reference's sqrt-sqrt scaling (``unet.py:233-252``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """OpenAI-convention sinusoidal embedding: [cos | sin]
    (ref ``nn.py`` timestep_embedding). timesteps: (B,)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn_groups(c: int) -> int:
    return 32 if c % 32 == 0 else max(
        g for g in range(1, min(32, c) + 1) if c % g == 0)


def _group_norm(x, dtype=None, name=None):
    # reference uses GroupNorm32 (32 groups, f32); for tiny test configs
    # fall back to the largest divisor of the channel count <= 32.
    # ``dtype`` is the RESULT dtype: flax always computes the mean/var in
    # f32 (GroupNorm32's contract), but with dtype=None the f32 params
    # promote a bf16 input to an f32 output, silently doubling the
    # bandwidth of every downstream SiLU/elementwise op under bf16
    # compute — so the model passes its compute dtype through.
    return nn.GroupNorm(num_groups=_gn_groups(x.shape[-1]), epsilon=1e-5,
                        dtype=dtype, name=name)(x)


class _GNParams(nn.Module):
    """Parameter-only stand-in for ``nn.GroupNorm`` (same scale/bias
    leaves) so the fused GN+conv kernel path keeps the IDENTICAL param
    tree — instantiate with the auto-name the XLA path would get
    (``GroupNorm_0``/``GroupNorm_1``)."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.features,)),
                self.param("bias", nn.initializers.zeros,
                           (self.features,)))


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv(features, (3, 3))``."""

    features: int
    in_features: int
    zeros: bool = False

    @nn.compact
    def __call__(self):
        kinit = nn.initializers.zeros if self.zeros \
            else nn.initializers.lecun_normal()
        return (self.param("kernel", kinit,
                           (3, 3, self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros,
                           (self.features,)))


def _conv3x3_mod(features, dtype, conv_impl, name, zeros=False):
    """3x3 SAME conv module: XLA ``nn.Conv`` or the fused pallas kernel
    (``kernels/unet_conv.PallasConv3x3`` — identical param tree, so
    checkpoints and the two impls interchange freely)."""
    kw = dict(kernel_init=nn.initializers.zeros,
              bias_init=nn.initializers.zeros) if zeros else {}
    if conv_impl in ("pallas", "pallas_fused"):
        from audiopure_tpu.kernels.unet_conv import PallasConv3x3
        return PallasConv3x3(features, dtype=dtype, name=name, **kw)
    return nn.Conv(features, (3, 3), padding=1, dtype=dtype, name=name,
                   **kw)


class ResBlock(nn.Module):
    """GroupNorm-SiLU-conv residual block with (scale, shift) timestep
    conditioning (ref ``unet.py:107-196``)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    dtype: Any = jnp.float32
    conv_impl: str = "xla"  # see _conv3x3_mod

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        in_ch = x.shape[-1]
        fused = self.conv_impl == "pallas_fused"
        if fused:
            from audiopure_tpu.kernels.unet_conv import conv3x3_gn

            dt = self.dtype
            gs0, gb0 = _GNParams(in_ch, name="GroupNorm_0")()
            k_in, b_in = _ConvParams(self.out_channels, in_ch,
                                     name="in_conv")()
            zB = jnp.zeros((x.shape[0], in_ch), dt)
            h = conv3x3_gn(x.astype(dt), k_in.astype(dt), b_in, gs0,
                           gb0, zB, zB, _gn_groups(in_ch), True)
        else:
            h = nn.silu(_group_norm(x, self.dtype))
            h = _conv3x3_mod(self.out_channels, self.dtype,
                             self.conv_impl, "in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels,
            dtype=self.dtype, name="emb_proj")(nn.silu(emb))

        if fused:
            # second conv's GN->(scale,shift)->SiLU prologue fuses too;
            # the train-time dropout between SiLU and conv forces the
            # unfused order (reference semantics), so fall back there
            from audiopure_tpu.kernels.unet_conv import (_gn_ref,
                                                         conv3x3,
                                                         conv3x3_gn)

            out_ch = self.out_channels
            gs1, gb1 = _GNParams(out_ch, name="GroupNorm_1")()
            k_out, b_out = _ConvParams(out_ch, out_ch, zeros=True,
                                       name="out_conv")()
            zO = jnp.zeros((x.shape[0], out_ch), dt)
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
            else:
                h = h + emb_out[:, None, None, :].astype(h.dtype)
                scale, shift = zO, zO
            if train and self.dropout > 0:
                y = _gn_ref(h, gs1, gb1, _gn_groups(out_ch))
                y = y * (1.0 + scale.astype(jnp.float32)[:, None, None,
                                                         :]) \
                    + shift.astype(jnp.float32)[:, None, None, :]
                y = nn.silu(y).astype(dt)
                y = nn.Dropout(self.dropout, deterministic=False)(y)
                h = conv3x3(y, k_out.astype(dt), b_out)
            else:
                h = conv3x3_gn(h, k_out.astype(dt), b_out, gs1, gb1,
                               scale.astype(dt), shift.astype(dt),
                               _gn_groups(out_ch), True)
        else:
            emb_out = emb_out[:, None, None, :]
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = _group_norm(h, self.dtype) * (1 + scale) + shift
                h = nn.silu(h)
            else:
                h = h + emb_out
                h = nn.silu(_group_norm(h, self.dtype))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = _conv3x3_mod(self.out_channels, self.dtype,
                             self.conv_impl, "out_conv", zeros=True)(h)

        if in_ch == self.out_channels:
            skip = x
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip_conv")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with sqrt-sqrt scaling and zero-init output
    projection (ref ``unet.py:200-276``)."""

    num_heads: int = 4
    dtype: Any = jnp.float32
    # 'xla' = einsum/softmax (reference math); 'pallas' = fused VMEM-
    # resident kernel (kernels/unet_attention.py), same params/layout,
    # XLA-recompute backward (grad_mode='full' and training unchanged)
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _group_norm(x, self.dtype).reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(h)
        if self.attn_impl == "pallas":
            from audiopure_tpu.kernels.unet_attention import \
                fused_qkv_attention
            a = fused_qkv_attention(qkv, self.num_heads)
        else:
            from audiopure_tpu.kernels.unet_attention import attention_ref
            a = attention_ref(qkv, self.num_heads)
        a = nn.Dense(C, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="proj_out")(a)
        return x + a.reshape(B, H, W, C)


class UNetModel(nn.Module):
    """``__call__(x, timesteps, y=None)`` with x ``(B, C, H, W)`` NCHW (the
    reference interface) and timesteps ``(B,)`` -> (B, out_channels, H, W)."""

    in_channels: int = 1
    model_channels: int = 128
    out_channels: int = 1
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (2, 4)  # downsample rates
    dropout: float = 0.3
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "xla"  # see AttentionBlock
    conv_impl: str = "xla"  # see _conv3x3_mod (stride-2 stays nn.Conv)

    @nn.compact
    def __call__(self, x, timesteps, y=None, train: bool = False):
        heads_up = self.num_heads if self.num_heads_upsample == -1 \
            else self.num_heads_upsample
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC

        time_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps.reshape(-1),
                                 self.model_channels)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_1")(emb)
        emb = nn.Dense(time_dim, dtype=self.dtype,
                       name="time_2")(nn.silu(emb))
        if self.num_classes is not None:
            assert y is not None
            emb = emb + nn.Embed(self.num_classes, time_dim,
                                 dtype=self.dtype, name="label_emb")(y)

        # -- encoder ---------------------------------------------------------
        h = _conv3x3_mod(self.model_channels, self.dtype,
                         self.conv_impl, "in_conv")(h)
        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(mult * self.model_channels, self.dropout,
                             self.use_scale_shift_norm, self.dtype,
                             conv_impl=self.conv_impl,
                             name=f"down_{level}_{i}")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.dtype,
                                       attn_impl=self.attn_impl,
                                       name=f"down_attn_{level}_{i}")(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                if self.conv_resample:
                    h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                                dtype=self.dtype,
                                name=f"downsample_{level}")(h)
                else:
                    h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                skips.append(h)
                ds *= 2

        # -- middle ------------------------------------------------------------
        ch = h.shape[-1]
        h = ResBlock(ch, self.dropout, self.use_scale_shift_norm,
                     self.dtype, conv_impl=self.conv_impl,
                     name="mid_res1")(h, emb, train)
        h = AttentionBlock(self.num_heads, self.dtype,
                           attn_impl=self.attn_impl, name="mid_attn")(h)
        h = ResBlock(ch, self.dropout, self.use_scale_shift_norm,
                     self.dtype, conv_impl=self.conv_impl,
                     name="mid_res2")(h, emb, train)

        # -- decoder -------------------------------------------------------------
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(mult * self.model_channels, self.dropout,
                             self.use_scale_shift_norm, self.dtype,
                             conv_impl=self.conv_impl,
                             name=f"up_{level}_{i}")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(heads_up, self.dtype,
                                       attn_impl=self.attn_impl,
                                       name=f"up_attn_{level}_{i}")(h)
                if level and i == self.num_res_blocks:
                    B, H, W, C = h.shape
                    # exact-2x nearest == repeat; broadcast+reshape lowers
                    # to pure data movement (jax.image.resize builds
                    # gather indices, which Mosaic/XLA won't always fold)
                    h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                         (B, H, 2, W, 2, C)).reshape(
                        B, 2 * H, 2 * W, C)
                    if self.conv_resample:
                        h = _conv3x3_mod(C, self.dtype, self.conv_impl,
                                         f"upsample_{level}")(h)
                    ds //= 2

        h = nn.silu(_group_norm(h, self.dtype))
        h = _conv3x3_mod(self.out_channels, self.dtype, self.conv_impl,
                         "out_conv", zeros=True)(h)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)  # NCHW


class SuperResUNet(UNetModel):
    """Super-resolution UNet: conditions on a bilinear-upsampled low-res
    image concatenated on the channel axis (ref ``unet.py:526-546``).

    ``__call__(x, timesteps, low_res=, y=)`` with x/low_res NCHW. The
    parameter tree is a plain :class:`UNetModel` tree whose ``in_conv``
    sees ``2 * in_channels`` input channels (flax infers fan-in), exactly
    like the reference's ``SuperResModel(in_channels * 2)``.
    """

    def __call__(self, x, timesteps, low_res=None, y=None,
                 train: bool = False):
        assert low_res is not None, "SuperResUNet requires low_res= kwarg"
        B, C, H, W = x.shape
        # torch F.interpolate(mode="bilinear", align_corners=False) and
        # jax.image.resize "bilinear" both use half-pixel centers
        up = jax.image.resize(low_res, (low_res.shape[0],
                                        low_res.shape[1], H, W),
                              "bilinear")
        x = jnp.concatenate([x, up.astype(x.dtype)], axis=1)
        return UNetModel.__call__(self, x, timesteps, y=y, train=train)


# Dense labels in the reference image pipeline (``script_util.py:8``)
NUM_CLASSES = 1000


def _image_channel_mult(image_size: int):
    """ref ``script_util.create_model:99-106`` / ``sr_create_model``."""
    if image_size == 256:
        return (1, 1, 2, 2, 4, 4)
    elif image_size == 64:
        return (1, 2, 3, 4)
    elif image_size == 32:
        return (1, 2, 2, 2)
    raise ValueError(f"unsupported image size: {image_size}")


def create_unet(image_size: int = 32, num_channels: int = 128,
                num_res_blocks: int = 3, learn_sigma: bool = False,
                class_cond: bool = False, attention_resolutions="16,8",
                num_heads: int = 4, num_heads_upsample: int = -1,
                use_scale_shift_norm: bool = True, dropout: float = 0.3,
                in_channels: int = 1, dtype=jnp.float32,
                attn_impl: str = "xla",
                conv_impl: str = "xla") -> UNetModel:
    """Mirror of ``script_util.create_model`` (``:87-126``).

    ``in_channels=1`` is the audio repo's mel configuration; the image
    CLIs pass 3 (RGB, ref default)."""
    channel_mult = _image_channel_mult(image_size)
    attention_ds = tuple(image_size // int(r)
                         for r in str(attention_resolutions).split(","))
    return UNetModel(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=(in_channels * 2 if learn_sigma else in_channels),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        num_classes=(NUM_CLASSES if class_cond else None),
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dtype=dtype,
        attn_impl=attn_impl,
        conv_impl=conv_impl,
    )


def create_sr_unet(large_size: int = 256, small_size: int = 64,
                   num_channels: int = 128, num_res_blocks: int = 3,
                   learn_sigma: bool = False, class_cond: bool = False,
                   attention_resolutions="16,8", num_heads: int = 4,
                   num_heads_upsample: int = -1,
                   use_scale_shift_norm: bool = True, dropout: float = 0.0,
                   dtype=jnp.float32) -> SuperResUNet:
    """Mirror of ``script_util.sr_create_model`` (``:188-228``): the
    channel layout follows ``large_size``; ``small_size`` only shapes the
    conditioning input (upsampled inside the model)."""
    del small_size  # conditioning resolution; no effect on parameters
    channel_mult = _image_channel_mult(large_size)
    attention_ds = tuple(large_size // int(r)
                         for r in str(attention_resolutions).split(","))
    return SuperResUNet(
        in_channels=3,
        model_channels=num_channels,
        out_channels=(6 if learn_sigma else 3),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        num_classes=(NUM_CLASSES if class_cond else None),
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dtype=dtype,
    )
