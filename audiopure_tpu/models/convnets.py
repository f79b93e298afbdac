"""Mel-spectrogram (1x32x32) image-classifier zoo in flax.

TPU-native rebuild of the reference's CIFAR-style model zoo
(``audio_models/ConvNets_SpeechCommands/models/``): VGG19-BN
(``vgg.py:31-89``), torchvision-style ResNet-18/34/50/101/152
(``resnet.py:103-161``), WideResNet-28-10/28-10D/52-10
(``wideresnet.py:16-95``), CifarResNeXt-29 8x64d (``resnext.py:23-120``),
DPN-92 (``dpn.py:16-100``), DenseNet-BC-{100-12, 250-24, 190-40}
(``densenet.py:17-120``).

All modules take the reference's NCHW ``(B, 1, 32, 32)`` mel "image" and use
NHWC internally (TPU-native conv layout). BatchNorm follows torch semantics
(momentum 0.1 -> flax momentum 0.9, eps 1e-5); ``train=True`` returns
``(logits, batch_stats_updates)`` via flax mutable collections at the caller.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _bn(train: bool, dtype=jnp.float32, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _avg_pool(x, window: int):
    return nn.avg_pool(x, (window, window), strides=(window, window))


def _max_pool(x, window: int, stride: int, padding="VALID"):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


class _NCHW(nn.Module):
    """Mixin providing NCHW<->NHWC adaptation at the public boundary."""

    def adapt_in(self, x):
        return jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC


# ---------------------------------------------------------------------------
# VGG
# ---------------------------------------------------------------------------

_VGG_CFG = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
          512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
          "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(_NCHW, nn.Module):
    """VGG with optional BN; 32x32 input -> 1x1x512 -> 3-layer MLP head."""

    cfg_key: str = "E"
    batch_norm: bool = True
    num_classes: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.adapt_in(x)
        for v in _VGG_CFG[self.cfg_key]:
            if v == "M":
                h = _max_pool(h, 2, 2)
            else:
                h = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype)(h)
                if self.batch_norm:
                    h = _bn(train, self.dtype)(h)
                h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(4096, dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Dense(4096, dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# ResNet (torchvision ImageNet-style stem, as the reference uses on 32x32)
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype)(x)
            residual = _bn(train, self.dtype)(residual)
        return nn.relu(h + residual)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype)(x)
            residual = _bn(train, self.dtype)(residual)
        return nn.relu(h + residual)


class ResNet(_NCHW, nn.Module):
    block: Any = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.adapt_in(x)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = _max_pool(h, 3, 2, padding=((1, 1), (1, 1)))

        inplanes = 64
        for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                s = stride if j == 0 else 1
                down = (j == 0 and
                        (s != 1 or inplanes != planes * self.block.expansion))
                h = self.block(planes, s, down, self.dtype)(h, train)
                inplanes = planes * self.block.expansion
        h = h.mean(axis=(1, 2))  # adaptive: ref uses AvgPool2d(1) on 1x1
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# WideResNet
# ---------------------------------------------------------------------------

class WRNBlock(nn.Module):
    out_planes: int
    stride: int
    drop_rate: float = 0.0
    equal_in_out: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pre = nn.relu(_bn(train, self.dtype)(x))
        src = x if self.equal_in_out else pre
        h = nn.Conv(self.out_planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(pre)
        h = nn.relu(_bn(train, self.dtype)(h))
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        h = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        if self.equal_in_out:
            shortcut = src
        else:
            shortcut = nn.Conv(self.out_planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype)(src)
        return h + shortcut


class WideResNet(_NCHW, nn.Module):
    depth: int = 28
    widen_factor: int = 10
    drop_rate: float = 0.0
    num_classes: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen_factor, 32 * self.widen_factor,
                  64 * self.widen_factor]
        h = self.adapt_in(x)
        h = nn.Conv(widths[0], (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        in_planes = widths[0]
        for stage, (w, stride) in enumerate(
                zip(widths[1:], (1, 2, 2))):
            for j in range(n):
                s = stride if j == 0 else 1
                h = WRNBlock(w, s, self.drop_rate,
                             equal_in_out=(in_planes == w and s == 1),
                             dtype=self.dtype)(h, train)
                in_planes = w
        h = nn.relu(_bn(train, self.dtype)(h))
        h = h.mean(axis=(1, 2))  # ref: avg_pool2d(out, 8) on 8x8
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# ResNeXt (CIFAR, bottleneck type C)
# ---------------------------------------------------------------------------

class ResNeXtBottleneck(nn.Module):
    out_channels: int
    stride: int
    cardinality: int = 8
    base_width: int = 64
    widen_factor: int = 4
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width_ratio = self.out_channels / (self.widen_factor * 64.0)
        D = self.cardinality * int(self.base_width * width_ratio)
        h = nn.Conv(D, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(D, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.cardinality, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        if self.project:
            sc = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                         use_bias=False, dtype=self.dtype)(x)
            sc = _bn(train, self.dtype)(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class CifarResNeXt(_NCHW, nn.Module):
    num_classes: int = 10
    cardinality: int = 8
    depth: int = 29
    base_width: int = 64
    widen_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_depth = (self.depth - 2) // 9
        stages = [64, 64 * self.widen_factor, 128 * self.widen_factor,
                  256 * self.widen_factor]
        h = self.adapt_in(x)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_bn(train, self.dtype)(h))
        in_ch = stages[0]
        for stage, (out_ch, stride) in enumerate(
                zip(stages[1:], (1, 2, 2))):
            for j in range(block_depth):
                s = stride if j == 0 else 1
                h = ResNeXtBottleneck(
                    out_ch, s, self.cardinality, self.base_width,
                    self.widen_factor, project=(in_ch != out_ch),
                    dtype=self.dtype)(h, train)
                in_ch = out_ch
        h = h.mean(axis=(1, 2))  # ref: avg_pool2d(out, 8)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# DPN (dual-path network)
# ---------------------------------------------------------------------------

class DPNBottleneck(nn.Module):
    in_planes: int
    out_planes: int
    dense_depth: int
    stride: int
    first_layer: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.in_planes, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(self.in_planes, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=32, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = nn.Conv(self.out_planes + self.dense_depth, (1, 1),
                    use_bias=False, dtype=self.dtype)(h)
        h = _bn(train, self.dtype)(h)
        if self.first_layer:
            sc = nn.Conv(self.out_planes + self.dense_depth, (1, 1),
                         strides=self.stride, use_bias=False,
                         dtype=self.dtype)(x)
            sc = _bn(train, self.dtype)(sc)
        else:
            sc = x
        d = self.out_planes
        out = jnp.concatenate(
            [sc[..., :d] + h[..., :d], sc[..., d:], h[..., d:]], axis=-1)
        return nn.relu(out)


class DPN(_NCHW, nn.Module):
    num_classes: int = 10
    in_planes: Tuple[int, ...] = (96, 192, 384, 768)
    out_planes: Tuple[int, ...] = (256, 512, 1024, 2048)
    num_blocks: Tuple[int, ...] = (3, 4, 20, 3)
    dense_depth: Tuple[int, ...] = (16, 32, 24, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.adapt_in(x)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_bn(train, self.dtype)(h))
        for i in range(4):
            stride0 = 1 if i == 0 else 2
            for j in range(self.num_blocks[i]):
                h = DPNBottleneck(
                    self.in_planes[i], self.out_planes[i],
                    self.dense_depth[i],
                    stride0 if j == 0 else 1, first_layer=(j == 0),
                    dtype=self.dtype)(h, train)
        h = _avg_pool(h, h.shape[1])  # ref: avg_pool2d(out, 4) on 4x4
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# DenseNet-BC
# ---------------------------------------------------------------------------

class DenseNet(_NCHW, nn.Module):
    depth: int = 100
    growth_rate: int = 12
    compression_rate: int = 2
    num_classes: int = 10
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.depth - 4) % 3 == 0
        n = (self.depth - 4) // 3 // 2  # bottleneck: half the layers

        def dense_layer(h, train):
            inp = h
            g = nn.relu(_bn(train, self.dtype)(h))
            g = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False,
                        dtype=self.dtype)(g)
            g = nn.relu(_bn(train, self.dtype)(g))
            g = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(g)
            if self.drop_rate > 0:
                g = nn.Dropout(self.drop_rate, deterministic=not train)(g)
            return jnp.concatenate([inp, g], axis=-1)

        def transition(h, train):
            out_ch = h.shape[-1] // self.compression_rate
            h = nn.relu(_bn(train, self.dtype)(h))
            h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
            return _avg_pool(h, 2)

        h = self.adapt_in(x)
        h = nn.Conv(self.growth_rate * 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        for block in range(3):
            for _ in range(n):
                h = dense_layer(h, train)
            if block < 2:
                h = transition(h, train)
        h = nn.relu(_bn(train, self.dtype)(h))
        h = h.mean(axis=(1, 2))  # ref: AvgPool2d(8)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def create_model(model_name: str, num_classes: int = 10,
                 in_channels: int = 1, dtype=jnp.float32):
    """Mirror of the reference registry
    (``ConvNets_SpeechCommands/models/__init__.py:17-46``).
    ``in_channels`` is accepted for interface parity (flax infers it)."""
    del in_channels
    name = model_name.lower()
    if name == "vgg19_bn":
        return VGG(cfg_key="E", batch_norm=True, num_classes=num_classes,
                   dtype=dtype)
    if name == "resnet18":
        return ResNet(BasicBlock, (2, 2, 2, 2), num_classes, dtype)
    if name == "resnet34":
        return ResNet(BasicBlock, (3, 4, 6, 3), num_classes, dtype)
    if name == "resnet50":
        return ResNet(BottleneckBlock, (3, 4, 6, 3), num_classes, dtype)
    if name == "resnet101":
        return ResNet(BottleneckBlock, (3, 4, 23, 3), num_classes, dtype)
    if name == "resnet152":
        return ResNet(BottleneckBlock, (3, 8, 36, 3), num_classes, dtype)
    if name == "wideresnet28_10":
        return WideResNet(28, 10, 0.0, num_classes, dtype)
    if name == "wideresnet28_10d":
        return WideResNet(28, 10, 0.3, num_classes, dtype)
    if name == "wideresnet52_10":
        return WideResNet(52, 10, 0.0, num_classes, dtype)
    if name == "resnext29_8_64":
        return CifarResNeXt(num_classes=num_classes, dtype=dtype)
    if name == "dpn92":
        return DPN(num_classes=num_classes, dtype=dtype)
    if name == "densenet_bc_100_12":
        return DenseNet(100, 12, 2, num_classes, dtype=dtype)
    if name == "densenet_bc_250_24":
        return DenseNet(250, 24, 2, num_classes, dtype=dtype)
    if name == "densenet_bc_190_40":
        return DenseNet(190, 40, 2, num_classes, dtype=dtype)
    raise ValueError(f"unknown model: {model_name}")
