"""Fused 3x3 SAME conv for the UNet's NHWC images (pallas).

XLA's conv emitter measures ~66% of bf16 peak on the UNet's small
images (32x32..4x4, C=128..256 — docs/BENCH.md round-3d ablation); this
kernel restates the conv as the WaveNet-taps pattern in 2D: the input
is staged into VMEM as a zero-PADDED row-major flat image of stride
(W+2), where every (dy, dx) tap of the 3x3 window becomes ONE stride-1
slice of the flat buffer at offset dy*(W+2)+dx — nine sublane-shifted
slices feeding nine f32-accumulated MXU matmuls, weights resident.
Outputs are computed on the padded-width grid ((H, W+2) rows, ~6%
redundant columns) and the interior is sliced out on the way to HBM.

Reference op: ``improved_diffusion/unet.py`` ResBlock 3x3 convs (conv
math itself is torch ``nn.Conv2d(padding=1)``); parity is against
``lax.conv_general_dilated`` NHWC in tests/test_unet_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def conv3x3_pallas(x, w, b=None, *, tile_b: int = 0,
                   interpret=None):
    """NHWC 3x3 SAME conv: x (B, H, W, C) @ w (3, 3, C, Cout) + b.

    f32 accumulation, output in ``x.dtype``. ``tile_b=0`` picks the
    largest divisor of B with a <=64 MB resident estimate."""
    if interpret is None:
        # repo convention: the TPU platform here is named "axon"
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, W, C = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == C, (x.shape, w.shape)
    Cout = w.shape[-1]
    dtype = x.dtype
    Wp = W + 2
    rows_acc = H * Wp         # output rows on the padded-width grid
    # padded image needs (H+2)*Wp rows; the (dy=2, dx=2) tap slice ends
    # at 2*Wp+2 + rows_acc — two rows past it, kept zero
    S = rows_acc + 2 * Wp + 2

    if tile_b <= 0:
        itemsize = jnp.dtype(dtype).itemsize
        for cand in (64, 32, 16, 8, 4, 2, 1):
            mb = (cand * (S * C * itemsize + rows_acc * Cout * 4
                          + 2 * H * W * max(C, Cout) * itemsize)
                  ) / (1024 * 1024)
            if B % cand == 0 and mb <= 64.0:
                tile_b = cand
                break
    assert B % tile_b == 0, (B, tile_b)

    if b is None:
        b = jnp.zeros((Cout,), jnp.float32)

    def kernel(x_ref, w_ref, b_ref, out_ref, pbuf):
        # stage the zero-padded flat image: interior row r of image i
        # lives at flat rows [(r+1)*Wp+1, (r+1)*Wp+1+W)
        pbuf[:] = jnp.zeros((tile_b, S, C), dtype)
        for r in range(H):
            base = (r + 1) * Wp + 1
            pbuf[:, base: base + W] = x_ref[:, r]
        a = jnp.zeros((tile_b, rows_acc, Cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off = dy * Wp + dx
                tap = pbuf[:, off: off + rows_acc]
                a = a + jax.lax.dot_general(
                    tap, w_ref[dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        a = a + b_ref[:].astype(jnp.float32)[None, None, :]
        for r in range(H):
            out_ref[:, r] = a[:, r * Wp: r * Wp + W].astype(dtype)

    grid = (B // tile_b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, H, W, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, Cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((Cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((tile_b, H, W, Cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_b, S, C), dtype),               # padded flat
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=123 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w.astype(dtype), jnp.asarray(b, jnp.float32))
    return out


def _xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3(x, w, b):
    """Differentiable fused conv3x3: pallas forward, explicit
    conv-transpose backward (convs are linear — no recompute)."""
    return conv3x3_pallas(x, w, b)


def _c3_fwd(x, w, b):
    return conv3x3_pallas(x, w, b), (x, w)


def _c3_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    # dx: correlate the cotangent with the spatially-flipped,
    # in/out-transposed filter (SAME padding is self-transpose at 3x3)
    # — itself a 3x3 conv, so it rides the same pallas kernel
    dx = conv3x3_pallas(g, jnp.flip(w, (0, 1)).swapaxes(2, 3))
    # dw[dy,dx,ci,co] = sum_{b,i,j} x_pad[b,i+dy,j+dx,ci] g[b,i,j,co]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    dw = jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwo->co",
                       xp[:, dy: dy + H, dxx: dxx + W, :], g,
                       preferred_element_type=jnp.float32)
            for dxx in range(3)], axis=0)
        for dy in range(3)], axis=0).astype(w.dtype)
    db = g.astype(jnp.float32).sum(axis=(0, 1, 2))
    return dx, dw, db


conv3x3.defvjp(_c3_fwd, _c3_bwd)


import flax.linen as nn


class PallasConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), padding=1)`` routing
    through the fused kernel — IDENTICAL param tree (kernel (3,3,Ci,Co)
    lecun-normal + bias zeros, f32 params, ``dtype`` compute), so
    checkpoints interchange freely with the XLA conv path."""

    features: int
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        k = self.param("kernel", self.kernel_init,
                       (3, 3, C, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        dt = self.dtype or x.dtype
        if C < 8 or self.features < 8:
            # degenerate lane dims (the UNet's 1-channel stem/head):
            # negligible FLOPs, XLA handles them fine
            return _xla_conv3x3(x.astype(dt), k.astype(dt)) \
                + b.astype(dt)[None, None, None, :]
        return conv3x3(x.astype(dt), k.astype(dt), b.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("groups", "silu", "tile_b",
                                             "interpret"))
def conv3x3_gn_pallas(x, w, b, gn_scale, gn_bias, ss_scale, ss_shift, *,
                      groups: int, silu: bool = True, tile_b: int = 0,
                      interpret=None):
    """Fused ResBlock prologue + conv: GroupNorm(groups, eps 1e-5, f32)
    -> optional per-image (1+scale, shift) conditioning -> SiLU -> 3x3
    SAME conv, all inside one kernel (the normalized/activated tensor
    never round-trips HBM, and the conv reuses :func:`conv3x3_pallas`'s
    flat-tap matmuls).

    x (B, H, W, C); w (3, 3, C, Cout); b (Cout,); gn_scale/gn_bias (C,)
    — the nn.GroupNorm affine; ss_scale/ss_shift (B, C) — the
    scale-shift-norm conditioning (pass zeros for a plain GN).  Group
    statistics ride the MXU via a (C, groups) indicator matrix (no
    lane-dim reshapes).  Zero conv padding applies to the POST-norm
    tensor, exactly like padding the XLA composition's output.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, W, C = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == C, (x.shape, w.shape)
    assert C % groups == 0, (C, groups)
    Cout = w.shape[-1]
    dtype = x.dtype
    Wp = W + 2
    rows_acc = H * Wp
    S = rows_acc + 2 * Wp + 2

    if tile_b <= 0:
        itemsize = jnp.dtype(dtype).itemsize
        for cand in (64, 32, 16, 8, 4, 2, 1):
            mb = (cand * (S * C * itemsize + rows_acc * Cout * 4
                          + H * W * C * 4
                          + 2 * H * W * max(C, Cout) * itemsize)
                  ) / (1024 * 1024)
            if B % cand == 0 and mb <= 64.0:
                tile_b = cand
                break
    assert B % tile_b == 0, (B, tile_b)

    # group-indicator matrix: rides the MXU for per-group stats
    import numpy as _np
    m_np = _np.zeros((C, groups), _np.float32)
    cg = C // groups
    for g in range(groups):
        m_np[g * cg:(g + 1) * cg, g] = 1.0
    M = jnp.asarray(m_np)
    inv_n = 1.0 / (H * W * cg)

    def kernel(x_ref, w_ref, b_ref, gs_ref, gb_ref, ssc_ref, sss_ref,
               m_ref, out_ref, pbuf):
        xf = x_ref[:].astype(jnp.float32).reshape(tile_b, H * W, C)
        s1 = jnp.sum(xf, axis=1)                   # (tb, C)
        s2 = jnp.sum(xf * xf, axis=1)
        gs1 = jax.lax.dot_general(s1, m_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        gs2 = jax.lax.dot_general(s2, m_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mean_g = gs1 * inv_n
        var_g = gs2 * inv_n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + 1e-5)
        # broadcast group stats back to channels via M^T
        mean_c = jax.lax.dot_general(mean_g, m_ref[:],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        rstd_c = jax.lax.dot_general(rstd_g, m_ref[:],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        y = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]
        y = y * gs_ref[:].astype(jnp.float32)[None, None, :] \
            + gb_ref[:].astype(jnp.float32)[None, None, :]
        y = y * (1.0 + ssc_ref[:].astype(jnp.float32)[:, None, :]) \
            + sss_ref[:].astype(jnp.float32)[:, None, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        yl = y.astype(dtype)
        pbuf[:] = jnp.zeros((tile_b, S, C), dtype)
        for r in range(H):
            base = (r + 1) * Wp + 1
            pbuf[:, base: base + W] = yl[:, r * W: (r + 1) * W]
        a = jnp.zeros((tile_b, rows_acc, Cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off = dy * Wp + dx
                tap = pbuf[:, off: off + rows_acc]
                a = a + jax.lax.dot_general(
                    tap, w_ref[dy, dx], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        a = a + b_ref[:].astype(jnp.float32)[None, None, :]
        for r in range(H):
            out_ref[:, r] = a[:, r * Wp: r * Wp + W].astype(dtype)

    grid = (B // tile_b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, H, W, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, Cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((Cout,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((tile_b, C), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, C), lambda i: (i, 0)),
            pl.BlockSpec((C, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, H, W, Cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_b, S, C), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=123 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w.astype(dtype), jnp.asarray(b, jnp.float32),
      jnp.asarray(gn_scale, jnp.float32), jnp.asarray(gn_bias,
                                                      jnp.float32),
      jnp.asarray(ss_scale, jnp.float32), jnp.asarray(ss_shift,
                                                      jnp.float32),
      M)
    return out


def _gn_ref(x, gn_scale, gn_bias, groups):
    """f32 GroupNorm reference (GroupNorm32 contract)."""
    B, H, W, C = x.shape
    cg = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y.reshape(B, H, W, C)
    return y * gn_scale + gn_bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def conv3x3_gn(x, w, b, gn_scale, gn_bias, ss_scale, ss_shift,
               groups: int, silu: bool = True):
    """Differentiable fused GN(+scale-shift)+SiLU+conv3x3: pallas
    forward, XLA-recompute backward (the prologue is nonlinear, so the
    backward re-runs the XLA composition once — forward-dominant eval
    paths get the full fusion win)."""
    return conv3x3_gn_pallas(x, w, b, gn_scale, gn_bias, ss_scale,
                             ss_shift, groups=groups, silu=silu)


def _xla_gn_conv(x, w, b, gn_scale, gn_bias, ss_scale, ss_shift,
                 groups, silu):
    y = _gn_ref(x, gn_scale, gn_bias, groups)
    y = y * (1.0 + ss_scale.astype(jnp.float32)[:, None, None, :]) \
        + ss_shift.astype(jnp.float32)[:, None, None, :]
    if silu:
        y = jax.nn.silu(y)
    y = y.astype(x.dtype)
    return _xla_conv3x3(y, w.astype(x.dtype)) \
        + b.astype(jnp.float32)[None, None, None, :].astype(x.dtype)


def _cgn_fwd(x, w, b, gn_scale, gn_bias, ss_scale, ss_shift, groups,
             silu):
    out = conv3x3_gn_pallas(x, w, b, gn_scale, gn_bias, ss_scale,
                            ss_shift, groups=groups, silu=silu)
    return out, (x, w, b, gn_scale, gn_bias, ss_scale, ss_shift)


def _cgn_bwd(groups, silu, res, g):
    x, w, b, gn_scale, gn_bias, ss_scale, ss_shift = res
    _, vjp = jax.vjp(
        lambda *a: _xla_gn_conv(*a, groups, silu),
        x, w, b, gn_scale, gn_bias, ss_scale, ss_shift)
    return vjp(g.astype(x.dtype))


conv3x3_gn.defvjp(_cgn_fwd, _cgn_bwd)
