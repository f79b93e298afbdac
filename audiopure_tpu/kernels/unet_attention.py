"""Fused QKV self-attention for the Improved-Diffusion UNet.

The reference computes spatial attention (``improved_diffusion/unet.py:233-258``,
``QKVAttention``) as einsum -> f32 softmax -> einsum. On TPU, XLA
materializes the (B, heads, T, T) score tensor in f32 through a
multi-pass softmax; at the UNet's tiny sequence lengths (T = 256/64/16
for the 32x32 mel config) that HBM round-trip dominates the block —
an ablation attributes ~17% of the whole UNet forward to attention
whose FLOP share is ~3% (docs/BENCH.md round-3d).

This kernel keeps one batch row's q/k/v and the per-head (T, T) score
matrix VMEM-resident: one HBM read of qkv, one write of the output,
softmax in-register in f32 (the reference's precision), heads unrolled
as a static loop. Gradients: ``jax.custom_vjp`` whose backward
recomputes the pure-XLA reference math — attention here is cheap
enough that recompute beats saving the (T, T) weights.

Numerics match the XLA path at the bf16-rounding level: scores and
softmax accumulate in f32 in both; the f32->dtype cast before the
value matmul is the same cast the reference applies
(``th.softmax(weight.float(), dim=-1).type(weight.dtype)``).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_ref(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Pure-XLA reference: qkv (B, T, 3C) interleaved per head
    ([q_h | k_h | v_h] blocks, the layout of one Dense(3C) applied after
    ``reshape(B, T, H, 3ch)`` + split), returns (B, T, C)."""
    B, T, C3 = qkv.shape
    C = C3 // 3
    ch = C // num_heads
    q, k, v = jnp.split(qkv.reshape(B, T, num_heads, 3 * ch), 3, axis=-1)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, T, C)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_attention_kernel(qkv, num_heads: int, interpret: bool = False):
    B, T, C3 = qkv.shape
    assert C3 % 3 == 0, C3
    C = C3 // 3
    assert C % num_heads == 0, (C, num_heads)
    ch = C // num_heads
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    dtype = qkv.dtype

    def kernel(qkv_ref, out_ref):
        for h in range(num_heads):
            base = h * 3 * ch
            q = qkv_ref[0, :, base: base + ch] * scale
            k = qkv_ref[0, :, base + ch: base + 2 * ch] * scale
            v = qkv_ref[0, :, base + 2 * ch: base + 3 * ch]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            z = jnp.sum(p, axis=1, keepdims=True)
            w = (p / z).astype(dtype)
            out_ref[0, :, h * ch: (h + 1) * ch] = jax.lax.dot_general(
                w, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, C3), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qkv)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_attention_kernel_split(qkv, num_heads: int,
                                  interpret: bool = False):
    """Layout variant: split q/k/v into (B, H, T, ch) arrays in XLA
    (cheap fused transpose) and grid over (B, H) — the kernel body then
    indexes only leading dims, avoiding the interleaved variant's
    sub-tile lane slicing at ch=64 granularity."""
    B, T, C3 = qkv.shape
    assert C3 % 3 == 0, C3
    C = C3 // 3
    assert C % num_heads == 0, (C, num_heads)
    ch = C // num_heads
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    dtype = qkv.dtype
    qkvh = qkv.reshape(B, T, num_heads, 3 * ch).transpose(0, 2, 1, 3)
    q, k, v = jnp.split(qkvh, 3, axis=-1)  # each (B, H, T, ch)

    def kernel(q_ref, k_ref, v_ref, out_ref):
        s = jax.lax.dot_general(
            q_ref[0, 0] * scale, k_ref[0, 0] * scale,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        z = jnp.sum(p, axis=1, keepdims=True)
        w = (p / z).astype(dtype)
        out_ref[0, 0] = jax.lax.dot_general(
            w, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    spec = pl.BlockSpec((1, 1, T, ch), lambda b, h: (b, h, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(B, num_heads),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, num_heads, T, ch), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(B, T, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv, num_heads: int, interpret=None):
    """Fused scores->softmax->apply; same contract as :func:`attention_ref`.

    Differentiable w.r.t. ``qkv`` (backward = XLA recompute), so both
    ``grad_mode='ref'`` (never calls the backward) and ``'full'``
    (DiffSpec adaptive attacks, UNet training) work unchanged.
    ``interpret=None`` auto-selects interpret mode off-TPU so
    ``attn_impl='pallas'`` models still run in CPU tests."""
    return _fused_attention_fwd(qkv, num_heads, interpret)


def _fused_attention_fwd(qkv, num_heads: int, interpret=None):
    if interpret is None:
        # "axon" is this container's TPU plugin platform name (CLAUDE.md)
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _fused_attention_kernel(qkv, num_heads, interpret)


def _fqa_fwd(qkv, num_heads, interpret):
    return _fused_attention_fwd(qkv, num_heads, interpret), qkv


def _fqa_bwd(num_heads, interpret, qkv, g):
    _, vjp = jax.vjp(lambda a: attention_ref(a, num_heads), qkv)
    return (vjp(g)[0],)


fused_qkv_attention.defvjp(_fqa_fwd, _fqa_bwd)
