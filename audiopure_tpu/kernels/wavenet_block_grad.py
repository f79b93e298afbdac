"""Differentiable fused WaveNet block: pallas forward + recompute backward.

The flagship attack path (``grad_mode='ref'``) never differentiates the
eps-net, so the fused kernel is forward-only there.  The *stronger*
adaptive attack (``grad_mode='full'``) and training do need gradients —
this module gives the fused block a ``jax.custom_vjp``:

* forward  — the pad-free bias-fused pallas kernel (v3), saving only the
  block *inputs* (O(L*C) per layer, same as ``jax.checkpoint``);
* backward — recomputes the gate in-place and back-propagates with
  shifted matmuls (the transposed dilated conv is three shifted dots, no
  conv_transpose), all MXU-friendly XLA.

So ``grad_mode='full'`` keeps the pallas forward speed; the backward
costs ~2.3x a forward (recompute + transposes), the same order as XLA
autodiff of the conv path, but off the slower conv kernels.

Numerical contract: identical params/semantics as
``models.wavenet.WaveNet`` — reference in-place quirk included (the
residual adds the *biased* x, ref ``WaveNet.py:78-97``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

SQRT_HALF = math.sqrt(0.5)


def _shift(a: jnp.ndarray, offset: int) -> jnp.ndarray:
    """a[:, i + offset, :] with zero padding out of range (axis 1)."""
    if offset == 0:
        return a
    L = a.shape[1]
    if offset > 0:
        pad = jnp.zeros_like(a[:, :offset])
        return jnp.concatenate([a[:, offset:], pad], axis=1)
    pad = jnp.zeros_like(a[:, :(-offset)])
    return jnp.concatenate([pad, a[:, :offset]], axis=1)


def _block_math(xb, wd, bd, wres, bres, wskip, bskip, dilation):
    """XLA reference math of the fused block on the biased input xb."""
    d = dilation
    h = (_shift(xb, -d) @ wd[0] + xb @ wd[1] + _shift(xb, d) @ wd[2]) + bd
    C = wres.shape[0]
    t, s = jnp.tanh(h[..., :C]), jax.nn.sigmoid(h[..., C:])
    gate = t * s
    x_next = (xb + gate @ wres + bres) * SQRT_HALF
    skip = gate @ wskip + bskip
    return h, t, s, gate, x_next, skip


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_block_grad(x, t_bias, wd, bd, wres, bres, wskip, bskip, skip_acc,
                     dilation: int, tile_l: int = 1600):
    """(x_next, skip_acc + skip) with full gradients; pallas forward."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_block_v3

    interpret = jax.default_backend() not in ("tpu", "axon")
    return fused_residual_block_v3(x, t_bias, wd, bd, wres, bres, wskip,
                                   bskip, skip_acc, dilation=dilation,
                                   tile_l=tile_l, interpret=interpret)


def _fwd(x, t_bias, wd, bd, wres, bres, wskip, bskip, skip_acc,
         dilation, tile_l):
    out = fused_block_grad(x, t_bias, wd, bd, wres, bres, wskip, bskip,
                           skip_acc, dilation, tile_l)
    return out, (x, t_bias, wd, bd, wres, bres, wskip, bskip)


def _bwd(dilation, tile_l, res, cts):
    x, t_bias, wd, bd, wres, bres, wskip, bskip = res
    g_xn, g_skip_out = cts
    d = dilation

    xb = x + t_bias[:, None, :]
    h, t, s, gate, _, _ = _block_math(xb, wd, bd, wres, bres, wskip, bskip,
                                      d)

    # skip accumulator passes its cotangent through unchanged
    g_skip_acc = g_skip_out
    g_res_in = g_xn * SQRT_HALF            # cotangent into (xb + gate@wres)
    g_gate = (g_res_in @ wres.T + g_skip_out @ wskip.T)
    g_h1 = g_gate * (1.0 - t * t) * s
    g_h2 = g_gate * t * s * (1.0 - s)
    g_h = jnp.concatenate([g_h1, g_h2], axis=-1)

    # transposed dilated conv: g_xb[i] += sum_k g_h[i - (k-1)d] wd[k]^T
    g_xb = (_shift(g_h @ wd[0].T, d) + g_h @ wd[1].T
            + _shift(g_h @ wd[2].T, -d))
    g_xb = g_xb + g_res_in                 # biased residual path

    g_x = g_xb
    g_t_bias = jnp.sum(g_xb, axis=1)

    # weight/bias grads (contract over batch and length)
    taps = jnp.stack([_shift(xb, -d), xb, _shift(xb, d)])  # (3, B, L, C)
    g_wd = jnp.einsum("kblc,blo->kco", taps, g_h)
    g_bd = jnp.sum(g_h, axis=(0, 1))
    g_wres = jnp.einsum("blc,blo->co", gate, g_res_in)
    g_bres = jnp.sum(g_res_in, axis=(0, 1))
    g_wskip = jnp.einsum("blc,blo->co", gate, g_skip_out)
    g_bskip = jnp.sum(g_skip_out, axis=(0, 1))

    return (g_x, g_t_bias, g_wd, g_bd, g_wres, g_bres, g_wskip, g_bskip,
            g_skip_acc)


fused_block_grad.defvjp(_fwd, _bwd)


def wavenet_forward_pallas_grad(params, audio, diffusion_steps, *,
                                num_res_layers: int = 36,
                                dilation_cycle: int = 12,
                                embed_dim_in: int = 128,
                                dtype=jnp.bfloat16,
                                tile_l: int = 1600) -> jnp.ndarray:
    """Differentiable full WaveNet forward on the fused pallas blocks.

    Same param tree / same outputs as ``wavenet_forward_pallas``, but
    usable under ``jax.grad`` (grad_mode='full', training)."""
    from audiopure_tpu.diffusion.schedule import diffusion_step_embedding

    p = params["params"]
    x = jnp.swapaxes(audio, 1, 2).astype(dtype)

    emb = diffusion_step_embedding(diffusion_steps, embed_dim_in)
    emb = emb @ p["fc_t1"]["kernel"] + p["fc_t1"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    emb = emb @ p["fc_t2"]["kernel"] + p["fc_t2"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)

    h = jax.nn.relu(
        jnp.einsum("blc,kco->blo", x, p["init_conv"]["kernel"].astype(dtype))
        + p["init_conv"]["bias"].astype(dtype))

    skip_ch = p["res_block_0"]["skip_conv"]["kernel"].shape[-1]
    skip_sum = jnp.zeros((x.shape[0], x.shape[1], skip_ch), dtype=dtype)
    for n in range(num_res_layers):
        bp = p[f"res_block_{n}"]
        t_bias = (emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]).astype(
            dtype)
        h, skip_sum = fused_block_grad(
            h, t_bias,
            bp["dilated_conv"]["kernel"].astype(dtype),
            bp["dilated_conv"]["bias"].astype(dtype),
            bp["res_conv"]["kernel"][0].astype(dtype),
            bp["res_conv"]["bias"].astype(dtype),
            bp["skip_conv"]["kernel"][0].astype(dtype),
            bp["skip_conv"]["bias"].astype(dtype),
            skip_sum, 2 ** (n % dilation_cycle), tile_l)

    out = skip_sum.astype(jnp.float32) * math.sqrt(1.0 / num_res_layers)
    out = jax.nn.relu(
        jnp.einsum("blc,kco->blo", out, p["final_conv1"]["kernel"])
        + p["final_conv1"]["bias"])
    out = (jnp.einsum("blc,kco->blo", out, p["final_conv2"]["kernel"])
           + p["final_conv2"]["bias"])
    return jnp.swapaxes(out, 1, 2)
