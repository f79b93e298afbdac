"""Pallas TPU kernel: fused WaveNet gated residual block.

The hot op of the whole framework (SURVEY.md §3.1: wall-clock is
``max_iter x eot x steps`` WaveNet forwards). One XLA layer does
  dilated conv (k=3) -> gated tanh*sigmoid -> res 1x1 -> skip 1x1
with the (L, 2C) pre-activation and the gate round-tripping through HBM.
This kernel keeps everything for an (L-tile, C) block resident in VMEM:

  * the three conv taps are three dynamic-sliced DMA loads from the
    (zero-padded, timestep-biased) input in HBM — no im2col, any dilation;
  * each tap is one (TL, C) x (C, 2C) MXU matmul accumulated in f32;
  * gate + both 1x1 convs + residual scale happen in-register;
  * weights use constant index maps, so they stay in VMEM across the grid.

Forward-only by design: the purifier's reference gradient contract
stop-gradients the eps-net (``diffwave_ddpm.py:166``), so the flagship
attack path never differentiates through this kernel; training and
``grad_mode='full'`` use the XLA-conv path (same parameter tree).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = math.sqrt(0.5)


ALIGN = 16  # sublane alignment for bf16 DMA slice starts


def _block_kernel(xb_pad_ref, x_ref, wd_ref, bd_ref, wres_ref, bres_ref,
                  wskip_ref, bskip_ref, xout_ref, skip_ref, scratch, sems,
                  *, dilation: int, tile_l: int, res_ch: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    l0 = j * tile_l

    # Gather the three conv taps (rows [l0 + k*d, +TL) of the padded
    # input). Mosaic requires sublane-aligned DMA slice starts, so:
    #  * d % ALIGN == 0: three direct aligned DMA loads;
    #  * small d: one aligned window load [l0, l0 + TL + 2*ALIGN) and
    #    in-register rolls to realize the +-d shifts.
    if dilation % ALIGN == 0:
        copies = []
        for k in range(3):
            dma = pltpu.make_async_copy(
                xb_pad_ref.at[b, pl.ds(l0 + k * dilation, tile_l), :],
                scratch.at[k, :tile_l],
                sems.at[k],
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        taps = [scratch[k, :tile_l] for k in range(3)]
    else:
        assert 2 * dilation <= 2 * ALIGN, dilation
        dma = pltpu.make_async_copy(
            xb_pad_ref.at[b, pl.ds(l0, tile_l + 2 * ALIGN), :],
            scratch.at[0],
            sems.at[0],
        )
        dma.start()
        dma.wait()
        window = scratch[0]
        wlen = tile_l + 2 * ALIGN
        # Mosaic only rotates 32-bit data; a sublane roll is invariant to
        # lane packing, so bitcast bf16 pairs to int32, roll, bitcast back.
        # roll(-s) == roll(len - s) (shifts must be non-negative).
        if window.dtype.itemsize < 4:
            w32 = pltpu.bitcast(window, jnp.int32)
            taps = [pltpu.bitcast(
                pltpu.roll(w32, (wlen - k * dilation) % wlen, 0),
                window.dtype)[:tile_l] for k in range(3)]
        else:
            taps = [pltpu.roll(window, (wlen - k * dilation) % wlen,
                               0)[:tile_l] for k in range(3)]

    h = jnp.zeros((tile_l, 2 * res_ch), dtype=jnp.float32)
    for k in range(3):
        h = h + jnp.dot(taps[k], wd_ref[k],
                        preferred_element_type=jnp.float32)
    h = h + bd_ref[:].astype(jnp.float32)[None, :]

    gate = (jnp.tanh(h[:, :res_ch])
            * jax.nn.sigmoid(h[:, res_ch:])).astype(x_ref.dtype)

    res = jnp.dot(gate, wres_ref[:], preferred_element_type=jnp.float32)
    res = res + bres_ref[:].astype(jnp.float32)[None, :]
    xout_ref[:] = ((x_ref[:].astype(jnp.float32) + res)
                   * SQRT_HALF).astype(xout_ref.dtype)

    skip = jnp.dot(gate, wskip_ref[:], preferred_element_type=jnp.float32)
    skip_ref[:] = (skip
                   + bskip_ref[:].astype(jnp.float32)[None, :]).astype(
        skip_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "tile_l",
                                             "interpret"))
def fused_residual_block(
    x: jnp.ndarray,          # (B, L, C) current hidden state
    t_bias: jnp.ndarray,     # (B, C) per-block timestep bias (fc_t(emb))
    wd: jnp.ndarray,         # (3, C, 2C) dilated conv kernel
    bd: jnp.ndarray,         # (2C,)
    wres: jnp.ndarray,       # (C, C)
    bres: jnp.ndarray,       # (C,)
    wskip: jnp.ndarray,      # (C, C_skip)
    bskip: jnp.ndarray,      # (C_skip,)
    dilation: int,
    tile_l: int = 2000,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x_next, skip) of the reference block (``WaveNet.py:75-97``)."""
    B, L, C = x.shape
    assert L % tile_l == 0, (L, tile_l)
    skip_ch = wskip.shape[-1]
    dtype = x.dtype

    # timestep bias applied before padding so pad rows stay exactly zero
    # (the conv sees zero padding, not bias — reference semantics); extra
    # tail pad keeps the small-dilation window DMA in bounds
    xb = x + t_bias[:, None, :].astype(dtype)
    tail = dilation if dilation % 16 == 0 else dilation + 32
    xb_pad = jnp.pad(xb, ((0, 0), (dilation, tail), (0, 0)))

    grid = (B, L // tile_l)
    wspec = lambda: pl.BlockSpec(memory_space=pltpu.ANY)  # noqa: E731

    out_shapes = (
        jax.ShapeDtypeStruct((B, L, C), dtype),
        jax.ShapeDtypeStruct((B, L, skip_ch), dtype),
    )

    block_l = pl.BlockSpec((1, tile_l, C), lambda b, j: (b, j, 0))
    block_skip = pl.BlockSpec((1, tile_l, skip_ch), lambda b, j: (b, j, 0))
    const = lambda *s: pl.BlockSpec(s, lambda b, j: tuple(  # noqa: E731
        0 for _ in s), memory_space=pltpu.VMEM)

    def kernel(xb_pad_ref, x_ref, wd_ref, bd_ref, wres_ref, bres_ref,
               wskip_ref, bskip_ref, xout_ref, skip_ref, scratch, sems):
        _block_kernel(
            xb_pad_ref, x_ref[0], wd_ref, bd_ref[0], wres_ref, bres_ref[0],
            wskip_ref, bskip_ref[0], xout_ref.at[0], skip_ref.at[0],
            scratch, sems, dilation=dilation, tile_l=tile_l, res_ch=C)

    x_next, skip = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # xb_pad (HBM)
            block_l,                                    # x tile
            const(3, C, 2 * C),                         # wd
            const(1, 2 * C),                            # bd
            const(C, C),                                # wres
            const(1, C),                                # bres
            const(C, skip_ch),                          # wskip
            const(1, skip_ch),                          # bskip
        ],
        out_specs=(block_l, block_skip),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3, tile_l + 2 * ALIGN, C), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb_pad, x, wd, bd[None, :], wres, bres[None, :], wskip,
      bskip[None, :])
    return x_next, skip


def wavenet_forward_pallas(params, audio, diffusion_steps, *,
                           num_res_layers: int = 36,
                           dilation_cycle: int = 12,
                           embed_dim_in: int = 128,
                           dtype=jnp.bfloat16,
                           tile_l: int = 2000,
                           interpret: bool = False) -> jnp.ndarray:
    """Full WaveNet forward using the fused block for every residual layer.

    Takes the SAME flax param tree as ``models.wavenet.WaveNet`` (both conv
    impls), so checkpoints and the XLA path interchange freely.
    """
    from audiopure_tpu.diffusion.schedule import diffusion_step_embedding

    p = params["params"]
    x = jnp.swapaxes(audio, 1, 2).astype(dtype)  # (B, L, 1)

    emb = diffusion_step_embedding(diffusion_steps, embed_dim_in)
    emb = emb @ p["fc_t1"]["kernel"] + p["fc_t1"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    emb = emb @ p["fc_t2"]["kernel"] + p["fc_t2"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)

    h = jax.nn.relu(
        jnp.einsum("blc,kco->blo", x, p["init_conv"]["kernel"].astype(dtype))
        + p["init_conv"]["bias"].astype(dtype))

    skip_sum = None
    for n in range(num_res_layers):
        bp = p[f"res_block_{n}"]
        t_bias = (emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]).astype(
            dtype)
        h, skip = fused_residual_block(
            h, t_bias,
            bp["dilated_conv"]["kernel"].astype(dtype),
            bp["dilated_conv"]["bias"],
            bp["res_conv"]["kernel"][0].astype(dtype),
            bp["res_conv"]["bias"],
            bp["skip_conv"]["kernel"][0].astype(dtype),
            bp["skip_conv"]["bias"],
            dilation=2 ** (n % dilation_cycle),
            tile_l=tile_l, interpret=interpret)
        skip_sum = skip if skip_sum is None else skip_sum + skip

    out = skip_sum.astype(jnp.float32) * math.sqrt(1.0 / num_res_layers)
    out = jax.nn.relu(
        jnp.einsum("blc,kco->blo", out, p["final_conv1"]["kernel"])
        + p["final_conv1"]["bias"])
    out = (jnp.einsum("blc,kco->blo", out, p["final_conv2"]["kernel"])
           + p["final_conv2"]["bias"])
    return jnp.swapaxes(out, 1, 2)  # (B, C_out, L)
