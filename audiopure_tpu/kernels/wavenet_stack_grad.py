"""Whole-net differentiable WaveNet stack: v5 forward + layer-resident
backward (input/t-bias gradients).

The per-layer custom-VJP path (``wavenet_block_grad.py``) recomputes each
block's forward in XLA shifted-matmul form during the backward — measured
~9x the ref-contract attack cost per PGD iteration.  This module brings
the backward onto the same layer-resident design as the v5 forward
(``wavenet_block.py::fused_residual_stack``):

* forward — the v5 whole-net kernel, additionally streaming each layer's
  gate *pre-activation* ``h`` (L, 2C bf16) to HBM with async DMA (the
  only residual the backward needs; +2 MB VMEM, +~2.4 GB HBM at B=4);
* backward — ONE kernel, mirror image of v5: the cotangent state
  ``dx`` lives in VMEM ping-pong buffers, cycles stream in REVERSE, each
  layer recomputes only the elementwise tanh/sigmoid from the stored
  ``h`` and back-propagates with in-VMEM transposed-tap contractions
  (dh is staged layer-resident so the transposed conv reads are static
  slices — no conv_transpose, no halo recompute).

Gradient contract (attack mode): cotangents are produced for the audio
path (``x``) and the per-layer timestep biases; WEIGHT cotangents are
ZERO by design — ``grad_mode='full'`` differentiates the attack loss
w.r.t. the waveform, never the parameters (training uses the per-layer
VJP or XLA autodiff).  Reference semantics preserved: zero conv padding
beyond [0, L) stays bias-free, and the residual adds the *biased* input
(ref ``WaveNet.py:78-97`` in-place quirk), as in v3/v4/v5.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiopure_tpu.kernels.wavenet_block import (_halo, v5_vmem_est_mb,
                                                 v5x_vmem_est_mb)

SQRT_HALF = math.sqrt(0.5)


# ---------------------------------------------------------------------------
# forward: v5 body + h streaming
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _save_h_vmappable(dilation_cycle, chunk_l, interpret, hbm_io, save_x):
    """Per-static-config ``custom_vmap`` wrapper: the h_all (and x_all)
    streaming outputs live in memory_space=ANY in EVERY io mode, so a
    replica ``vmap`` (EOT grad_mode='full') must fold into the batch
    grid dim rather than batch the pallas_call (see
    ``wavenet_block._vmap_collapse``)."""
    from audiopure_tpu.kernels.wavenet_block import _vmap_collapse

    def call(x, t_biases, wd, bd, wres, bres, wskip, bskip):
        return _fused_residual_stack_save_h_jit(
            x, t_biases, wd, bd, wres, bres, wskip, bskip,
            dilation_cycle=dilation_cycle, chunk_l=chunk_l,
            interpret=interpret, hbm_io=hbm_io, save_x=save_x)

    return _vmap_collapse(call, n_row_args=2,
                          out_batched=(True,) * (3 if save_x else 2))


def fused_residual_stack_save_h(x, t_biases, wd, bd, wres, bres, wskip,
                                bskip, dilation_cycle: int,
                                chunk_l: int = 2000,
                                interpret: bool = False,
                                hbm_io: bool = False,
                                save_x: bool = False):
    """vmap-safe shim over :func:`_fused_residual_stack_save_h_jit`
    (see :func:`_save_h_vmappable`); same signature and outputs."""
    fn = _save_h_vmappable(dilation_cycle, chunk_l, bool(interpret),
                           bool(hbm_io), bool(save_x))
    return fn(x, t_biases, wd, bd, wres, bres, wskip, bskip)


@functools.partial(jax.jit, static_argnames=("dilation_cycle", "chunk_l",
                                             "interpret", "hbm_io",
                                             "save_x"))
def _fused_residual_stack_save_h_jit(x, t_biases, wd, bd, wres, bres,
                                     wskip, bskip, dilation_cycle: int,
                                     chunk_l: int = 2000,
                                     interpret: bool = False,
                                     hbm_io: bool = False,
                                     save_x: bool = False):
    """Returns (skip_sum (B, L, Cs), h_all (B, NL, L, 2C) in ``x.dtype``).

    ``hbm_io=True`` mirrors the v5x forward: the audio input and skip
    output stay in HBM and move by explicit DMA, dropping the
    double-buffered in/out staging from VMEM so the long KWS bucket
    lengths fit (see ``wavenet_block.fused_residual_stack``).

    ``save_x=True`` additionally streams each layer's INPUT state
    (``x_all`` (B, NL, L, C), raw — the per-layer t-bias is NOT added)
    and returns it third; the training backward needs it to form the
    weight cotangents (``wavenet_stack_train``)."""
    B, L, C = x.shape
    NL, _, _, C2 = wd.shape
    skip_ch = wskip.shape[-1]
    dtype = x.dtype
    assert NL % dilation_cycle == 0, (NL, dilation_cycle)
    assert L % chunk_l == 0, (L, chunk_l)
    n_cycles = NL // dilation_cycle
    margin = _halo(2 ** (dilation_cycle - 1))
    rows = margin + L + margin
    grid = (B, n_cycles)
    cyc = dilation_cycle

    def wspec(*s):
        return pl.BlockSpec((cyc, *s), lambda b, c: (c,) + (0,) * len(s),
                            memory_space=pltpu.VMEM)

    def bspec(dim):
        return pl.BlockSpec((1, cyc, dim), lambda b, c: (c, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(x_ref, tb_ref, wd_ref, bd_ref, wres_ref, bres_ref,
               wsk_ref, bsk_ref, out_ref, h_all, *rest):
        if save_x:
            x_all, xa, xb, skip, hbuf, hsem, xsem = rest[:7]
            io_sems = rest[7:]
        else:
            x_all, xsem = None, None
            xa, xb, skip, hbuf, hsem = rest[:5]
            io_sems = rest[5:]
        b = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            xa[:margin] = jnp.zeros((margin, C), dtype)
            xa[margin + L:] = jnp.zeros((margin, C), dtype)
            xb[:margin] = jnp.zeros((margin, C), dtype)
            xb[margin + L:] = jnp.zeros((margin, C), dtype)
            if hbm_io:
                dma_in = pltpu.make_async_copy(
                    x_ref.at[b], xa.at[pl.ds(margin, L)], io_sems[0])
                dma_in.start()
                dma_in.wait()
            else:
                xa[margin: margin + L] = x_ref[0]
            skip[:] = jnp.zeros((L, skip_ch), dtype)

        for j in range(cyc):
            d = 2 ** j
            cur, nxt = (xa, xb) if j % 2 == 0 else (xb, xa)
            bias = tb_ref[0, 0, j].astype(dtype)
            if save_x:
                # stream the layer input (raw, bias-free) for the
                # training backward's weight cotangents: ONE async DMA
                # straight from the ping-pong buffer, overlapped with
                # this layer's chunk loop (cur is read-only until the
                # NEXT layer writes it as its nxt — wait below)
                xdma = pltpu.make_async_copy(
                    cur.at[pl.ds(margin, L)], x_all.at[b, c * cyc + j],
                    xsem)
                xdma.start()
            for s in range(0, L, chunk_l):
                taps = []
                for k in range(3):
                    off = (k - 1) * d
                    sl = cur[margin + s + off: margin + s + off + chunk_l]
                    if 0 <= s + off and s + off + chunk_l <= L:
                        taps.append(sl + bias)
                    else:
                        row = jax.lax.broadcasted_iota(
                            jnp.int32, (chunk_l, 1), 0)
                        g = s + off + row
                        valid = jnp.logical_and(g >= 0, g < L)
                        taps.append(jnp.where(valid, sl + bias,
                                              jnp.zeros((), dtype)))
                h = jnp.zeros((chunk_l, C2), dtype=jnp.float32)
                for k in range(3):
                    h = h + jnp.dot(taps[k], wd_ref[j, k],
                                    preferred_element_type=jnp.float32)
                h = h + bd_ref[0, j].astype(jnp.float32)[None, :]
                # stream the pre-activation to HBM (sync DMA: ~2 MB per
                # chunk, trivially small next to the chunk's MXU work)
                hbuf[:] = h.astype(dtype)
                dma = pltpu.make_async_copy(
                    hbuf, h_all.at[b, c * cyc + j, pl.ds(s, chunk_l), :],
                    hsem)
                dma.start()
                dma.wait()
                gate = (jnp.tanh(h[:, :C])
                        * jax.nn.sigmoid(h[:, C:])).astype(dtype)
                res = jnp.dot(gate, wres_ref[j],
                              preferred_element_type=jnp.float32)
                nxt[margin + s: margin + s + chunk_l] = (
                    (taps[1].astype(jnp.float32) + res
                     + bres_ref[0, j].astype(jnp.float32)[None, :])
                    * SQRT_HALF).astype(dtype)
                skip[s: s + chunk_l] = (
                    skip[s: s + chunk_l].astype(jnp.float32)
                    + jnp.dot(gate, wsk_ref[j],
                              preferred_element_type=jnp.float32)
                    + bsk_ref[0, j].astype(jnp.float32)[None, :]
                ).astype(dtype)
            if save_x:
                # must complete before the next layer overwrites cur
                # (the next layer's nxt IS this layer's cur)
                xdma.wait()
        if cyc % 2 == 1:
            xa[margin: margin + L] = xb[margin: margin + L]

        @pl.when(c == n_cycles - 1)
        def _out():
            if hbm_io:
                dma_out = pltpu.make_async_copy(skip, out_ref.at[b],
                                                io_sems[1])
                dma_out.start()
                dma_out.wait()
            else:
                out_ref[0] = skip[:].astype(out_ref.dtype)

    if hbm_io:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        skip_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        io_sems = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        x_spec = pl.BlockSpec((1, L, C), lambda b, c: (b, 0, 0))
        skip_spec = pl.BlockSpec((1, L, skip_ch), lambda b, c: (b, 0, 0))
        io_sems = []

    out_specs = [
        skip_spec,
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, L, skip_ch), dtype),
        jax.ShapeDtypeStruct((B, NL, L, C2), dtype),
    ]
    scratch_shapes = [
        pltpu.VMEM((rows, C), dtype),           # xa
        pltpu.VMEM((rows, C), dtype),           # xb
        pltpu.VMEM((L, skip_ch), dtype),        # skip accumulator
        pltpu.VMEM((chunk_l, C2), dtype),       # h staging buffer
        pltpu.SemaphoreType.DMA,
    ]
    if save_x:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        out_shape.append(jax.ShapeDtypeStruct((B, NL, L, C), dtype))
        scratch_shapes.append(pltpu.SemaphoreType.DMA)  # xsem

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, 1, cyc, C), lambda b, c: (b, c, 0, 0)),
            wspec(3, C, C2), bspec(C2), wspec(C, C), bspec(C),
            wspec(C, skip_ch), bspec(skip_ch),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes + list(io_sems),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=123 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, t_biases.reshape(B, n_cycles, cyc, C), wd,
      bd.reshape(n_cycles, cyc, C2), wres, bres.reshape(n_cycles, cyc, C),
      wskip, bskip.reshape(n_cycles, cyc, skip_ch))
    if save_x:
        return outs[0], outs[1], outs[2]
    return outs[0], outs[1]


# ---------------------------------------------------------------------------
# backward: layer-resident transposed stack
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bwd_vmappable(dilation_cycle, chunk_l, interpret, hbm_io, dh_hbm):
    """Per-static-config ``custom_vmap`` wrapper for the backward stack:
    h_all arrives in memory_space=ANY in every mode (and g_skip/dx in the
    hbm variants), so a replica ``vmap`` folds into the batch grid dim
    (see ``wavenet_block._vmap_collapse``).  Both outputs (dx, g_tbias)
    are B-leading, so the collapse is sound."""
    from audiopure_tpu.kernels.wavenet_block import _vmap_collapse

    def call(g_skip, h_all, wd, wres, wskip):
        return _fused_residual_stack_bwd_jit(
            g_skip, h_all, wd, wres, wskip,
            dilation_cycle=dilation_cycle, chunk_l=chunk_l,
            interpret=interpret, hbm_io=hbm_io, dh_hbm=dh_hbm)

    return _vmap_collapse(call, n_row_args=2, out_batched=(True, True))


def fused_residual_stack_bwd(g_skip, h_all, wd, wres, wskip,
                             dilation_cycle: int, chunk_l: int = 2000,
                             interpret: bool = False,
                             hbm_io: bool = False,
                             dh_hbm: bool = False):
    """vmap-safe shim over :func:`_fused_residual_stack_bwd_jit`
    (see :func:`_bwd_vmappable`); same signature and outputs."""
    fn = _bwd_vmappable(dilation_cycle, chunk_l, bool(interpret),
                        bool(hbm_io), bool(dh_hbm))
    return fn(g_skip, h_all, wd, wres, wskip)


@functools.partial(jax.jit, static_argnames=("dilation_cycle", "chunk_l",
                                             "interpret", "hbm_io",
                                             "dh_hbm"))
def _fused_residual_stack_bwd_jit(g_skip, h_all, wd, wres, wskip,
                                  dilation_cycle: int, chunk_l: int = 2000,
                                  interpret: bool = False,
                                  hbm_io: bool = False,
                                  dh_hbm: bool = False):
    """Backward of :func:`fused_residual_stack_save_h` w.r.t. the input
    state and per-layer biases.

    g_skip: (B, L, Cs) cotangent of the skip sum;
    returns (dx (B, L, C), g_tbias (B, NL, C)).

    ``hbm_io=True``: g_skip stays in HBM and is DMA-staged per chunk
    (the h-streaming pattern — re-read once per LAYER, ~NL x (L, Cs)
    of extra HBM reads; at L=24000 that is ~0.4 GB = well under 1 ms
    against ~60 ms of MXU work), and dx leaves by one DMA at the last
    grid step.  Needed at the long KWS bucket lengths where the blocked
    (L, Cs)/(L, C) in/out staging plus the (rows, 2C) dh-resident
    buffer exceed VMEM.

    ``dh_hbm=True`` (requires ``hbm_io``): additionally evicts the
    (rows, 2C) dh layer-resident buffer to HBM — pass 1 streams each
    dh chunk out (an extra (B, L, 2C) kernel output, per-batch-row so
    megacore-split grids never share it), pass 2 DMAs back a
    ``chunk + 2*halo(d)`` window per chunk with statically-clamped
    bounds and zeroed out-of-range edge rows (the transposed-conv zero
    padding).  Extra HBM traffic: one dh write + ~1.3x dh reads per
    layer (window overlap sum_j 2*2^j/chunk); drops the VMEM resident
    set from (2 rows C + rows 2C) to (2 rows C + window), extending
    ``grad_mode='full'`` past the L=32000 limit of the resident dh.
    """
    B, NL, L, C2 = h_all.shape
    assert NL % dilation_cycle == 0, (NL, dilation_cycle)
    assert L % chunk_l == 0, (L, chunk_l)
    assert not (dh_hbm and not hbm_io), "dh_hbm requires hbm_io layout"
    C = wd.shape[2]
    skip_ch = wskip.shape[-1]
    dtype = h_all.dtype
    n_cycles = NL // dilation_cycle
    margin = _halo(2 ** (dilation_cycle - 1))
    rows = margin + L + margin
    grid = (B, n_cycles)
    cyc = dilation_cycle

    # weights stream per REVERSED cycle
    def wspec(*s):
        return pl.BlockSpec(
            (cyc, *s), lambda b, c: (n_cycles - 1 - c,) + (0,) * len(s),
            memory_space=pltpu.VMEM)

    def kernel(gs_ref, h_all_ref, wd_ref, wres_ref, wsk_ref, dx_ref,
               gtb_ref, *rest):
        if dh_hbm:
            (dh_ref, dxa, dxb, dhs, dhw, hbuf, hsem, dhosem, dhisem,
             gsbuf, gsem, osem) = rest
            dhf = None
        elif hbm_io:
            dxa, dxb, dhf, hbuf, hsem, gsbuf, gsem, osem = rest
        else:
            dxa, dxb, dhf, hbuf, hsem = rest
            gsbuf = None
        b = pl.program_id(0)
        c = pl.program_id(1)          # grid step; actual cycle reversed

        @pl.when(c == 0)
        def _init():
            # dx_{NL} = 0: the final hidden state is discarded by the head
            dxa[:] = jnp.zeros((rows, C), dtype)
            dxb[:] = jnp.zeros((rows, C), dtype)
            if not dh_hbm:
                # dh margins are the transposed-conv zero padding
                dhf[:margin] = jnp.zeros((margin, C2), dtype)
                dhf[margin + L:] = jnp.zeros((margin, C2), dtype)

        n_swaps = 0
        for j in reversed(range(cyc)):
            d = 2 ** j
            cur, nxt = (dxa, dxb) if n_swaps % 2 == 0 else (dxb, dxa)
            n_swaps += 1
            gtb_acc = jnp.zeros((1, C), jnp.float32)
            # pass 1: dgate -> dh, staged layer-resident
            for s in range(0, L, chunk_l):
                if hbm_io:
                    gdma = pltpu.make_async_copy(
                        gs_ref.at[b, pl.ds(s, chunk_l), :], gsbuf, gsem)
                    gdma.start()
                dma = pltpu.make_async_copy(
                    h_all_ref.at[b, (n_cycles - 1 - c) * cyc + j,
                                 pl.ds(s, chunk_l), :],
                    hbuf, hsem)
                dma.start()
                g_next = cur[margin + s: margin + s + chunk_l]
                g_res = g_next.astype(jnp.float32) * SQRT_HALF
                dgate = jax.lax.dot_general(
                    g_res.astype(dtype), wres_ref[j],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if hbm_io:
                    gdma.wait()
                    gs_chunk = gsbuf[:]
                else:
                    gs_chunk = gs_ref[0, s: s + chunk_l]
                dgate = dgate + jax.lax.dot_general(
                    gs_chunk, wsk_ref[j],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dma.wait()
                hh = hbuf[:].astype(jnp.float32)
                t = jnp.tanh(hh[:, :C])
                sg = jax.nn.sigmoid(hh[:, C:])
                dh1 = dgate * sg * (1.0 - t * t)
                dh2 = dgate * t * sg * (1.0 - sg)
                dh_chunk = jnp.concatenate([dh1, dh2],
                                           axis=-1).astype(dtype)
                if dh_hbm:
                    dhs[:] = dh_chunk
                    odma = pltpu.make_async_copy(
                        dhs, dh_ref.at[b, pl.ds(s, chunk_l), :], dhosem)
                    odma.start()
                    odma.wait()
                else:
                    dhf[margin + s: margin + s + chunk_l] = dh_chunk
            # pass 2: transposed taps + residual path
            for s in range(0, L, chunk_l):
                if dh_hbm:
                    # stage the chunk+2*halo(d) dh window; rows outside
                    # [0, L) are the transposed-conv zero padding
                    hd = _halo(d)
                    ws = s - hd
                    cs, ce = max(ws, 0), min(s + chunk_l + hd, L)
                    if cs > ws:
                        dhw[: cs - ws] = jnp.zeros((cs - ws, C2), dtype)
                    wlen = chunk_l + 2 * hd
                    if ce - ws < wlen:
                        dhw[ce - ws: wlen] = jnp.zeros(
                            (wlen - (ce - ws), C2), dtype)
                    idma = pltpu.make_async_copy(
                        dh_ref.at[b, pl.ds(cs, ce - cs), :],
                        dhw.at[pl.ds(cs - ws, ce - cs)], dhisem)
                    idma.start()
                    idma.wait()
                acc = jnp.zeros((chunk_l, C), jnp.float32)
                for k in range(3):
                    off = (1 - k) * d     # dxb[m] += dh[m-(k-1)d] @ wd^T
                    if dh_hbm:
                        sl = dhw[hd + off: hd + off + chunk_l]
                    else:
                        sl = dhf[margin + s + off:
                                 margin + s + off + chunk_l]
                    acc = acc + jax.lax.dot_general(
                        sl, wd_ref[j, k], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                g_next = cur[margin + s: margin + s + chunk_l]
                dxbv = acc + g_next.astype(jnp.float32) * SQRT_HALF
                nxt[margin + s: margin + s + chunk_l] = dxbv.astype(dtype)
                gtb_acc = gtb_acc + jnp.sum(dxbv, axis=0, keepdims=True)
            gtb_ref[0, 0, j] = gtb_acc[0].astype(gtb_ref.dtype)
        if cyc % 2 == 1:
            # odd cycle length: bring the state back to dxa so every grid
            # step starts from dxa (mirrors the v5 forward)
            dxa[margin: margin + L] = dxb[margin: margin + L]

        @pl.when(c == n_cycles - 1)
        def _out():
            # even cyc ends in dxa (last swap writes nxt=dxa); odd cyc is
            # copied back above — either way dxa holds the state
            if hbm_io:
                odma = pltpu.make_async_copy(
                    dxa.at[pl.ds(margin, L)], dx_ref.at[b], osem)
                odma.start()
                odma.wait()
            else:
                dx_ref[0] = dxa[margin: margin + L]

    if hbm_io:
        gs_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        dx_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        hbm_scratch = [pltpu.VMEM((chunk_l, skip_ch), dtype),
                       pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        gs_spec = pl.BlockSpec((1, L, skip_ch), lambda b, c: (b, 0, 0))
        dx_spec = pl.BlockSpec((1, L, C), lambda b, c: (b, 0, 0))
        hbm_scratch = []

    out_specs = [
        dx_spec,
        pl.BlockSpec((1, 1, cyc, C),
                     lambda b, c: (b, n_cycles - 1 - c, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, L, C), dtype),
        jax.ShapeDtypeStruct((B, n_cycles, cyc, C), jnp.float32),
    ]
    if dh_hbm:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        out_shape.append(jax.ShapeDtypeStruct((B, L, C2), dtype))
        scratch_shapes = [
            pltpu.VMEM((rows, C), dtype),                  # dxa
            pltpu.VMEM((rows, C), dtype),                  # dxb
            pltpu.VMEM((chunk_l, C2), dtype),              # dh out stage
            pltpu.VMEM((chunk_l + 2 * margin, C2), dtype),  # dh window
            pltpu.VMEM((chunk_l, C2), dtype),              # h staging
            pltpu.SemaphoreType.DMA,                        # hsem
            pltpu.SemaphoreType.DMA,                        # dhosem
            pltpu.SemaphoreType.DMA,                        # dhisem
            *hbm_scratch,
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((rows, C), dtype),            # dxa
            pltpu.VMEM((rows, C), dtype),            # dxb
            pltpu.VMEM((rows, C2), dtype),           # dh layer-resident
            pltpu.VMEM((chunk_l, C2), dtype),        # h staging
            pltpu.SemaphoreType.DMA,
            *hbm_scratch,
        ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            gs_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),
            wspec(3, C, C2), wspec(C, C), wspec(C, skip_ch),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=123 * 1024 * 1024,
        ),
        interpret=interpret,
    )(g_skip, h_all, wd, wres, wskip)
    dx, gtb = outs[0], outs[1]
    return dx, gtb.reshape(B, NL, C)


def gradstack_bwd_vmem_est_mb(L: int, itemsize: int, C: int = 256,
                              skip_ch: int = 256, cyc: int = 12,
                              chunk_l: int = 1000) -> float:
    """Resident-footprint estimate of the hbm_io backward kernel: dx
    ping-pong + (rows, 2C) dh buffer + staging + double-buffered cycle
    weights + per-chunk f32 live set, with the same 1.35x Mosaic slack
    as ``v5x_vmem_est_mb``."""
    margin = _halo(2 ** (cyc - 1))
    rows = L + 2 * margin
    mb = 1.0 / (1024 * 1024)
    state = (2 * rows * C + rows * 2 * C) * itemsize * mb
    staging = (chunk_l * 2 * C + chunk_l * skip_ch) * itemsize * mb
    weights = 2 * cyc * (3 * C * 2 * C + C * C + C * skip_ch) \
        * itemsize * mb
    live = (chunk_l * 2 * C + chunk_l * C) * 4 * mb
    return (state + staging + weights + live) * 1.35


def gradstack_bwd_dhhbm_vmem_est_mb(L: int, itemsize: int, C: int = 256,
                                    skip_ch: int = 256, cyc: int = 12,
                                    chunk_l: int = 2000) -> float:
    """Resident-footprint estimate of the dh_hbm backward kernel: dx
    ping-pong + (chunk+2*margin, 2C) dh window + out/h/g_skip staging +
    double-buffered cycle weights + per-chunk f32 live set, same 1.35x
    Mosaic slack as the other estimates.  The (rows, 2C) dh resident of
    :func:`gradstack_bwd_vmem_est_mb` is gone — the only L-proportional
    terms left are the two (rows, C) dx buffers."""
    margin = _halo(2 ** (cyc - 1))
    rows = L + 2 * margin
    mb = 1.0 / (1024 * 1024)
    state = 2 * rows * C * itemsize * mb
    window = (chunk_l + 2 * margin) * 2 * C * itemsize * mb
    staging = (2 * chunk_l * 2 * C + chunk_l * skip_ch) * itemsize * mb
    weights = 2 * cyc * (3 * C * 2 * C + C * C + C * skip_ch) \
        * itemsize * mb
    live = (chunk_l * 2 * C + chunk_l * C) * 4 * mb
    return (state + window + staging + weights + live) * 1.35


# ---------------------------------------------------------------------------
# custom VJP stack (input/t-bias grads; weight grads zero by contract)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_stack_input_grad(x, t_biases, wd, bd, wres, bres, wskip, bskip,
                           dilation_cycle: int, chunk_l: int = 2000,
                           interpret: bool = False,
                           hbm_io: bool = False,
                           dh_hbm: bool = False):
    """skip_sum with gradients w.r.t. ``x`` and ``t_biases`` ONLY (the
    adaptive-attack contract); weight/bias cotangents are zero."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_stack

    return fused_residual_stack(x, t_biases, wd, bd, wres, bres, wskip,
                                bskip, dilation_cycle=dilation_cycle,
                                chunk_l=chunk_l, interpret=interpret,
                                hbm_io=hbm_io)


def _fsig_fwd(x, t_biases, wd, bd, wres, bres, wskip, bskip,
              dilation_cycle, chunk_l, interpret, hbm_io, dh_hbm):
    skip, h_all = fused_residual_stack_save_h(
        x, t_biases, wd, bd, wres, bres, wskip, bskip,
        dilation_cycle=dilation_cycle, chunk_l=chunk_l,
        interpret=interpret, hbm_io=hbm_io)
    return skip, (h_all, wd, wres, wskip,
                  (t_biases, bd, bres, bskip))


def _fsig_bwd(dilation_cycle, chunk_l, interpret, hbm_io, dh_hbm, res,
              g_skip):
    h_all, wd, wres, wskip, (t_biases, bd, bres, bskip) = res
    dx, gtb = fused_residual_stack_bwd(
        g_skip.astype(h_all.dtype), h_all, wd, wres, wskip,
        dilation_cycle=dilation_cycle, chunk_l=chunk_l,
        interpret=interpret, hbm_io=hbm_io, dh_hbm=dh_hbm)
    zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                   (wd, bd, wres, bres, wskip, bskip))
    g_wd, g_bd, g_wres, g_bres, g_wskip, g_bskip = zeros
    return (dx, gtb.astype(t_biases.dtype), g_wd, g_bd, g_wres, g_bres,
            g_wskip, g_bskip)


fused_stack_input_grad.defvjp(_fsig_fwd, _fsig_bwd)


def fullgrad_dispatch_band(L: int, itemsize: int, *, c_res: int = 256,
                           skip_ch: int = 256, cyc: int = 12,
                           interpret: bool = False):
    """The grad_mode='full' dispatch decision, shared by the dispatcher
    and its regression test (tests/test_stack_grad.py pins the bands so
    estimate drift can't silently change dispatch).

    Returns ``(mode, chunk)`` with mode in {'resident', 'hbm_io',
    'dh_hbm', 'per-layer'}; chunk is the backward length-chunk for the
    hbm variants (None otherwise)."""
    # v5_vmem_est_mb is calibrated at C=Cs=256; it scales its state term
    # linearly and its weights term quadratically with the channel config
    # so non-256 configs dispatch on their real footprint
    if interpret or v5_vmem_est_mb(L, itemsize, c_res=c_res,
                                   skip_ch=skip_ch) + 2.0 \
            <= 121.0:
        return "resident", None
    # long audio: the hbm_io variants (v5x-style in/out DMA for the
    # save_h forward; staged g_skip + DMA'd dx for the backward) before
    # surrendering to the per-layer VJP; the backward's (rows, 2C)
    # dh-resident buffer wants the smaller 1000-chunk
    for ch in (1000, 800, 500):
        if L % ch == 0 and gradstack_bwd_vmem_est_mb(
                L, itemsize, C=c_res, skip_ch=skip_ch, cyc=cyc,
                chunk_l=ch) <= 118.0 and \
                v5x_vmem_est_mb(L, itemsize, C=c_res, skip_ch=skip_ch,
                                cyc=cyc, chunk_l=ch) + 3.0 <= 118.0:
            return "hbm_io", ch
    # longer still: evict the backward's dh resident to HBM (dh_hbm);
    # the forward stays the hbm_io save_h, so the binding constraint
    # becomes its xa/xb+skip resident (~L<=37000 bf16)
    for ch in (2000, 1600, 1000, 800, 500):
        if L % ch == 0 and gradstack_bwd_dhhbm_vmem_est_mb(
                L, itemsize, C=c_res, skip_ch=skip_ch, cyc=cyc,
                chunk_l=ch) <= 118.0 and \
                v5x_vmem_est_mb(L, itemsize, C=c_res, skip_ch=skip_ch,
                                cyc=cyc, chunk_l=ch) + 3.0 <= 118.0:
            return "dh_hbm", ch
    return "per-layer", None


def wavenet_forward_pallas_input_grad(params, audio, diffusion_steps, *,
                                      num_res_layers: int = 36,
                                      dilation_cycle: int = 12,
                                      embed_dim_in: int = 128,
                                      dtype=jnp.bfloat16,
                                      interpret=None):
    """Full WaveNet forward on the v5 whole-net kernel, differentiable
    w.r.t. the AUDIO (and timestep) path — the ``grad_mode='full'``
    attack contract.  Same param tree / outputs as
    ``wavenet_forward_pallas``; weight gradients are zero (use the
    per-layer VJP or XLA autodiff for training)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    # VMEM guard (real hardware only — interpret mode has no VMEM): the
    # save_h forward carries the v5-sized resident state + ~2 MB staging
    # (measured fitting at L=16000 bf16); beyond the budget, or for
    # partial dilation cycles, fall back to the per-layer VJP (tiles L).
    # Dispatch bands at the flagship 256/256-channel config, bf16:
    #   L <= ~15000  resident v5 save_h + resident backward
    #   L <= ~28000  hbm_io (DMA'd in/out fwd, staged g_skip bwd)
    #   L <= ~37000  hbm_io + dh_hbm (backward dh evicted to HBM);
    #                the binding buffer is now the forward's xa/xb+skip
    #   beyond       per-layer VJP (tiles L, ~1.8x slower)
    L_in = audio.shape[-1]
    itemsize = jnp.dtype(dtype).itemsize
    blk0 = params["params"]["res_block_0"]
    c_res = blk0["res_conv"]["kernel"].shape[-2]
    skip_ch = blk0["skip_conv"]["kernel"].shape[-1]
    mode, chunk_override = fullgrad_dispatch_band(
        L_in, itemsize, c_res=c_res, skip_ch=skip_ch,
        cyc=dilation_cycle, interpret=interpret)
    hbm_io = mode in ("hbm_io", "dh_hbm")
    dh_hbm = mode == "dh_hbm"
    too_big = mode == "per-layer"
    if num_res_layers % dilation_cycle != 0 or too_big:
        from audiopure_tpu.kernels.wavenet_block_grad import \
            wavenet_forward_pallas_grad
        return wavenet_forward_pallas_grad(
            params, audio, diffusion_steps,
            num_res_layers=num_res_layers,
            dilation_cycle=dilation_cycle, embed_dim_in=embed_dim_in,
            dtype=dtype)
    from audiopure_tpu.kernels.wavenet_block import (_STACK_CHUNKS,
                                                     pick_stack_chunk,
                                                     wavenet_head,
                                                     wavenet_stack_inputs,
                                                     wavenet_stem)

    p = params["params"]
    emb, h = wavenet_stem(p, audio, diffusion_steps, embed_dim_in, dtype)
    stack_in = wavenet_stack_inputs(p, emb, num_res_layers, dtype)
    chunk = chunk_override or pick_stack_chunk(
        L_in, prefer=_STACK_CHUNKS[1:])
    skip_sum = fused_stack_input_grad(
        h, *stack_in, dilation_cycle, chunk, interpret, hbm_io, dh_hbm)
    return wavenet_head(p, skip_sum, num_res_layers)


# attack-contract marker: weight/bias cotangents are exact zeros; the
# training entry point refuses callables that reference this kernel
# (training/diffwave._uses_input_grad_kernel)
wavenet_forward_pallas_input_grad._zero_weight_grads = True
