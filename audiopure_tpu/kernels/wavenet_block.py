"""Pallas TPU kernel: fused WaveNet gated residual block.

The hot op of the whole framework (SURVEY.md §3.1: wall-clock is
``max_iter x eot x steps`` WaveNet forwards). One XLA layer does
  dilated conv (k=3) -> gated tanh*sigmoid -> res 1x1 -> skip 1x1
with the (L, 2C) pre-activation and the gate round-tripping through HBM.
This kernel keeps everything for an (L-tile, C) block resident in VMEM:

  * the three conv taps are element-offset BlockSpec views of the
    (zero-padded, timestep-biased) input — pallas double-buffers them
    automatically, overlapping HBM traffic with the MXU;
  * each tap is one (TL, C) x (C, 2C) MXU matmul accumulated in f32;
  * gate + both 1x1 convs + residual scale happen in-register;
  * weights use constant index maps, so they stay in VMEM across the grid.

Small dilations (d not sublane-aligned) read one aligned window and realize
the +-d shifts with in-register rolls (bitcast to 32-bit first — Mosaic
only rotates 32-bit data).

The kernels here are forward-only: the purifier's reference gradient
contract stop-gradients the eps-net (``diffwave_ddpm.py:166``), so the
flagship attack path never differentiates through them.  For
``grad_mode='full'`` and training, ``wavenet_block_grad.py`` wraps the
v3 block in a ``jax.custom_vjp`` (pallas forward, recompute backward).
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

try:  # element-offset block dims (jax >= 0.7 core API)
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover
    _Element = None

SQRT_HALF = math.sqrt(0.5)
ALIGN = 16  # sublane alignment for bf16 slice starts
# Window+roll is required when the dilation is not sublane-aligned; for
# aligned dilations three direct tap views measure the same speed (DMA is
# fully overlapped), so the simpler path is used.
ROLL_MAX_D = ALIGN - 1


def _halo(dilation: int) -> int:
    """Window halo: dilation rounded up to the sublane alignment."""
    return -(-dilation // ALIGN) * ALIGN


def _rolled_taps(window, dilation: int, tile_l: int):
    """Realize the three +-d shifts of an aligned window in-register.

    Mosaic only rotates 32-bit data, and ``pltpu.bitcast`` packs along the
    *sublane* dim (rolling packed rows would double the shift), so sub-32-bit
    windows are value-cast to f32 for the roll and cast back — exact for
    bf16. No wraparound: row i of tap k reads window row i + k*d, and
    i + 2d < wlen for i < tile_l.
    """
    wlen = window.shape[0]
    w = window.astype(jnp.float32) if window.dtype.itemsize < 4 else window
    return [pltpu.roll(w, (wlen - k * dilation) % wlen, 0)[:tile_l]
            .astype(window.dtype) for k in range(3)]


def _compute(taps, x_blk, wd_ref, bd_ref, wres_ref, bres_ref, wskip_ref,
             bskip_ref, acc_blk, xout_ref, skip_ref, res_ch):
    h = jnp.zeros((taps[0].shape[0], 2 * res_ch), dtype=jnp.float32)
    for k in range(3):
        h = h + jnp.dot(taps[k], wd_ref[k],
                        preferred_element_type=jnp.float32)
    h = h + bd_ref[:].astype(jnp.float32)[None, :]

    gate = (jnp.tanh(h[:, :res_ch])
            * jax.nn.sigmoid(h[:, res_ch:])).astype(x_blk.dtype)

    res = jnp.dot(gate, wres_ref[:], preferred_element_type=jnp.float32)
    res = res + bres_ref[:].astype(jnp.float32)[None, :]
    xout_ref[:] = ((x_blk.astype(jnp.float32) + res)
                   * SQRT_HALF).astype(xout_ref.dtype)

    skip = jnp.dot(gate, wskip_ref[:], preferred_element_type=jnp.float32)
    skip = skip + bskip_ref[:].astype(jnp.float32)[None, :]
    # running skip accumulation fused in (saves the XLA add pass per layer)
    skip_ref[:] = (acc_blk.astype(jnp.float32) + skip).astype(
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
    skip_acc: jnp.ndarray,   # (B, L, C_skip) running skip sum (accumulated)
    dilation: int,
    tile_l: int = 1600,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x_next, skip_acc + skip) of the reference block
    (``WaveNet.py:75-97``) with the cross-layer skip sum fused in."""
    B, L, C = x.shape
    assert L % tile_l == 0 and tile_l % ALIGN == 0, (L, tile_l)
    skip_ch = wskip.shape[-1]
    dtype = x.dtype
    # large dilations: three direct element-offset tap views (aligned);
    # small/medium: one window read + in-register rolls (1x HBM traffic)
    use_window = dilation <= ROLL_MAX_D
    halo = _halo(dilation)

    # timestep bias applied before padding so pad rows stay exactly zero
    # (the conv sees zero padding, not bias — reference semantics); tail
    # padding keeps the window reads in bounds
    xb = x + t_bias[:, None, :].astype(dtype)
    tail = dilation if not use_window else 2 * halo - dilation
    xb_pad = jnp.pad(xb, ((0, 0), (dilation, tail), (0, 0)))

    grid = (B, L // tile_l)
    block_l = pl.BlockSpec((1, tile_l, C), lambda b, j: (b, j, 0))
    block_skip = pl.BlockSpec((1, tile_l, skip_ch), lambda b, j: (b, j, 0))
    const = lambda *s: pl.BlockSpec(s, lambda b, j: tuple(  # noqa: E731
        0 for _ in s), memory_space=pltpu.VMEM)

    def elem_spec(length, offset):
        # element-offset view: start = j*tile_l + offset (auto-pipelined);
        # pallas requires all dims Element if any is
        return pl.BlockSpec(
            (_Element(1), _Element(length), _Element(C)),
            lambda b, j, off=offset: (
                b, pl.multiple_of(j * tile_l + off, ALIGN), 0))

    if not use_window and _Element is not None:
        tap_specs = [elem_spec(tile_l, k * dilation) for k in range(3)]
        tap_inputs = [xb_pad] * 3
    else:
        tap_specs = [elem_spec(tile_l + 2 * halo, 0)]
        tap_inputs = [xb_pad]

    def kernel(*refs):
        tap_refs = refs[: len(tap_specs)]
        (x_ref, wd_ref, bd_ref, wres_ref, bres_ref, wskip_ref, bskip_ref,
         acc_ref, xout_ref, skip_ref) = refs[len(tap_specs):]
        if len(tap_refs) == 3:
            taps = [r[0] for r in tap_refs]
        else:
            taps = _rolled_taps(tap_refs[0][0], dilation, tile_l)
        _compute(taps, x_ref[0], wd_ref, bd_ref[0], wres_ref, bres_ref[0],
                 wskip_ref, bskip_ref[0], acc_ref[0], xout_ref.at[0],
                 skip_ref.at[0], C)

    x_next, skip = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*tap_specs,
                  block_l,                 # x tile (residual input)
                  const(3, C, 2 * C),      # wd
                  const(1, 2 * C),         # bd
                  const(C, C),             # wres
                  const(1, C),             # bres
                  const(C, skip_ch),       # wskip
                  const(1, skip_ch),       # bskip
                  block_skip],             # skip accumulator (aliased)
        out_specs=(block_l, block_skip),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, C), dtype),
            jax.ShapeDtypeStruct((B, L, skip_ch), dtype),
        ),
        input_output_aliases={len(tap_specs) + 7: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
        # residual input is xb (the *biased* x): the reference block
        # mutates x in place when adding the timestep bias
        # (``WaveNet.py:78-84``), so its residual at :97 adds x+bias
    )(*tap_inputs, xb, wd, bd[None, :], wres, bres[None, :], wskip,
      bskip[None, :], skip_acc)
    return x_next, skip


def _roll_rows(w, shift, even_shift: bool):
    """Dynamic row-roll. Mosaic only rotates 32-bit data; for bf16 with a
    guaranteed-even shift we bitcast to i32 (packs *pairs* of sublane
    rows) and roll by shift//2 — no f32 temporaries, which matters for
    scoped-VMEM pressure.  Odd/unknown parity falls back to a value cast."""
    if w.dtype.itemsize >= 4:
        return pltpu.roll(w, shift, 0)
    if even_shift and w.dtype == jnp.bfloat16 and w.shape[0] % 2 == 0:
        packed = pltpu.bitcast(w, jnp.int32)
        return pltpu.bitcast(pltpu.roll(packed, shift // 2, 0), w.dtype)
    return pltpu.roll(w.astype(jnp.float32), shift, 0).astype(w.dtype)


def _dyn_taps(window, wlen: int, base_shifts, c, tile_l: int, dilation: int,
              j, L: int, bias, dtype, even_shift: bool):
    """Realize the three conv taps from clamped window view(s): roll each
    view left by (base_shift + c) to undo the boundary clamp, mask rows
    whose global source index falls outside [0, L) to exact zero (the
    reference's zero padding), and add the timestep bias to valid rows.

    window: list of 1 (small-d) or 3 (large-d) f32/bf16 views.
    base_shifts: static per-tap extra shift (halo + k*d for the window
    path, 0 for per-tap views).  c: traced clamp correction(s).
    even_shift: all shifts guaranteed even (aligned dilations + aligned
    clamps) — enables the packed bf16 roll."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_l, 1), 0)
    taps = []
    bias = bias.astype(dtype)
    for k in range(3):
        w = window[k % len(window)]
        ck = c[k % len(c)]
        shift = jnp.mod(jnp.int32(wlen) - (base_shifts[k] + ck),
                        jnp.int32(wlen))
        rolled = _roll_rows(w, shift, even_shift)[:tile_l].astype(dtype)
        g = j * tile_l + row + (k - 1) * dilation  # global source row
        valid = jnp.logical_and(g >= 0, g < L)
        taps.append(jnp.where(valid, rolled + bias,
                              jnp.zeros((), dtype)))
    return taps


@functools.partial(jax.jit, static_argnames=("dilation", "tile_l",
                                             "interpret"))
def fused_residual_block_v3(
    x: jnp.ndarray,          # (B, L, C) current hidden state (UNbiased)
    t_bias: jnp.ndarray,     # (B, C) per-block timestep bias (fc_t(emb))
    wd: jnp.ndarray,         # (3, C, 2C) dilated conv kernel
    bd: jnp.ndarray,         # (2C,)
    wres: jnp.ndarray,       # (C, C)
    bres: jnp.ndarray,       # (C,)
    wskip: jnp.ndarray,      # (C, C_skip)
    bskip: jnp.ndarray,      # (C_skip,)
    skip_acc: jnp.ndarray,   # (B, L, C_skip) running skip sum
    dilation: int,
    tile_l: int = 1600,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad-free, bias-fused residual block.

    v2 (``fused_residual_block``) spends one full HBM pass per layer on
    the host-side ``x + t_bias`` + ``jnp.pad`` producing the kernel
    input.  Here the kernel reads the raw ``x`` directly: conv taps are
    clamped element-offset views, boundary clamping is undone with an
    in-register dynamic roll, out-of-range rows are masked to exact zero
    (reference zero-padding semantics) and the timestep bias is added
    in-register to valid rows only.  The residual input rides tap 1
    (offset 0), so x is read once.  Residual adds the *biased* x
    (reference in-place quirk, ``WaveNet.py:78-84``)."""
    B, L, C = x.shape
    assert L % tile_l == 0 and tile_l % ALIGN == 0, (L, tile_l)
    skip_ch = wskip.shape[-1]
    dtype = x.dtype
    use_window = dilation <= ROLL_MAX_D
    halo = _halo(dilation)
    # window capped at L: for short audio (tile_l == L) the haloed window
    # would otherwise exceed the array and the clamped element-offset
    # read would go out of bounds (garbage rows); with read_len == L the
    # window is the whole signal and the roll+mask machinery below
    # resolves every tap row modulo L exactly
    read_len = min(tile_l + 2 * halo, L) if use_window else tile_l

    grid = (B, L // tile_l)
    block_l = pl.BlockSpec((1, tile_l, C), lambda b, j: (b, j, 0))
    block_skip = pl.BlockSpec((1, tile_l, skip_ch), lambda b, j: (b, j, 0))
    # (B, 1, C) layout: Mosaic requires the last two block dims to match
    # the array dims or be (8k, 128k)-divisible — (1, C) of (B, C) is not
    bias_spec = pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0))
    const = lambda *s: pl.BlockSpec(s, lambda b, j: tuple(  # noqa: E731
        0 for _ in s), memory_space=pltpu.VMEM)

    def clamp_start(g):
        return jnp.minimum(jnp.maximum(g, 0), L - read_len)

    def view_spec(offset):
        # clamped element-offset view of the raw x; all operands of the
        # clamp are ALIGN-multiples, so the start stays aligned
        return pl.BlockSpec(
            (_Element(1), _Element(read_len), _Element(C)),
            lambda b, j, off=offset: (
                b, pl.multiple_of(clamp_start(j * tile_l + off), ALIGN), 0))

    if use_window:
        view_offsets = [-halo]
        base_shifts = [halo + k * dilation - dilation for k in range(3)]
    else:
        view_offsets = [(k - 1) * dilation for k in range(3)]
        base_shifts = [0, 0, 0]

    def kernel(*refs):
        views = [r[0] for r in refs[: len(view_offsets)]]
        (bias_ref, wd_ref, bd_ref, wres_ref, bres_ref, wskip_ref,
         bskip_ref, acc_ref, xout_ref, skip_ref) = refs[len(view_offsets):]
        j = pl.program_id(1)
        # traced clamp corrections: c = desired_start - clamped_start
        cs = [j * tile_l + off
              - clamp_start(j * tile_l + off) for off in view_offsets]
        # shifts are all even when the dilation is even (halo, tile_l and
        # clamp corrections are ALIGN-multiples) -> packed bf16 roll
        taps = _dyn_taps(views, read_len, base_shifts, cs, tile_l,
                         dilation, j, L, bias_ref[0, 0], dtype,
                         even_shift=(dilation % 2 == 0
                                     and tile_l % 2 == 0))
        _compute(taps, taps[1], wd_ref, bd_ref[0], wres_ref, bres_ref[0],
                 wskip_ref, bskip_ref[0], acc_ref[0], xout_ref.at[0],
                 skip_ref.at[0], C)

    x_next, skip = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*[view_spec(off) for off in view_offsets],
                  bias_spec,               # t_bias row
                  const(3, C, 2 * C),      # wd
                  const(1, 2 * C),         # bd
                  const(C, C),             # wres
                  const(1, C),             # bres
                  const(C, skip_ch),       # wskip
                  const(1, skip_ch),       # bskip
                  block_skip],             # skip accumulator (aliased)
        out_specs=(block_l, block_skip),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, C), dtype),
            jax.ShapeDtypeStruct((B, L, skip_ch), dtype),
        ),
        input_output_aliases={len(view_offsets) + 7: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the 3-view + roll temporaries sit ~0.2M over the default
            # 16M scoped-vmem budget when the call is embedded in a scan;
            # v5e has far more physical VMEM than the default budget.
            # f32 doubles every buffer, so the budget scales with
            # itemsize (capped under the 128M physical ceiling)
            vmem_limit_bytes=min(48 * jnp.dtype(dtype).itemsize // 2,
                                 112) * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *([x] * (len(view_offsets) - 1)), t_bias[:, None, :].astype(dtype),
      wd, bd[None, :], wres, bres[None, :], wskip, bskip[None, :], skip_acc)
    return x_next, skip


@functools.partial(jax.jit, static_argnames=("d1", "d2", "tile_l",
                                             "interpret"))
def fused_residual_pair(
    x: jnp.ndarray,          # (B, L, C) current hidden state (UNbiased)
    t_bias1: jnp.ndarray,    # (B, C) layer-1 timestep bias
    t_bias2: jnp.ndarray,    # (B, C) layer-2 timestep bias
    w1: Tuple[jnp.ndarray, ...],  # (wd, bd, wres, bres, wskip, bskip) layer 1
    w2: Tuple[jnp.ndarray, ...],  # same for layer 2
    skip_acc: jnp.ndarray,   # (B, L, C_skip) running skip sum
    d1: int,
    d2: int,
    tile_l: int = 1600,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TWO consecutive residual blocks in one kernel (x never leaves VMEM).

    v3 still round-trips the (L, C) state and the skip accumulator
    through HBM at every layer boundary — the dominant non-MXU cost of
    the WaveNet forward (docs/BENCH.md).  For consecutive layers whose
    combined halo fits the tile, this kernel computes layer 1 on an
    extended tile (+-halo(d2)) so layer 2's conv taps are available
    in-register, eliminating one full x write+read and one skip
    write+read per pair, for 2*halo(d2)/tile_l extra layer-1 FLOPs.

    Mechanics: ONE clamped element-offset window view of the raw x
    (length tile_l + 2*(halo(d1)+halo(d2))), ONE traced roll undoes the
    boundary clamp, then every conv tap of both layers is a *static*
    in-register slice.  Out-of-range rows are masked to exact zero per
    tap (reference zero-padding semantics, ``WaveNet.py:75-97``) and each
    layer's timestep bias is added to valid rows only; the residual adds
    the *biased* x (reference in-place quirk, ``WaveNet.py:78-84``).
    """
    B, L, C = x.shape
    assert L % tile_l == 0 and tile_l % ALIGN == 0, (L, tile_l)
    skip_ch = w1[4].shape[-1]
    dtype = x.dtype
    h2_, h1_ = _halo(d2), _halo(d1)
    htot = h1_ + h2_
    ext = tile_l + 2 * h2_       # layer-1 output rows computed per tile
    wlen = tile_l + 2 * htot     # window rows read per tile
    assert 2 * htot < tile_l, (d1, d2, tile_l)
    # clamp_start needs L - wlen >= 0; otherwise the element-offset
    # window read goes out of bounds and returns garbage (advisor r2)
    assert wlen <= L, (L, tile_l, d1, d2, wlen)

    grid = (B, L // tile_l)
    block_l = pl.BlockSpec((1, tile_l, C), lambda b, j: (b, j, 0))
    block_skip = pl.BlockSpec((1, tile_l, skip_ch), lambda b, j: (b, j, 0))
    bias_spec = pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0))
    const = lambda *s: pl.BlockSpec(s, lambda b, j: tuple(  # noqa: E731
        0 for _ in s), memory_space=pltpu.VMEM)

    def clamp_start(g):
        return jnp.minimum(jnp.maximum(g, 0), L - wlen)

    window_spec = pl.BlockSpec(
        (_Element(1), _Element(wlen), _Element(C)),
        lambda b, j: (b, pl.multiple_of(clamp_start(j * tile_l - htot),
                                        ALIGN), 0))

    def masked_tap(src, start, g0, length, bias, j):
        """src[start:start+length] with rows whose global index
        (j*tile_l + g0 + i) falls outside [0, L) zeroed, bias added to
        valid rows."""
        raw = src[start: start + length]
        row = jax.lax.broadcasted_iota(jnp.int32, (length, 1), 0)
        g = j * tile_l + g0 + row
        valid = jnp.logical_and(g >= 0, g < L)
        return jnp.where(valid, raw + bias, jnp.zeros((), dtype))

    def gated(taps, wd_ref, bd_ref):
        h = jnp.zeros((taps[0].shape[0], 2 * C), dtype=jnp.float32)
        for k in range(3):
            h = h + jnp.dot(taps[k], wd_ref[k],
                            preferred_element_type=jnp.float32)
        h = h + bd_ref[:].astype(jnp.float32)[None, :]
        return (jnp.tanh(h[:, :C])
                * jax.nn.sigmoid(h[:, C:])).astype(dtype)

    def kernel(win_ref, b1_ref, b2_ref,
               wd1_ref, bd1_ref, wres1_ref, bres1_ref, wsk1_ref, bsk1_ref,
               wd2_ref, bd2_ref, wres2_ref, bres2_ref, wsk2_ref, bsk2_ref,
               acc_ref, xout_ref, skip_ref):
        j = pl.program_id(1)
        c = j * tile_l - htot - clamp_start(j * tile_l - htot)
        # one traced roll undoes the clamp: rolled[i] = window[i + c]
        rolled = _roll_rows(win_ref[0], jnp.mod(jnp.int32(wlen) - c,
                                                jnp.int32(wlen)),
                            even_shift=True)

        bias1 = b1_ref[0, 0].astype(dtype)
        # layer 1 on the extended tile [-h2, tile_l + h2)
        taps1 = [masked_tap(rolled, htot - h2_ + k * d1 - d1,
                            -h2_ + (k - 1) * d1, ext, bias1, j)
                 for k in range(3)]
        gate1 = gated(taps1, wd1_ref, bd1_ref[0])
        res1 = jnp.dot(gate1, wres1_ref[:],
                       preferred_element_type=jnp.float32)
        x1 = ((taps1[1].astype(jnp.float32) + res1
               + bres1_ref[0].astype(jnp.float32)[None, :])
              * SQRT_HALF).astype(dtype)
        skip1 = (jnp.dot(gate1[h2_: h2_ + tile_l], wsk1_ref[:],
                         preferred_element_type=jnp.float32)
                 + bsk1_ref[0].astype(jnp.float32)[None, :])

        bias2 = b2_ref[0, 0].astype(dtype)
        # layer 2 on the output tile; taps are static slices of x1
        taps2 = [masked_tap(x1, h2_ + (k - 1) * d2, (k - 1) * d2,
                            tile_l, bias2, j)
                 for k in range(3)]
        gate2 = gated(taps2, wd2_ref, bd2_ref[0])
        res2 = jnp.dot(gate2, wres2_ref[:],
                       preferred_element_type=jnp.float32)
        xout_ref[0] = ((taps2[1].astype(jnp.float32) + res2
                        + bres2_ref[0].astype(jnp.float32)[None, :])
                       * SQRT_HALF).astype(dtype)
        skip2 = jnp.dot(gate2, wsk2_ref[:],
                        preferred_element_type=jnp.float32)
        skip_ref[0] = (acc_ref[0].astype(jnp.float32) + skip1 + skip2
                       + bsk2_ref[0].astype(jnp.float32)[None, :]).astype(
            skip_ref.dtype)

    wconsts = [const(3, C, 2 * C), const(1, 2 * C), const(C, C),
               const(1, C), const(C, skip_ch), const(1, skip_ch)]
    wd1, bd1, wres1, bres1, wskip1, bskip1 = w1
    wd2, bd2, wres2, bres2, wskip2, bskip2 = w2
    x_next, skip = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[window_spec, bias_spec, bias_spec, *wconsts, *wconsts,
                  block_skip],
        out_specs=(block_l, block_skip),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, C), dtype),
            jax.ShapeDtypeStruct((B, L, skip_ch), dtype),
        ),
        input_output_aliases={15: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # itemsize-scaled for f32 (see the v3 note above)
            vmem_limit_bytes=min(64 * jnp.dtype(dtype).itemsize // 2,
                                 112) * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, t_bias1[:, None, :].astype(dtype), t_bias2[:, None, :].astype(dtype),
      wd1, bd1[None, :], wres1, bres1[None, :], wskip1, bskip1[None, :],
      wd2, bd2[None, :], wres2, bres2[None, :], wskip2, bskip2[None, :],
      skip_acc)
    return x_next, skip


def _vmap_collapse(fn, n_row_args, out_batched=True):
    """``custom_vmap`` rule for the whole-net kernels: fold a mapped axis
    into the batch-row grid dim instead of letting vmap batch the
    ``pallas_call``.

    Pallas TPU rejects the auto-batched form of a kernel whose in/out
    blocks live in ``memory_space=ANY`` (vmap prepends a grid dim with a
    non-trivial index_map, which ANY-space blocks don't support — the
    round-5 f32 EOT bench crash).  The kernels treat batch rows
    independently (grid axis 0), so a mapped axis is semantically just
    more batch rows: the rule reshapes the first ``n_row_args``
    per-batch-row tensors from ``(E, B, ...)`` to ``(E*B, ...)``, runs
    the primal once, and unfolds every output (all outputs are
    B-leading by the kernels' contracts — do NOT use this for outputs
    reduced over B, e.g. training weight cotangents).

    Stacked weights (the remaining args) are expected unmapped
    (broadcast); if one IS mapped — per-replica parameters — fall back
    to a ``lax.map`` over the axis."""
    cfn = jax.custom_batching.custom_vmap(fn)

    @cfn.def_vmap
    def _rule(axis_size, in_batched, *args):
        if any(b for i, b in enumerate(in_batched) if i >= n_row_args):
            stacked = tuple(
                a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched))
            return jax.lax.map(lambda t: fn(*t), stacked), out_batched
        folded = []
        for i, (a, b) in enumerate(zip(args, in_batched)):
            if i < n_row_args:
                if not b:
                    a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                a = a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
            folded.append(a)
        out = fn(*folded)
        unfold = lambda o: o.reshape(
            (axis_size, o.shape[0] // axis_size) + o.shape[1:])
        return jax.tree_util.tree_map(unfold, out), out_batched

    return cfn


@functools.lru_cache(maxsize=None)
def _hbm_stack_vmappable(dilation_cycle, chunk_l, interpret,
                         gate_dtype_key, chunk_loop, w_hbm=False):
    """Per-static-config ``custom_vmap`` wrapper for the hbm_io forward
    stack (cached so repeated traces reuse one rule)."""
    gate_dtype = None if gate_dtype_key is None else jnp.dtype(
        gate_dtype_key)

    def call(x, t_biases, wd, bd, wres, bres, wskip, bskip):
        return _fused_residual_stack_jit(
            x, t_biases, wd, bd, wres, bres, wskip, bskip,
            dilation_cycle=dilation_cycle, chunk_l=chunk_l,
            interpret=interpret, gate_dtype=gate_dtype, hbm_io=True,
            chunk_loop=chunk_loop, w_hbm=w_hbm)

    return _vmap_collapse(call, n_row_args=2)


def fused_residual_stack(x, t_biases, wd, bd, wres, bres, wskip, bskip,
                         dilation_cycle: int, chunk_l: int = 2000,
                         interpret: bool = False, gate_dtype=None,
                         hbm_io: bool = False, chunk_loop: bool = False,
                         w_hbm: bool = False):
    """Dispatch shim over :func:`_fused_residual_stack_jit`: the hbm_io
    variants (memory_space=ANY in/out) go through a ``custom_vmap``
    collapse rule so an EOT/NES replica ``vmap`` folds into the batch
    grid dim instead of hitting the Pallas ANY-space batching
    restriction."""
    if not hbm_io:
        assert not w_hbm, "w_hbm requires hbm_io"
        return _fused_residual_stack_jit(
            x, t_biases, wd, bd, wres, bres, wskip, bskip,
            dilation_cycle=dilation_cycle, chunk_l=chunk_l,
            interpret=interpret, gate_dtype=gate_dtype, hbm_io=False,
            chunk_loop=chunk_loop)
    key = None if gate_dtype is None else jnp.dtype(gate_dtype).name
    fn = _hbm_stack_vmappable(dilation_cycle, chunk_l, bool(interpret),
                              key, bool(chunk_loop), bool(w_hbm))
    return fn(x, t_biases, wd, bd, wres, bres, wskip, bskip)


@functools.partial(jax.jit, static_argnames=("dilation_cycle", "chunk_l",
                                             "interpret", "gate_dtype",
                                             "hbm_io", "chunk_loop",
                                             "w_hbm"))
def _fused_residual_stack_jit(
    x: jnp.ndarray,          # (B, L, C) hidden state after init_conv
    t_biases: jnp.ndarray,   # (B, NL, C) per-layer timestep biases
    wd: jnp.ndarray,         # (NL, 3, C, 2C)
    bd: jnp.ndarray,         # (NL, 2C)
    wres: jnp.ndarray,       # (NL, C, C)
    bres: jnp.ndarray,       # (NL, C)
    wskip: jnp.ndarray,      # (NL, C, Cs)
    bskip: jnp.ndarray,      # (NL, Cs)
    dilation_cycle: int,
    chunk_l: int = 2000,
    interpret: bool = False,
    gate_dtype=None,
    hbm_io: bool = False,
    chunk_loop: bool = False,
    w_hbm: bool = False,
) -> jnp.ndarray:
    """ALL residual layers in ONE kernel — the (L, C) state never leaves
    VMEM (v5).

    ``hbm_io=True`` (v5x) keeps the audio input and the skip output in
    HBM (``memory_space=ANY``) and moves them with explicit DMAs instead
    of auto-pipelined VMEM blocks.  That removes the double-buffered
    in/out staging (~4 x L x C x itemsize bytes) from the resident
    footprint, which is what blows the 128 MB VMEM ceiling at the 1.5 s
    KWS bucket length (measured v5 OOM at L=24000: 160.59M of 128M).
    The DMA cost is one (L, C) read + one (L, Cs) write per batch row —
    a few microseconds against ~ms of MXU work, and only the c==0 /
    c==last grid steps touch it.

    v4 still writes/reads the hidden state and skip accumulator at every
    fused-group boundary.  v5e has ~128 MB of VMEM (probed:
    ``scripts/tpu_vmem_probe.py``), enough to hold one batch row's full
    16000x256 state twice (ping-pong) plus an f32 skip accumulator and a
    dilation cycle's weights.  Grid = (batch row, dilation cycle); the
    kernel body runs the cycle's layers as a *static* python loop —
    static dilations, static chunk slices, no rolls, no halo recompute.
    Margin rows around the resident buffers are zeroed once and provide
    the conv zero padding for every dilation.

    HBM traffic per batch row: x in once, skip out once, weights streamed
    once per cycle.  Returns the skip sum (B, L, Cs); the final hidden
    state is discarded (the WaveNet head only consumes the skip path,
    ref ``WaveNet.py:99-103``).  Reference semantics are those of
    v3/v4: zero conv padding beyond [0, L), bias added to valid rows,
    residual adds the *biased* x (ref in-place quirk,
    ``WaveNet.py:78-84``).
    """
    B, L, C = x.shape
    NL, _, _, C2 = wd.shape
    skip_ch = wskip.shape[-1]
    dtype = x.dtype
    assert NL % dilation_cycle == 0, (NL, dilation_cycle)
    assert L % chunk_l == 0, (L, chunk_l)
    assert not w_hbm or hbm_io, "w_hbm streams weights; requires hbm_io"
    if chunk_loop:
        # dynamic slice starts must be provably sublane-aligned (Mosaic
        # rejects unprovable dynamic offsets); i*chunk_l carries the
        # pl.multiple_of hint only when chunk_l itself is aligned
        assert chunk_l % ALIGN == 0, (chunk_l, ALIGN)
    n_cycles = NL // dilation_cycle
    margin = _halo(2 ** (dilation_cycle - 1))
    rows = margin + L + margin

    grid = (B, n_cycles)
    cyc = dilation_cycle

    def wspec(*s):
        return pl.BlockSpec((cyc, *s), lambda b, c: (c,) + (0,) * len(s),
                            memory_space=pltpu.VMEM)

    # per-layer bias rows ride as (n_cycles, cyc, dim) so the block's last
    # two dims equal the array dims (Mosaic block-shape rule)
    def bspec(dim):
        return pl.BlockSpec((1, cyc, dim), lambda b, c: (c, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(x_ref, tb_ref, wd_ref, bd_ref, wres_ref, bres_ref,
               wsk_ref, bsk_ref, out_ref, xa, xb, skip, *rest):
        c = pl.program_id(1)
        # hoisted: program_id is not lowerable inside pl.when's cond body
        # on the interpret path
        b = pl.program_id(0) if hbm_io else None
        if w_hbm:
            (wd_s, wres_s, wsk_s, sem_in, sem_out, *w_sems) = rest
            dma_sems = (sem_in, sem_out)
            get_wd = lambda j, k: wd_s[j % 2, k]
            get_wres = lambda j: wres_s[j % 2]
            get_wsk = lambda j: wsk_s[j % 2]
        else:
            dma_sems = rest
            get_wd = lambda j, k: wd_ref[j, k]
            get_wres = lambda j: wres_ref[j]
            get_wsk = lambda j: wsk_ref[j]
        # biases stay blocked-VMEM in every mode: they are ~100 KB
        # double-buffered (never the VMEM problem), and a per-cycle
        # (cyc, dim) DMA slab would violate the Mosaic sublane-aligned
        # slice rule (cyc=12 % 8 != 0 — probed round-5b)
        get_bd = lambda j: bd_ref[0, j]
        get_bres = lambda j: bres_ref[0, j]
        get_bsk = lambda j: bsk_ref[0, j]

        @pl.when(c == 0)
        def _init():
            xa[:margin] = jnp.zeros((margin, C), dtype)
            xa[margin + L:] = jnp.zeros((margin, C), dtype)
            xb[:margin] = jnp.zeros((margin, C), dtype)
            xb[margin + L:] = jnp.zeros((margin, C), dtype)
            if hbm_io:
                dma_in = pltpu.make_async_copy(
                    x_ref.at[b], xa.at[pl.ds(margin, L)], dma_sems[0])
                dma_in.start()
                dma_in.wait()
            else:
                xa[margin: margin + L] = x_ref[0]
            skip[:] = jnp.zeros((L, skip_ch), dtype)

        if w_hbm:
            def start_w(j, slot):
                """Kick the three layer-j weight DMAs into ``slot``;
                returns the copy handles for a later wait."""
                layer = c * cyc + j
                cps = [pltpu.make_async_copy(wd_ref.at[layer],
                                             wd_s.at[slot], w_sems[slot]),
                       pltpu.make_async_copy(wres_ref.at[layer],
                                             wres_s.at[slot],
                                             w_sems[2 + slot]),
                       pltpu.make_async_copy(wsk_ref.at[layer],
                                             wsk_s.at[slot],
                                             w_sems[4 + slot])]
                for cp in cps:
                    cp.start()
                return cps

            pending = start_w(0, 0)

        for j in range(cyc):
            d = 2 ** j
            cur, nxt = (xa, xb) if j % 2 == 0 else (xb, xa)
            if w_hbm:
                # land layer j's weights, then prefetch j+1 into the
                # other slot while j computes (2-slot rotation)
                for cp in pending:
                    cp.wait()
                if j + 1 < cyc:
                    pending = start_w(j + 1, (j + 1) % 2)
            bias = tb_ref[0, 0, j].astype(dtype)

            def one_chunk(s, dynamic, cur=cur, nxt=nxt, bias=bias, j=j,
                          d=d):
                """One (chunk_l, C) slab of layer j. ``s`` is a python
                int on the unrolled path, a traced i32 under chunk_loop
                (``dynamic=True``: pl.ds slices + uniform boundary mask,
                since validity can't be branched on a tracer)."""
                taps = []
                for k in range(3):
                    off = (k - 1) * d
                    if dynamic:
                        if off % ALIGN == 0:
                            sl = cur[pl.ds(margin + s + off, chunk_l)]
                        else:
                            # Mosaic needs dynamic sublane starts provably
                            # ALIGN-multiple; the +-d taps for d < ALIGN
                            # aren't. Read one aligned slab (margin and
                            # floor-aligned off keep the start a multiple
                            # of ALIGN given the s hint) and realize the
                            # residual shift as a static in-register slice.
                            off_al = (off // ALIGN) * ALIGN
                            r = off - off_al
                            ext = cur[pl.ds(margin + s + off_al,
                                            chunk_l + ALIGN)]
                            sl = ext[r:r + chunk_l]
                    else:
                        sl = cur[margin + s + off:
                                 margin + s + off + chunk_l]
                    if not dynamic and (0 <= s + off
                                        and s + off + chunk_l <= L):
                        taps.append(sl + bias)
                    else:
                        # boundary rows: margin rows are zero (conv
                        # padding); keep them bias-free
                        row = jax.lax.broadcasted_iota(
                            jnp.int32, (chunk_l, 1), 0)
                        g = s + off + row
                        valid = jnp.logical_and(g >= 0, g < L)
                        taps.append(jnp.where(valid, sl + bias,
                                              jnp.zeros((), dtype)))
                h = jnp.zeros((chunk_l, C2), dtype=jnp.float32)
                for k in range(3):
                    h = h + jnp.dot(taps[k], get_wd(j, k),
                                    preferred_element_type=jnp.float32)
                h = h + get_bd(j).astype(jnp.float32)[None, :]
                # gate_dtype=bf16 trades ~input-rounding error in the
                # transcendentals for VPU throughput (perf experiment
                # knob; None = f32, the parity default). sigmoid is
                # expressed via tanh: Mosaic's bf16 logistic lowering
                # trips an f32->bf16 vector.broadcast verification bug.
                if gate_dtype is None or gate_dtype == jnp.float32:
                    gate = (jnp.tanh(h[:, :C])
                            * jax.nn.sigmoid(h[:, C:])).astype(dtype)
                else:
                    hg = h.astype(gate_dtype)
                    sig = jnp.tanh(hg[:, C:] * gate_dtype(0.5)) \
                        * gate_dtype(0.5) + gate_dtype(0.5)
                    gate = (jnp.tanh(hg[:, :C]) * sig).astype(dtype)
                res = jnp.dot(gate, get_wres(j),
                              preferred_element_type=jnp.float32)
                nxt_val = ((taps[1].astype(jnp.float32) + res
                            + get_bres(j).astype(jnp.float32)[None, :])
                           * SQRT_HALF).astype(dtype)
                # skip rides bf16 like the v3/v4 HBM accumulator (each
                # layer's contribution still f32-accumulated in the dot)
                sk_prev = (skip[pl.ds(s, chunk_l)] if dynamic
                           else skip[s: s + chunk_l])
                sk_val = (sk_prev.astype(jnp.float32)
                          + jnp.dot(gate, get_wsk(j),
                                    preferred_element_type=jnp.float32)
                          + get_bsk(j).astype(jnp.float32)[None, :]
                          ).astype(dtype)
                if dynamic:
                    nxt[pl.ds(margin + s, chunk_l)] = nxt_val
                    skip[pl.ds(s, chunk_l)] = sk_val
                else:
                    nxt[margin + s: margin + s + chunk_l] = nxt_val
                    skip[s: s + chunk_l] = sk_val

            if chunk_loop:
                # one compiled body instead of L/chunk_l unrolled copies:
                # bounds register pressure (the unrolled f32 body spills
                # ~50 MB of vregs to VMEM and blows the ceiling, round-4h
                # OOM dump); weights re-read from the VMEM window per
                # iteration
                def body(i, carry):
                    one_chunk(pl.multiple_of(i * chunk_l, ALIGN),
                              dynamic=True)
                    return carry
                jax.lax.fori_loop(0, L // chunk_l, body, 0)
            else:
                for s in range(0, L, chunk_l):
                    one_chunk(s, dynamic=False)
        if cyc % 2 == 1:
            # odd cycle length: bring the state back to xa for the next
            # grid step (one VMEM copy per cycle)
            xa[margin: margin + L] = xb[margin: margin + L]

        @pl.when(c == n_cycles - 1)
        def _out():
            if hbm_io:
                dma_out = pltpu.make_async_copy(
                    skip, out_ref.at[b], dma_sems[1])
                dma_out.start()
                dma_out.wait()
            else:
                out_ref[0] = skip[:].astype(out_ref.dtype)

    if hbm_io:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        sem_scratch = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        x_spec = pl.BlockSpec((1, L, C), lambda b, c: (b, 0, 0))
        out_spec = pl.BlockSpec((1, L, skip_ch), lambda b, c: (b, 0, 0))
        sem_scratch = []

    if w_hbm:
        # the three BIG weight arrays stay in HBM (ANY) and stream
        # through 2-slot VMEM scratch: ~4 MB resident instead of the
        # ~2x13 MB (bf16) / ~2x25 MB (f32) double-buffered cycle
        # windows — what rescues the f32 long-L fit (round-5b). Biases
        # keep their blocked specs (tiny + the Mosaic sublane-aligned
        # DMA-slice rule rejects (cyc=12, dim) slabs).
        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        weight_specs = [any_spec, bspec(C2), any_spec, bspec(C),
                        any_spec, bspec(skip_ch)]
        w_scratch = [
            pltpu.VMEM((2, 3, C, C2), wd.dtype),        # wd slots
            pltpu.VMEM((2, C, C), wres.dtype),          # wres slots
            pltpu.VMEM((2, C, skip_ch), wskip.dtype),   # wskip slots
        ]
        sem_scratch = sem_scratch + [pltpu.SemaphoreType.DMA] * 6
    else:
        weight_specs = [wspec(3, C, C2), bspec(C2), wspec(C, C),
                        bspec(C), wspec(C, skip_ch), bspec(skip_ch)]
        w_scratch = []

    skip_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,                                                 # x
            # (B, n_cycles, cyc, C): the Mosaic block-shape rule needs the
            # last two block dims to equal the array dims
            pl.BlockSpec((1, 1, cyc, C), lambda b, c: (b, c, 0, 0)),
            *weight_specs,
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, skip_ch), dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, C), dtype),           # xa
            pltpu.VMEM((rows, C), dtype),           # xb
            pltpu.VMEM((L, skip_ch), dtype),        # skip accumulator
            *w_scratch,
            *sem_scratch,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # w_hbm exists to fit the 128 MB ceiling with a ~4 MB weight
            # working set; don't re-impose a 120 MB cap on it (the
            # L=32000 f32 resident estimate is ~121 MB)
            vmem_limit_bytes=(127 if w_hbm else 120) * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, t_biases.reshape(B, n_cycles, cyc, C), wd,
      bd.reshape(n_cycles, cyc, C2), wres, bres.reshape(n_cycles, cyc, C),
      wskip, bskip.reshape(n_cycles, cyc, skip_ch))
    return skip_out


def v5_vmem_est_mb(L: int, itemsize: int, c_res: int = 256,
                   skip_ch: int = 256) -> float:
    """Resident-footprint estimate of the v5 whole-net kernel, calibrated
    at L=16000 bf16 256ch (~104 MB state/blocks + ~13 MB cycle weights).
    The state/blocks term scales linearly with total channels; the cycle
    weights (3*C*2C + C*C + C*Cs per layer) scale quadratically — scaling
    both linearly under-counts weights above 256 channels (ADVICE r4)."""
    ch_lin = (c_res + skip_ch) / 512.0
    ch_quad = (c_res * (7 * c_res + skip_ch)) / (256.0 * (7 * 256 + 256))
    return (104.0 * L / 16000.0 * ch_lin + 13.0 * ch_quad) \
        * (itemsize / 2.0)


def v5x_vmem_est_mb(L: int, itemsize: int, C: int = 256,
                    skip_ch: int = 256, cyc: int = 12,
                    chunk_l: int = 4000) -> float:
    """Resident-footprint estimate for the hbm_io (v5x) whole-net kernel:
    the v5 set minus the double-buffered (L, C)/(L, Cs) in/out staging
    blocks.  Components: ping-pong state, skip accumulator, double-
    buffered cycle weights, plus the per-chunk live set (f32 h, taps) and
    a Mosaic padding/alignment allowance (the same ~1.35x slack observed
    between the analytic v5 sum and its measured on-chip footprint)."""
    margin = _halo(2 ** (cyc - 1))
    mb = 1.0 / (1024 * 1024)
    state = 2 * (L + 2 * margin) * C * itemsize * mb
    skip = L * skip_ch * itemsize * mb
    weights = 2 * cyc * (3 * C * 2 * C + C * C + C * skip_ch) \
        * itemsize * mb
    live = (chunk_l * 2 * C * 4 + 3 * chunk_l * C * itemsize) * mb
    return (state + skip + weights + live) * 1.35


def forward_dispatch_band(L: int, itemsize: int, *, c_res: int = 256,
                          skip_ch: int = 256, cyc: int = 12,
                          chunk_l=None):
    """The ``wavenet_forward_pallas`` VMEM dispatch decision, shared by
    the dispatcher and its regression test (tests/test_pallas_kernel.py
    pins the bands so estimate drift can't silently change dispatch).

    Returns ``(mode, chunk)`` with mode in {'resident', 'hbm_io',
    'chunk_loop', 'v4'}; chunk is the fori-loop length-chunk for the
    chunk_loop rescue (None otherwise).

    Bands: the layer-resident state scales with L and element size
    (ping-pong (2*margin+L, C) + skip + in/out blocks ~= 104 MB at
    L=16000 bf16, plus ~13 MB cycle weights). Longer audio (e.g. the
    1.5 s KWS buckets) blows the 128 MB ceiling — measured OOM: "Used
    160.59M of 128.00M" at L=24000 bf16. First resort: v5x (hbm_io)
    drops the double-buffered in/out staging from the resident set,
    which covers the KWS bucket lengths at bf16. Second resort (f32):
    v5x + chunk_loop — the fori_loop chunk body bounds the register-
    spill slots that OOMed the unrolled v5x f32 at L=16000 (round-4h:
    156.7M of 128M, ~50M of spills; chunk_loop measured FIT at
    chunk<=2000 and 1.22-1.25x the v4 fallback, 82.4% of bf16 peak at
    b16 — round-4i). The chunk_loop fit is measurement-gated to
    f32 / L<=16000 / chunk<=2000 at <=256 channels (chunk 4000 still
    OOMs at 139.5M); its L boundary is measured on BOTH sides: fits +
    1.22x v4 at L=16000 (round-4i), OOM 143.55M of 128M at L=24000 at
    every chunk size (round-5a).  Third resort (f32 long audio):
    w_hbm — chunk_loop with the three big per-layer weight arrays
    streamed from HBM through a 2-slot DMA rotation, removing the
    36.0M double-buffered cycle-weight slab (the one resident term
    that does not scale with L).  Measured (round-5b/5c): FIT +
    74.6/76.2% of bf16 peak at L=24000/32000 b4 (1.24x the v4
    fallback's 60.3-61.4%), 86.4% at L=32000 b16 (1.26x v4's 68.8%),
    bit-exact vs v4; OOM 133.93M at L=36000 and 145.65M at L=40000 —
    the gate is L<=32000, measured on both sides.  bf16 keeps the
    unrolled body everywhere it fits (chunk_loop measured +1.5% at
    bf16 b4 — round-4i); w_hbm is measurement-gated to f32 like
    chunk_loop (at bf16 the hbm_io band already covers the KWS bucket
    lengths)."""
    if v5_vmem_est_mb(L, itemsize, c_res=c_res, skip_ch=skip_ch) \
            <= 118.0:
        return "resident", None
    if v5x_vmem_est_mb(L, itemsize, C=c_res, skip_ch=skip_ch, cyc=cyc,
                       chunk_l=pick_stack_chunk(L, chunk_l)) <= 118.0:
        return "hbm_io", None
    loop_chunk = next((c for c in (2000, 1600, 800) if L % c == 0),
                      None)
    # chunk_loop fit is measurement-gated: the register-spill reduction
    # was probed at cyc=12 only — a larger dilation_cycle means a bigger
    # halo margin and 2x-per-cycle weights, an unmeasured fit (ADVICE r4)
    if (itemsize == 4 and L <= 16000 and c_res <= 256
            and skip_ch <= 256 and cyc <= 12 and loop_chunk is not None
            and chunk_l is None):
        return "chunk_loop", loop_chunk
    # w_hbm rescue band (f32 long audio): same measurement gates as
    # chunk_loop, L<=32000 pinned on both sides (fits 76.2-86.4% of
    # peak at 32000, OOM 133.93M of 128M at 36000 — round-5b/5c)
    if (itemsize == 4 and L <= 32000 and c_res <= 256
            and skip_ch <= 256 and cyc <= 12 and loop_chunk is not None
            and chunk_l is None):
        return "whbm", loop_chunk
    return "v4", None


def wavenet_stem(p, audio, diffusion_steps, embed_dim_in, dtype):
    """Shared pre-stack stages: timestep-embedding MLP (swish x2, ref
    ``WaveNet.py:60-66``) and the 1x1 init conv + relu. Returns
    (emb (B, 512), h (B, L, C))."""
    from audiopure_tpu.diffusion.schedule import diffusion_step_embedding

    x = jnp.swapaxes(audio, 1, 2).astype(dtype)  # (B, L, 1)
    emb = diffusion_step_embedding(diffusion_steps, embed_dim_in)
    emb = emb @ p["fc_t1"]["kernel"] + p["fc_t1"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    emb = emb @ p["fc_t2"]["kernel"] + p["fc_t2"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    h = jax.nn.relu(
        jnp.einsum("blc,kco->blo", x,
                   p["init_conv"]["kernel"].astype(dtype))
        + p["init_conv"]["bias"].astype(dtype))
    return emb, h


def wavenet_stack_inputs(p, emb, num_res_layers, dtype):
    """Per-layer weights stacked on a leading layer axis for the
    whole-net kernels: (t_biases (B, NL, C), wd, bd, wres, bres, wskip,
    bskip)."""
    blocks = [p[f"res_block_{n}"] for n in range(num_res_layers)]
    t_biases = jnp.stack(
        [(emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]) for bp in
         blocks], axis=1).astype(dtype)
    stack = lambda f: jnp.stack([f(bp) for bp in blocks])
    return (t_biases,
            stack(lambda bp: bp["dilated_conv"]["kernel"].astype(dtype)),
            stack(lambda bp: bp["dilated_conv"]["bias"]),
            stack(lambda bp: bp["res_conv"]["kernel"][0].astype(dtype)),
            stack(lambda bp: bp["res_conv"]["bias"]),
            stack(lambda bp: bp["skip_conv"]["kernel"][0].astype(dtype)),
            stack(lambda bp: bp["skip_conv"]["bias"]))


def wavenet_head(p, skip_sum, num_res_layers):
    """Shared post-stack head: skip scaling + the two final 1x1 convs
    (ref ``WaveNet.py:99-103``). Returns (B, C_out, L) float32."""
    out = skip_sum.astype(jnp.float32) * math.sqrt(1.0 / num_res_layers)
    out = jax.nn.relu(
        jnp.einsum("blc,kco->blo", out, p["final_conv1"]["kernel"])
        + p["final_conv1"]["bias"])
    out = (jnp.einsum("blc,kco->blo", out, p["final_conv2"]["kernel"])
           + p["final_conv2"]["bias"])
    return jnp.swapaxes(out, 1, 2)


_STACK_CHUNKS = (4000, 2000, 2048, 1600, 1024, 1000, 800, 512,
                 400, 256, 128)


def pick_stack_chunk(L: int, chunk_l=None, prefer=_STACK_CHUNKS) -> int:
    """The whole-net kernels' length-chunk: explicit override or the
    first preferred divisor of L (4000 measured 88.0% vs 2000's 87.7%
    of bf16 peak; the save_h grad forward prefers 2000 — its staging
    buffers ride the tighter VMEM budget)."""
    return chunk_l or next(c for c in (*prefer, L) if L % c == 0)


def wavenet_forward_pallas(params, audio, diffusion_steps, *,
                           num_res_layers: int = 36,
                           dilation_cycle: int = 12,
                           embed_dim_in: int = 128,
                           dtype=jnp.bfloat16,
                           tile_l: int = 1600,
                           block_impl: str = "v5",
                           interpret: bool = False,
                           gate_dtype=None,
                           chunk_l=None) -> jnp.ndarray:
    """Full WaveNet forward using the fused block for every residual layer.

    Takes the SAME flax param tree as ``models.wavenet.WaveNet`` (both conv
    impls), so checkpoints and the XLA path interchange freely.
    """
    p = params["params"]
    emb, h = wavenet_stem(p, audio, diffusion_steps, embed_dim_in, dtype)
    skip_ch = p["res_block_0"]["skip_conv"]["kernel"].shape[-1]
    L = h.shape[1]

    hbm_io = False
    chunk_loop = False
    w_hbm = False
    if block_impl == "v5" and num_res_layers % dilation_cycle == 0:
        skip_ch = p["res_block_0"]["skip_conv"]["kernel"].shape[-1]
        c_res = p["res_block_0"]["res_conv"]["kernel"].shape[-2]
        mode, loop_chunk = forward_dispatch_band(
            L, jnp.dtype(dtype).itemsize, c_res=c_res, skip_ch=skip_ch,
            cyc=dilation_cycle, chunk_l=chunk_l)
        if mode == "hbm_io":
            hbm_io = True
        elif mode == "chunk_loop":
            hbm_io = True
            chunk_loop = True
            chunk_l = loop_chunk
        elif mode == "whbm":
            hbm_io = True
            chunk_loop = True
            w_hbm = True
            chunk_l = loop_chunk
        elif mode == "v4":
            block_impl = "v4"
    if block_impl == "v5" and num_res_layers % dilation_cycle == 0:
        # bf16 gate transcendentals by default under bf16 compute: on-chip
        # 87.7% vs 84.0% of bf16 peak, numerics at the same bf16-rounding
        # level as the f32 gate (max|.-xla_bf16| 4.2e-3 vs 4.1e-3 on
        # scale 0.099); f32 compute keeps f32 gates (parity tests)
        if gate_dtype is None and dtype == jnp.bfloat16:
            gate_dtype = jnp.bfloat16
        stack_in = wavenet_stack_inputs(p, emb, num_res_layers, dtype)
        skip_sum = fused_residual_stack(
            h, *stack_in, dilation_cycle=dilation_cycle,
            chunk_l=chunk_l if chunk_loop else pick_stack_chunk(L, chunk_l),
            interpret=interpret, gate_dtype=gate_dtype, hbm_io=hbm_io,
            chunk_loop=chunk_loop, w_hbm=w_hbm)
        return wavenet_head(p, skip_sum, num_res_layers)

    skip_sum = jnp.zeros((h.shape[0], h.shape[1], skip_ch), dtype=dtype)
    block = fused_residual_block if block_impl == "v2" \
        else fused_residual_block_v3

    def layer_weights(n):
        bp = p[f"res_block_{n}"]
        t_bias = (emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]).astype(
            dtype)
        return t_bias, (bp["dilated_conv"]["kernel"].astype(dtype),
                        bp["dilated_conv"]["bias"],
                        bp["res_conv"]["kernel"][0].astype(dtype),
                        bp["res_conv"]["bias"],
                        bp["skip_conv"]["kernel"][0].astype(dtype),
                        bp["skip_conv"]["bias"])

    def pair_tile(d1, d2):
        """Tile for the fused pair, or None when pairing loses: the
        extended layer-1 tile must cost <= ~1/3 extra rows (2*halo(d2)
        <= tile/3), upgrading to a double tile for medium dilations."""
        for tl in (tile_l, 2 * tile_l):
            if (L % tl == 0 and 2 * _halo(d2) <= tl // 3
                    and 2 * (_halo(d1) + _halo(d2)) < tl
                    # window (tl + 2*halos) must fit inside L, else the
                    # clamped element-offset read is out of bounds
                    and tl + 2 * (_halo(d1) + _halo(d2)) <= L):
                return tl
        return None

    n = 0
    while n < num_res_layers:
        d = 2 ** (n % dilation_cycle)
        d_next = 2 ** ((n + 1) % dilation_cycle)
        # v4: fuse consecutive-layer pairs whose combined halo fits the
        # tile cheaply (saves the layer-boundary HBM round trip of x+skip)
        tl = pair_tile(d, d_next) if (block_impl in ("v4", "v5")
                                      and n + 1 < num_res_layers
                                      and d_next == 2 * d) else None
        if tl is not None:
            tb1, w1 = layer_weights(n)
            tb2, w2 = layer_weights(n + 1)
            h, skip_sum = fused_residual_pair(
                h, tb1, tb2, w1, w2, skip_sum, d1=d, d2=d_next,
                tile_l=tl, interpret=interpret)
            n += 2
            continue
        t_bias, w = layer_weights(n)
        h, skip_sum = block(h, t_bias, *w, skip_sum, dilation=d,
                            tile_l=tile_l, interpret=interpret)
        n += 1

    return wavenet_head(p, skip_sum, num_res_layers)  # (B, C_out, L)
