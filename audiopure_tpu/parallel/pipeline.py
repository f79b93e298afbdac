"""Pipeline parallelism: WaveNet stages across chips, GPipe-style.

The reference has no pipeline parallelism (SURVEY.md §2.8). Here the
36-block WaveNet splits into S stages of ``dilation_cycle`` blocks each —
because dilations repeat with period ``dilation_cycle`` (``WaveNet.py:
113-118``), every stage has an *identical* structure, so one SPMD program
(shard_map over a ``pp`` mesh axis) runs all stages: each device holds its
stage's stacked block params, processes the microbatch currently at its
stage, and ``ppermute``s the activation + running skip-sum to the next
stage. M microbatches flow through an (M + S - 1)-step schedule.

This is eval/forward pipelining (the purifier's inner WaveNet is the
framework's hot op); training pipelining would add the reverse schedule.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from audiopure_tpu.diffusion.schedule import diffusion_step_embedding


def stack_wavenet_stages(params: Dict[str, Any], num_stages: int,
                         num_res_layers: int = 36) -> Dict[str, Any]:
    """Regroup flat ``res_block_{n}`` params into per-stage stacks.

    Returns a dict ``block_{j} -> pytree with leading stage axis`` for
    j in [0, layers_per_stage).
    """
    assert num_res_layers % num_stages == 0
    per = num_res_layers // num_stages
    p = params["params"]
    stacked = {}
    for j in range(per):
        blocks = [p[f"res_block_{s * per + j}"] for s in range(num_stages)]
        stacked[f"block_{j}"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *blocks)
    return stacked


def _stage_forward(stage_params, h, emb, dilations, res_ch):
    """Apply one stage's blocks; returns (h, stage skip sum)."""
    skip = 0.0
    for j, d in enumerate(dilations):
        bp = jax.tree_util.tree_map(lambda x: x, stage_params[f"block_{j}"])
        t_bias = emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]
        hb = h + t_bias[:, None, :]
        L = hb.shape[1]
        xp = jnp.pad(hb, ((0, 0), (d, d), (0, 0)))
        k = bp["dilated_conv"]["kernel"]
        y = (xp[:, :L] @ k[0] + xp[:, d: d + L] @ k[1]
             + xp[:, 2 * d: 2 * d + L] @ k[2]) + bp["dilated_conv"]["bias"]
        gate = jnp.tanh(y[..., :res_ch]) * jax.nn.sigmoid(y[..., res_ch:])
        res = gate @ bp["res_conv"]["kernel"][0] + bp["res_conv"]["bias"]
        # reference residual uses the *biased* x (in-place quirk,
        # ref WaveNet.py:78-97) — hb, not h
        h = (hb + res) * math.sqrt(0.5)
        skip = skip + gate @ bp["skip_conv"]["kernel"][0] \
            + bp["skip_conv"]["bias"]
    return h, skip


def wavenet_forward_pp(params, audio, diffusion_steps, mesh: Mesh,
                       axis: str = "pp", num_microbatches: int = 2,
                       num_res_layers: int = 36, dilation_cycle: int = 12,
                       embed_dim_in: int = 128):
    """Pipeline-parallel WaveNet forward.

    audio (B, 1, L) replicated; B must divide into ``num_microbatches``.
    Stage count = mesh size on ``axis``; must divide ``num_res_layers``
    with a whole number of dilation cycles per stage so all stages share
    one dilation pattern.
    """
    S = mesh.shape[axis]
    per = num_res_layers // S
    assert per * S == num_res_layers
    assert per % dilation_cycle == 0 or dilation_cycle % per == 0 or \
        per == dilation_cycle, (
            "stage size must align with the dilation cycle so stages are "
            "structurally identical")
    dilations = [2 ** (j % dilation_cycle) for j in range(per)]

    B, _, L = audio.shape
    M = num_microbatches
    assert B % M == 0
    mb = B // M

    p = params["params"]
    stage_stacked = stack_wavenet_stages(params, S, num_res_layers)
    shared = {k: p[k] for k in ("fc_t1", "fc_t2", "init_conv",
                                "final_conv1", "final_conv2")}
    res_ch = p["init_conv"]["kernel"].shape[-1]

    x_mb = jnp.swapaxes(audio, 1, 2).reshape(M, mb, L, 1)
    steps_mb = diffusion_steps.reshape(M, mb, 1)

    def local_fn(stage_p, shared_p, x_mb, steps_mb):
        # stage_p leaves have leading stage axis sharded to size 1
        stage_p = jax.tree_util.tree_map(lambda x: x[0], stage_p)
        s = lax.axis_index(axis)

        def emb_of(steps):
            e = diffusion_step_embedding(steps, embed_dim_in)
            e = e @ shared_p["fc_t1"]["kernel"] + shared_p["fc_t1"]["bias"]
            e = e * jax.nn.sigmoid(e)
            e = e @ shared_p["fc_t2"]["kernel"] + shared_p["fc_t2"]["bias"]
            return e * jax.nn.sigmoid(e)

        fwd_perm = [(i, i + 1) for i in range(S - 1)]

        def step(carry, t):
            act_in, skip_in, outputs = carry
            m = t - s
            m_safe = jnp.clip(m, 0, M - 1)
            x_cur = x_mb[m_safe]
            emb = emb_of(steps_mb[m_safe])

            h0 = jax.nn.relu(
                jnp.einsum("blc,kco->blo", x_cur,
                           shared_p["init_conv"]["kernel"])
                + shared_p["init_conv"]["bias"])
            h_in = jnp.where(s == 0, h0, act_in)
            skip_prev = jnp.where(s == 0, 0.0, skip_in)

            h_out, skip_stage = _stage_forward(stage_p, h_in, emb,
                                               dilations, res_ch)
            skip_total = skip_prev + skip_stage

            # last stage: head + write the finished microbatch
            out_sum = skip_total * math.sqrt(1.0 / num_res_layers)
            out = jax.nn.relu(
                jnp.einsum("blc,kco->blo", out_sum,
                           shared_p["final_conv1"]["kernel"])
                + shared_p["final_conv1"]["bias"])
            out = (jnp.einsum("blc,kco->blo", out,
                              shared_p["final_conv2"]["kernel"])
                   + shared_p["final_conv2"]["bias"])
            is_last = s == S - 1
            active = jnp.logical_and(m >= 0, m < M)
            write = jnp.logical_and(is_last, active)
            outputs = outputs.at[m_safe].set(
                jnp.where(write, out, outputs[m_safe]))

            act_next = lax.ppermute(h_out, axis, fwd_perm)
            skip_next = lax.ppermute(skip_total, axis, fwd_perm)
            return (act_next, skip_next, outputs), None

        zeros_act = jnp.zeros((mb, L, res_ch), dtype=audio.dtype)
        skip_ch = shared_p["final_conv1"]["kernel"].shape[1]
        zeros_skip = jnp.zeros((mb, L, skip_ch), dtype=audio.dtype)
        out_ch = shared_p["final_conv2"]["kernel"].shape[-1]
        outputs0 = jnp.zeros((M, mb, L, out_ch), dtype=audio.dtype)

        (_, _, outputs), _ = lax.scan(
            step, (zeros_act, zeros_skip, outputs0),
            jnp.arange(M + S - 1))
        # only the last stage holds real outputs; share them
        outputs = jnp.where(s == S - 1, outputs, 0.0)
        return lax.psum(outputs, axis)

    stage_specs = jax.tree_util.tree_map(lambda _: P(axis), stage_stacked)
    out = shard_map(
        local_fn, mesh=mesh,
        in_specs=(stage_specs, P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )(stage_stacked, shared, x_mb, steps_mb)
    # (M, mb, L, out_ch) -> (B, out_ch, L)
    out = out.reshape(M * mb, L, -1)
    return jnp.swapaxes(out, 1, 2)
