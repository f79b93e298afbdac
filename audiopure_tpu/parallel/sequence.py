"""Sequence parallelism: waveforms sharded across chips with halo exchange.

The reference has no sequence/context parallelism (SURVEY.md §5: sequences
are 1 s x 16 kHz); its only sequence-scaling mechanism is the WaveNet
dilation schedule. The idiomatic TPU lever for longer audio is to split the
waveform across chips and exchange dilation-width halos between neighbors
for the k=3 dilated convs (SURVEY.md §5 "long-context").

Implementation: ``shard_map`` over an ``sp`` mesh axis; each device holds
(B, L/sp, C); every dilated conv pulls ``d`` boundary samples from each
neighbor with ``lax.ppermute`` (non-cyclic perms — missing neighbors read
as zeros, which IS the conv's zero padding at the sequence edges). The
collectives ride ICI; no gather of the full sequence ever materializes.

Constraint: every dilation must satisfy ``d <= L/sp`` (halo from at most
one neighbor). For the standard 36x2^(n%12) net, L=16000 supports sp<=4;
longer audio supports proportionally more chips.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from audiopure_tpu.diffusion.schedule import diffusion_step_embedding


def halo_exchange(x_local: jnp.ndarray, halo: int, axis_name: str
                  ) -> jnp.ndarray:
    """(B, L_loc, C) -> (B, L_loc + 2*halo, C) with neighbor halos.

    Edge devices receive zeros (ppermute semantics == zero conv padding).
    """
    n = lax.axis_size(axis_name)
    left_send = x_local[:, -halo:, :]   # my right edge -> right neighbor
    right_send = x_local[:, :halo, :]   # my left edge -> left neighbor
    from_left = lax.ppermute(left_send, axis_name,
                             perm=[(i, i + 1) for i in range(n - 1)])
    from_right = lax.ppermute(right_send, axis_name,
                              perm=[(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x_local, from_right], axis=1)


def _halo_dilated_conv(x_local, kernel, bias, dilation, axis_name):
    """k=3 dilated conv over the sp-sharded length axis."""
    L_loc = x_local.shape[1]
    assert dilation <= L_loc, (
        f"dilation {dilation} exceeds local length {L_loc}; use fewer sp "
        f"shards or longer audio")
    xp = halo_exchange(x_local, dilation, axis_name)
    k0, k1, k2 = kernel[0], kernel[1], kernel[2]
    y = (xp[:, :L_loc] @ k0
         + xp[:, dilation: dilation + L_loc] @ k1
         + xp[:, 2 * dilation: 2 * dilation + L_loc] @ k2)
    return y + bias


def _wavenet_sp_local(params: Dict[str, Any], x_local: jnp.ndarray,
                      steps: jnp.ndarray, *, num_res_layers: int,
                      dilation_cycle: int, embed_dim_in: int,
                      axis_name: str) -> jnp.ndarray:
    """Per-shard WaveNet forward; x_local: (B, L_loc, 1)."""
    p = params["params"]

    emb = diffusion_step_embedding(steps, embed_dim_in)
    emb = emb @ p["fc_t1"]["kernel"] + p["fc_t1"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    emb = emb @ p["fc_t2"]["kernel"] + p["fc_t2"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)

    h = jax.nn.relu(
        jnp.einsum("blc,kco->blo", x_local, p["init_conv"]["kernel"])
        + p["init_conv"]["bias"])

    C = h.shape[-1]
    skip_sum = 0.0
    for n in range(num_res_layers):
        bp = p[f"res_block_{n}"]
        t_bias = emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]
        hb = h + t_bias[:, None, :]
        y = _halo_dilated_conv(hb, bp["dilated_conv"]["kernel"],
                               bp["dilated_conv"]["bias"],
                               2 ** (n % dilation_cycle), axis_name)
        gate = jnp.tanh(y[..., :C]) * jax.nn.sigmoid(y[..., C:])
        res = gate @ bp["res_conv"]["kernel"][0] + bp["res_conv"]["bias"]
        # reference residual uses the *biased* x (in-place quirk,
        # ref WaveNet.py:78-97) — hb, not h
        h = (hb + res) * math.sqrt(0.5)
        skip_sum = skip_sum + gate @ bp["skip_conv"]["kernel"][0] \
            + bp["skip_conv"]["bias"]

    out = skip_sum * math.sqrt(1.0 / num_res_layers)
    out = jax.nn.relu(
        jnp.einsum("blc,kco->blo", out, p["final_conv1"]["kernel"])
        + p["final_conv1"]["bias"])
    out = (jnp.einsum("blc,kco->blo", out, p["final_conv2"]["kernel"])
           + p["final_conv2"]["bias"])
    return out


def wavenet_forward_sp(params, audio, diffusion_steps, mesh: Mesh,
                       axis: str = "sp", num_res_layers: int = 36,
                       dilation_cycle: int = 12,
                       embed_dim_in: int = 128):
    """Sequence-parallel WaveNet forward.

    audio (B, 1, L) sharded along L over the ``axis`` mesh dimension; same
    flax param tree as ``models.wavenet.WaveNet`` (replicated). Returns
    (B, 1, L) sharded the same way.
    """
    def local_fn(p, x, t):
        out = _wavenet_sp_local(
            p, jnp.swapaxes(x, 1, 2), t,
            num_res_layers=num_res_layers, dilation_cycle=dilation_cycle,
            embed_dim_in=embed_dim_in, axis_name=axis)
        return jnp.swapaxes(out, 1, 2)

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, None, axis), P()),
        out_specs=P(None, None, axis),
        check_rep=False,
    )(params, audio, diffusion_steps)
