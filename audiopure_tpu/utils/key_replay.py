"""Host-side replay of the attack stack's PRNG-key derivation.

The EOT-PGD programs (``attacks/pgd.py`` + ``attacks/eot.py`` +
``diffusion/vpsde.py``) derive every purification-noise draw
deterministically from the top-level key by a fixed tree of
``jax.random.split`` calls. This module replays that tree OUTSIDE the
compiled program, yielding the exact noise arrays each purify call will
draw, in the order the REFERENCE attack loop consumes stochasticity
(``white_box_attack.py:384-435`` + ``_EOT.py:29-63``: per iteration the
defense stack's replicas, then the attack stack's replicas; finally the
trailing prediction stack at ``i == max_iter_1``).

Purpose: checkpoint-level robust-accuracy parity runs
(``scripts/widen_parity.py``, ``tests/test_ref_attack_parity.py``) feed
these arrays to the torch reference loop as an injected-noise FIFO, so
the reference and this framework's jitted attack program see IDENTICAL
stochasticity and their PGD trajectories can be compared to float
tolerance. The split tree here must stay in lockstep with the attack
implementation — the tiny-config trajectory test pins that.

Key tree being replayed:

- ``AudioAttack.generate``: ``k1, _ = split(key)``; stage 1 gets ``k1``.
- ``_stage_1_impl``: ``keys = split(k1, max_iter_1 + 1)``.
- iteration ``i``: ``k_def, k_atk = split(keys[i])``;
  - ``share_eot``: ONE stack keyed ``k_atk`` serves prediction and
    gradient (matches the reference's ``eot_size == 1`` path, which
    reuses the prediction forward's graph for ``loss.backward()``);
  - otherwise: prediction stack ``split(k_def, R_def)`` then attack
    stack ``split(k_atk, R_atk)``.
- trailing pass: prediction stack ``split(keys[-1], R_def)``.
- per purify call (``RevDiffWave.purify_once``, ``sample_step == 1``):
  ``k_noise, k_sde, _ = split(k, 3)``; q-jump noise
  ``e = normal(k_noise, shape)``; Euler-step noises
  ``z_j = normal(split(k_sde, t)[j], shape)`` for ``j < t``.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def purify_noise(key: jax.Array, shape: Tuple[int, ...], t: int,
                 dtype=jnp.float32) -> List[np.ndarray]:
    """The ``t + 1`` noise arrays one ``RevDiffWave.purify_once`` call
    keyed ``key`` draws: ``[e, z_0, ..., z_{t-1}]``."""
    k_noise, k_sde, _ = jax.random.split(key, 3)
    out = [np.asarray(jax.random.normal(k_noise, shape, dtype=dtype))]
    for kk in jax.random.split(k_sde, t):
        out.append(np.asarray(jax.random.normal(kk, shape, dtype=dtype)))
    return out


def stage1_purify_keys(key: jax.Array, *, max_iter_1: int,
                       eot_defense_size: int = 1,
                       eot_attack_size: int = 1,
                       share_eot: bool = False) -> List[jax.Array]:
    """Per-purify-call keys of one ``AudioAttack`` stage-1 run, in the
    reference consumption order (defense replicas, then attack replicas,
    per iteration; trailing defense stack last)."""
    k1, _ = jax.random.split(key)
    keys = jax.random.split(k1, max_iter_1 + 1)
    calls: List[jax.Array] = []
    for i in range(max_iter_1):
        k_def, k_atk = jax.random.split(keys[i])
        if share_eot:
            calls.extend(jax.random.split(k_atk, eot_attack_size))
        else:
            calls.extend(jax.random.split(k_def, eot_defense_size))
            calls.extend(jax.random.split(k_atk, eot_attack_size))
    calls.extend(jax.random.split(keys[-1], eot_defense_size))
    return calls


def stage1_noise_fifo(key: jax.Array, shape: Tuple[int, ...], t: int,
                      **kwargs) -> List[List[np.ndarray]]:
    """FIFO of per-purify-call noise sets ``[e, z_0..z_{t-1}]`` for one
    stage-1 run — feed to the torch reference loop in call order."""
    return [purify_noise(k, shape, t)
            for k in stage1_purify_keys(key, **kwargs)]
