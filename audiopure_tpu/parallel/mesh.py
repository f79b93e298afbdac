"""Device mesh + sharding layout.

TPU-native replacement for the reference's entire distributed layer
(SURVEY.md §2.7/§2.8): the hand-rolled NCCL all-reduce hooks
(``DiffWave_Unconditional/distributed_util.py:97-149``), the MPI rendezvous
(``improved_diffusion/dist_util.py:21-43``) and ``DistributedSampler``
machinery collapse into ``jax.sharding.Mesh`` + ``NamedSharding``:

* **dp** axis — batch sharding (the reference's only parallelism, gradient
  ``psum`` compiler-emitted over ICI instead of bucketed NCCL hooks);
* **tp** axis — tensor parallelism over channel dimensions of the score-net
  weights, which the reference has nowhere (its models are small, but the
  EOT x batch x diffusion-step compute is not — tp lets one utterance's
  reverse scan use multiple chips' MXUs).

No code here talks to a network library: layouts are declared and XLA
inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, dp: int = -1,
              tp: int = 1, axis_names=("dp", "tp")) -> Mesh:
    """Build a (dp, tp) mesh. ``dp=-1`` absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 3,
                   axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over ``dp``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, axis: str = "tp",
                    min_size: int = 64):
    """Tensor-parallel layout for a param pytree.

    Each leaf is sharded along its largest dimension divisible by the tp
    axis size (weights split across chips; XLA inserts all-gathers /
    reduce-scatters around the matmuls). Small leaves stay replicated.

    Returns a pytree of NamedSharding matching ``params``.
    """
    tp = mesh.shape[axis]

    def spec_for(leaf):
        if tp == 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        candidates = [i for i, d in enumerate(dims)
                      if d % tp == 0 and d >= min_size]
        if not candidates:
            return NamedSharding(mesh, P())
        best = max(candidates, key=lambda i: dims[i])
        spec = [None] * leaf.ndim
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, params)
