"""Multi-host initialization.

Replaces the reference's MPI rendezvous (``improved_diffusion/dist_util.py:
21-43``: mpi4py broadcast of MASTER_ADDR + ``dist.init_process_group``) and
the TCP-url NCCL setup (``DiffWave_Unconditional/distributed_util.py:50-60``)
with JAX's single-controller runtime: one ``jax.distributed.initialize()``
per host, then every jit over a global mesh sees all devices; checkpoint
reads happen once per host via orbax (no byte-broadcast of pickles).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops on a single host.

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for CPU/GPU clusters.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_info():
    """(process_index, process_count, local_device_count) — what the
    reference derives from RANK/WORLD_SIZE env vars."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count())


def data_shard_args():
    """Per-host loader sharding kwargs (the DistributedSampler role)."""
    return dict(num_shards=jax.process_count(),
                shard_index=jax.process_index())
