"""Probe: how much VMEM can one pallas kernel actually hold on this chip?

Allocates a large VMEM scratch (ping-pong state for a layer-resident
WaveNet design) and touches it. Binary-searches the ceiling by trying
sizes; also validates that scratch persists across sequential grid steps
(accumulate into scratch over an 'arbitrary' grid axis, write out at the
last step).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_scratch_mb(mb: int) -> bool:
    rows = mb * 1024 * 1024 // (256 * 2)  # bf16 (rows, 256)

    def kernel(x_ref, o_ref, scratch):
        scratch[: x_ref.shape[0]] = x_ref[:]
        o_ref[:] = scratch[: x_ref.shape[0]]

    x = jnp.ones((256, 256), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((rows, 256), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 8) * 1024 * 1024),
        )(x)
        out.block_until_ready()
        return bool(jnp.all(out == 1.0))
    except Exception as e:
        print(json.dumps({"mb": mb, "err": f"{type(e).__name__}"}),
              file=sys.stderr)
        return False


def scratch_persists() -> bool:
    """Accumulate grid-step index into scratch; output only at last step."""
    N = 8

    def kernel(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += x_ref[:]

        @pl.when(i == N - 1)
        def _out():
            o_ref[:] = acc[:]

    x = jnp.ones((N, 128, 256), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 128, 256), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 128, 256), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x)
    return bool(jnp.all(out == float(N)))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print(json.dumps({"scratch_persists": scratch_persists()}), flush=True)
    ok = 0
    for mb in (16, 32, 48, 64, 80, 96, 112, 120):
        if try_scratch_mb(mb):
            ok = mb
            print(json.dumps({"scratch_mb": mb, "ok": True}), flush=True)
        else:
            print(json.dumps({"scratch_mb": mb, "ok": False}), flush=True)
            break
    print(json.dumps({"max_scratch_mb": ok}))


if __name__ == "__main__":
    main()
