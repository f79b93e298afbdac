"""On-chip WaveNet kernel validation + microbenchmark (one TPU process).

Validates numerics of the pallas block kernels (v2 padded, v3 pad-free
bias-fused) against the XLA conv path at full model size, then times all
three with the chained-scan methodology from docs/BENCH.md (N dependent
forwards inside one jit, so the host never syncs mid-measurement).

Run alone (exclusive TPU grant): `python scripts/tpu_kernel_bench.py`.
Env: KB_BATCH (16), KB_CHAIN (8), KB_REPS (3).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

BATCH = int(os.environ.get("KB_BATCH", "16"))
CHAIN = int(os.environ.get("KB_CHAIN", "8"))
REPS = int(os.environ.get("KB_REPS", "3"))
L = 16000

# FLOPs per full 36-layer forward per utterance (docs/BENCH.md)
TFLOP_PER_FWD = 0.604


def main():
    import jax
    import jax.numpy as jnp

    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.models.wavenet import WaveNet

    print(f"devices: {jax.devices()}", flush=True)
    net = WaveNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, 1, L), dtype=jnp.float32) * 0.3
    t = jnp.full((BATCH, 1), 17.0)
    params = net.init(jax.random.PRNGKey(1), x[:1], t[:1])
    # non-zero head so correctness checks exercise the full net
    import flax
    params = flax.core.unfreeze(params)
    params["params"]["final_conv2"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          params["params"]["final_conv2"]["kernel"].shape)
        * 0.05)

    fwd_xla = jax.jit(lambda p, xx, tt: net.apply(p, xx, tt))
    fwd_v2 = jax.jit(lambda p, xx, tt: wavenet_forward_pallas(
        p, xx, tt, block_impl="v2"))
    fwd_v3 = jax.jit(lambda p, xx, tt: wavenet_forward_pallas(
        p, xx, tt, block_impl="v3"))
    fwd_v4 = jax.jit(lambda p, xx, tt: wavenet_forward_pallas(
        p, xx, tt, block_impl="v4"))
    # v5 = f32 gates (must be explicit: bf16 compute now defaults to the
    # v6 bf16-gate variant); v6 = bf16 gate transcendentals
    fwd_v5 = jax.jit(lambda p, xx, tt: wavenet_forward_pallas(
        p, xx, tt, block_impl="v5", gate_dtype=jnp.float32))
    fwd_v6 = jax.jit(lambda p, xx, tt: wavenet_forward_pallas(
        p, xx, tt, block_impl="v5", gate_dtype=jnp.bfloat16))

    # ---- correctness at full size --------------------------------------
    print("compiling + checking numerics ...", flush=True)
    import numpy as np
    ref = np.asarray(fwd_xla(params, x, t), dtype=np.float32)
    for name, fn in [("v2", fwd_v2), ("v3", fwd_v3), ("v4", fwd_v4),
                     ("v5", fwd_v5), ("v6_bf16gate", fwd_v6)]:
        out = np.asarray(fn(params, x, t), dtype=np.float32)
        scale = np.abs(ref).max()
        max_abs = np.abs(out - ref).max()
        print(json.dumps({"check": f"pallas_{name}_vs_xla_bf16",
                          "max_abs": float(max_abs),
                          "ref_scale": float(scale)}), flush=True)
        assert max_abs < 0.1 * scale, (name, max_abs, scale)

    # ---- chained-scan timing -------------------------------------------
    def chain(fn):
        def run(p, xx, tt):
            def body(c, _):
                return (fn(p, c, tt) * 0.999).astype(c.dtype), None
            out, _ = jax.lax.scan(body, xx, None, length=CHAIN)
            return out
        return jax.jit(run)

    tile_sweep = [int(s) for s in os.environ.get(
        "KB_TILES", "").split(",") if s]
    sweeps = [(f"v3_t{tl}", jax.jit(functools.partial(
        lambda p, xx, tt, tl: wavenet_forward_pallas(
            p, xx, tt, block_impl="v3", tile_l=tl), tl=tl)))
        for tl in tile_sweep]
    chunk_sweep = [int(s) for s in os.environ.get(
        "KB_CHUNKS", "").split(",") if s]
    sweeps += [(f"v6_c{cl}", jax.jit(functools.partial(
        lambda p, xx, tt, cl: wavenet_forward_pallas(
            p, xx, tt, block_impl="v5", chunk_l=cl), cl=cl)))
        for cl in chunk_sweep]

    results = {}
    for name, fn in [("xla", fwd_xla), ("v2", fwd_v2), ("v3", fwd_v3),
                     ("v4", fwd_v4), ("v5", fwd_v5),
                     ("v6_bf16gate", fwd_v6), *sweeps]:
        cf = chain(fn)
        # device->host materialisation as the completion barrier:
        # block_until_ready has been seen returning early through the
        # remote-execution tunnel (docs/BENCH.md EOT note)
        float(jnp.abs(cf(params, x, t)).sum())  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jnp.abs(cf(params, x, t)).sum())
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / CHAIN
        tflops = TFLOP_PER_FWD * BATCH / (ms / 1e3)
        results[name] = dict(ms_per_fwd=round(ms, 2),
                             tflops=round(tflops, 1),
                             pct_bf16_peak=round(100 * tflops / 197, 1))
        print(json.dumps({"impl": name, **results[name]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
