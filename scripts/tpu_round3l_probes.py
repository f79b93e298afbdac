"""Round-3l TPU probes: dh_hbm full-grad at L=32000/36000.

The dh_hbm backward (wavenet_stack_grad: dh layer-resident buffer
evicted to HBM, re-read as clamped chunk+2*halo(d) windows) extends the
whole-net input-grad VJP past the L<=28000 limit of the resident-dh
hbm_io variant. This measures, at the lengths that previously fell back
to the per-layer VJP:

1. on-chip gradient numerics vs f32 XLA autodiff at L=32000;
2. chained-scan grad timing at L=32000 and L=36000, batch 4: the
   auto-dispatched whole-net kernel (dh_hbm band) vs the per-layer
   fallback it replaces (3x-forward FLOP model, same methodology as
   round 3d).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_tpu_cache")
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    results = {}

    def probe(name, fn):
        try:
            results[name] = fn()
            print(json.dumps({"probe": name, **results[name]}),
                  flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)

    from audiopure_tpu.utils.jit_utils import hoisted_jit

    def chained(fn, x0, n):
        # hoisted_jit per CLAUDE.md: fn's closure holds the full param
        # tree — as a plain jit it would lower as ~100 MB of literals
        # through the remote-compile tunnel
        @hoisted_jit
        def run(x):
            def body(c, _):
                y = fn(c)
                return y / (jnp.abs(y).max() + 1e-6), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.abs(out).sum()

        float(run(x0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = float(run(x0))
            best = min(best, time.perf_counter() - t0)
        assert s == s
        return best / n

    from audiopure_tpu.kernels.wavenet_block import v5x_vmem_est_mb
    from audiopure_tpu.kernels.wavenet_block_grad import \
        wavenet_forward_pallas_grad
    from audiopure_tpu.kernels.wavenet_stack_grad import (
        gradstack_bwd_dhhbm_vmem_est_mb, gradstack_bwd_vmem_est_mb,
        wavenet_forward_pallas_input_grad)
    from audiopure_tpu.models.wavenet import WaveNet

    PEAK = 197.0
    GF_PER_L = 0.906 / 24000.0        # TFLOP per utt fwd per sample
    net = WaveNet(dtype=jnp.bfloat16)
    netf32 = WaveNet(dtype=jnp.float32)
    import flax
    wparams = flax.core.unfreeze(net.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 1, 16000)),
        jnp.zeros((1, 1))))
    # final_conv2 is zero-init (reference ZeroConv1d): randomize it so
    # the gradient numerics compare real signals, not zeros (r3d lesson)
    wparams["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(12),
        wparams["params"]["final_conv2"]["kernel"].shape) * 0.05

    def band(L):
        # mirror the dispatcher's decision for the log
        for ch in (1000, 800, 500):
            if L % ch == 0 and gradstack_bwd_vmem_est_mb(
                    L, 2, chunk_l=ch) <= 118.0 and v5x_vmem_est_mb(
                        L, 2, chunk_l=ch) + 3.0 <= 118.0:
                return f"hbm_io(chunk {ch})"
        for ch in (2000, 1600, 1000, 800, 500):
            if L % ch == 0 and gradstack_bwd_dhhbm_vmem_est_mb(
                    L, 2, chunk_l=ch) <= 118.0 and v5x_vmem_est_mb(
                        L, 2, chunk_l=ch) + 3.0 <= 118.0:
                return f"dh_hbm(chunk {ch})"
        return "per-layer"

    # ---- 1. numerics at L=32000 ----------------------------------------
    def numerics():
        L = 32000
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, L)) * 0.3
        t = jnp.full((2, 1), 5.0)
        ct = jax.random.normal(jax.random.PRNGKey(4), (2, 1, L)) * 0.1
        g_ref = hoisted_jit(jax.grad(lambda xx: (
            netf32.apply(wparams, xx, t) * ct).sum()))(x)
        g_dh = hoisted_jit(jax.grad(lambda xx: (
            wavenet_forward_pallas_input_grad(
                wparams, xx, t, dtype=jnp.bfloat16).astype(jnp.float32)
            * ct).sum()))(x)
        ref = np.asarray(g_ref)
        diff = np.abs(np.asarray(g_dh) - ref)
        scale = np.abs(ref).max()
        rel_l2 = float(np.linalg.norm(diff) / np.linalg.norm(ref))
        return dict(max_abs_diff=float(diff.max()),
                    rel_to_max=float(diff.max() / scale),
                    rel_l2=rel_l2, ref_scale=float(scale),
                    band=band(32000))

    probe("fullgrad_dh_hbm_numerics_L32000", numerics)

    # ---- 2. timing vs per-layer ----------------------------------------
    def grad_probe(fwd_fn, B, L, label):
        def run():
            x = jax.random.normal(jax.random.PRNGKey(5), (B, 1, L)) * 0.3
            t = jnp.full((B, 1), 5.0)
            gfn = jax.grad(lambda xx: (fwd_fn(
                wparams, xx, t, dtype=jnp.bfloat16).astype(
                    jnp.float32) ** 2).sum())
            tsec = chained(gfn, x, 8)
            tf = 3 * GF_PER_L * L * B / tsec
            return dict(ms_per_grad_batch=round(tsec * 1e3, 2), batch=B,
                        L=L, kernel=label, tflops=round(tf, 1),
                        pct_bf16_peak=round(100 * tf / PEAK, 1),
                        band=band(L))
        return run

    for L in (32000, 36000):
        probe(f"fullgrad_whole_net_chained_b4_L{L}",
              grad_probe(wavenet_forward_pallas_input_grad, 4, L,
                         "whole-net(auto)"))
        probe(f"fullgrad_perlayer_chained_b4_L{L}",
              grad_probe(wavenet_forward_pallas_grad, 4, L,
                         "per-layer"))

    with open("/tmp/round3l_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
