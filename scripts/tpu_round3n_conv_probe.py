"""Round-3n: fused NHWC conv3x3 kernel vs XLA conv — on-chip micro A/B.

The UNet ablation (round 3d/3e) put XLA's convs at ~66% of bf16 peak on
the small-image shapes; kernels/unet_conv.py restates the conv as nine
sublane-shifted flat-image taps -> nine resident-weight MXU matmuls.
This times both sides at the UNet's actual conv shapes (chained scans,
bf16). Decision rule: integrate as a model option only if the kernel
wins by >10% at the dominant 32x32x128 shape; otherwise record the
negative (the round-3e attention lesson).
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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_tpu_cache")
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    from audiopure_tpu.kernels.unet_conv import conv3x3_pallas
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    PEAK = 197.0
    results = {}

    def chained(fn, x0, n=32):
        # hoisted_jit per CLAUDE.md: the model arms close over full
        # param trees (plain jit would inline ~100+ MB of literals
        # through the remote-compile tunnel)
        @hoisted_jit
        def run(x):
            def body(c, _):
                y = fn(c)
                return (y / (jnp.abs(y).max() + 1e-3)).astype(c.dtype), \
                    None
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

    SHAPES = [
        (64, 32, 32, 128, 128),
        (256, 32, 32, 128, 128),
        (64, 16, 16, 256, 256),
        (64, 8, 8, 256, 256),
        (64, 4, 4, 256, 256),
    ]
    for B, H, W, C, Co in SHAPES:
        # Cout == C so the chained scan can feed outputs back as inputs
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = (jax.random.normal(kx, (B, H, W, C)) * 0.5).astype(
            jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, C, Co)) * 0.05).astype(
            jnp.bfloat16)
        bb = jnp.zeros((Co,), jnp.float32)
        gf = B * H * W * 9 * C * Co * 2 / 1e12

        def xla_fn(c):
            return jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        def pl_fn(c):
            return conv3x3_pallas(c, w, bb)

        for label, fn in (("xla", xla_fn), ("pallas", pl_fn)):
            name = f"conv3x3_{label}_b{B}_{H}x{W}x{C}"
            try:
                t = chained(fn, x)
                r = dict(ms=round(t * 1e3, 3),
                         tflops=round(gf / t, 1),
                         pct_bf16_peak=round(100 * gf / t / PEAK, 1))
                results[name] = r
                print(json.dumps({"probe": name, **r}), flush=True)
            except Exception as e:
                import traceback
                traceback.print_exc()
                print(json.dumps({"probe": name,
                                  "error": str(e)[:200]}), flush=True)

    # model-level: UNet forward with conv_impl pallas vs xla (bf16),
    # the round-3e attention A/B shape
    import flax

    from audiopure_tpu.models.unet import create_unet

    UNET_GF = 15.73
    unet_x = create_unet(dtype=jnp.bfloat16)
    unet_p = create_unet(dtype=jnp.bfloat16, conv_impl="pallas")
    unet_f = create_unet(dtype=jnp.bfloat16, conv_impl="pallas_fused")
    uvars = jax.jit(unet_x.init)(jax.random.PRNGKey(4),
                                 jnp.zeros((1, 1, 32, 32)),
                                 jnp.zeros((1,)))
    uvars = flax.core.unfreeze(uvars)
    uvars["params"]["out_conv"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(12),
        uvars["params"]["out_conv"]["kernel"].shape) * 0.05

    for Bu in (64, 256):
        for label, net in (("xla", unet_x), ("pallas", unet_p),
                           ("fused", unet_f)):
            name = f"unet_fwd_conv_{label}_b{Bu}"
            try:
                s0 = jax.random.normal(jax.random.PRNGKey(5),
                                       (Bu, 1, 32, 32))
                tt = jnp.full((Bu,), 10.0)
                t = chained(lambda ss: net.apply(uvars, ss, tt).astype(
                    jnp.float32), s0, n=16)
                tf = UNET_GF * Bu / (t * 1e3)
                r = dict(ms_per_fwd_batch=round(t * 1e3, 2), batch=Bu,
                         conv=label, tflops=round(tf, 1),
                         pct_bf16_peak=round(100 * tf / 197.0, 1))
                results[name] = r
                print(json.dumps({"probe": name, **r}), flush=True)
            except Exception as e:
                import traceback
                traceback.print_exc()
                print(json.dumps({"probe": name,
                                  "error": str(e)[:200]}), flush=True)

    # UNet-level numerics on shared params (bf16)
    s8 = jax.random.normal(jax.random.PRNGKey(6), (8, 1, 32, 32))
    t8 = jnp.full((8,), 10.0)
    ax = jnp.asarray(hoisted_jit(lambda s: unet_x.apply(uvars, s, t8))(
        s8), jnp.float32)
    ap = jnp.asarray(hoisted_jit(lambda s: unet_p.apply(uvars, s, t8))(
        s8), jnp.float32)
    af = jnp.asarray(hoisted_jit(lambda s: unet_f.apply(uvars, s, t8))(
        s8), jnp.float32)
    results["unet_conv_numerics"] = dict(
        max_abs_diff=float(jnp.abs(ax - ap).max()),
        max_abs_diff_fused=float(jnp.abs(ax - af).max()),
        out_scale=float(jnp.abs(ax).max()))
    print(json.dumps({"probe": "unet_conv_numerics",
                      **results["unet_conv_numerics"]}), flush=True)

    # numerics spot-check on-chip (bf16)
    B, H, W, C = 8, 32, 32, 128
    x = (jax.random.normal(jax.random.PRNGKey(3), (B, H, W, C)) * 0.5
         ).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(4), (3, 3, C, C)) * 0.05
         ).astype(jnp.bfloat16)
    a = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    bnum = conv3x3_pallas(x, w).astype(jnp.float32)
    d = float(jnp.abs(a - bnum).max())
    sc = float(jnp.abs(a).max())
    results["conv3x3_numerics"] = dict(max_abs_diff=d, out_scale=sc)
    print(json.dumps({"probe": "conv3x3_numerics",
                      **results["conv3x3_numerics"]}), flush=True)

    with open("/tmp/round3n_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
