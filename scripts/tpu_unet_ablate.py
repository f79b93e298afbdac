"""UNet cost attribution on TPU: where do the non-MXU milliseconds go?

Chained-scan timings of the production 128-ch UNet (bf16, batch 64)
against ablated variants:
  * attention off      (UNetModel(attention_resolutions=()))
  * group-norms off    (monkeypatched to identity — NOT a numerics
                        configuration, purely a cost-attribution probe)
  * both off
The deltas bound how much a fused attention kernel or a norm-fused
conv could buy before writing either.
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

    import audiopure_tpu.models.unet as unet_mod
    from audiopure_tpu.models.unet import UNetModel

    Bu = 64
    tt = jnp.full((Bu,), 10.0)
    s = jax.random.normal(jax.random.PRNGKey(5), (Bu, 1, 32, 32))

    def chained(fn, x0, n=16):
        @jax.jit
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
            val = float(run(x0))
            best = min(best, time.perf_counter() - t0)
        assert val == val
        return best / n

    def build(attn):
        net = UNetModel(in_channels=1, model_channels=128, out_channels=1,
                        num_res_blocks=3,
                        attention_resolutions=(2, 4) if attn else (),
                        dropout=0.3, channel_mult=(1, 2, 2, 2),
                        num_heads=4, dtype=jnp.bfloat16)
        uvars = jax.jit(net.init)(jax.random.PRNGKey(4),
                                  jnp.zeros((1, 1, 32, 32)),
                                  jnp.zeros((1,)))
        return net, uvars

    real_gn = unet_mod._group_norm
    results = {}
    for attn in (True, False):
        for gn in (True, False):
            unet_mod._group_norm = real_gn if gn \
                else (lambda x, dtype=None, name=None: x)
            try:
                net, uvars = build(attn)
                t = chained(lambda ss: net.apply(uvars, ss, tt).astype(
                    jnp.float32), s)
                key = f"attn{int(attn)}_gn{int(gn)}"
                results[key] = round(t * 1e3, 2)
                print(json.dumps({"probe": key,
                                  "ms_per_fwd_batch": results[key]}),
                      flush=True)
            finally:
                unet_mod._group_norm = real_gn

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
