"""hbm_io full-grad on-chip numerics, with a RANDOMIZED final conv.

The r3d numerics probe compared gradients of a fresh-init WaveNet whose
``final_conv2`` is zero-init (the reference's ZeroConv1d,
``WaveNet.py:39``) — both sides were exactly zero, proving nothing.
This re-run randomizes the head like tests/test_stack_grad.py does.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_tpu_cache")
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    from audiopure_tpu.kernels.wavenet_stack_grad import \
        wavenet_forward_pallas_input_grad
    from audiopure_tpu.models.wavenet import WaveNet

    L = 24000
    net = WaveNet(dtype=jnp.bfloat16)
    netf32 = WaveNet(dtype=jnp.float32)
    wparams = flax.core.unfreeze(net.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 1, L)), jnp.zeros((1, 1))))
    wparams["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(12),
        wparams["params"]["final_conv2"]["kernel"].shape) * 0.05

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, L)) * 0.3
    t = jnp.full((2, 1), 5.0)
    ct = jax.random.normal(jax.random.PRNGKey(4), (2, 1, L)) * 0.1
    g_ref = jax.jit(jax.grad(lambda xx: (
        netf32.apply(wparams, xx, t) * ct).sum()))(x)
    g_hbm = jax.jit(jax.grad(lambda xx: (
        wavenet_forward_pallas_input_grad(
            wparams, xx, t, dtype=jnp.bfloat16).astype(jnp.float32)
        * ct).sum()))(x)
    ref = np.asarray(g_ref)
    got = np.asarray(g_hbm)
    diff = np.abs(got - ref)
    num = float(np.linalg.norm(diff))
    den = float(np.linalg.norm(ref))
    print(json.dumps({"probe": "fullgrad_hbm_io_numerics_L24000_fixed",
                      "max_abs_diff": float(diff.max()),
                      "rel_to_max": float(diff.max() / np.abs(ref).max()),
                      "rel_l2": num / den,
                      "ref_scale": float(np.abs(ref).max())}),
          flush=True)


if __name__ == "__main__":
    main()
