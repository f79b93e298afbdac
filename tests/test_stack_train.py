"""Whole-net TRAINING VJP (wavenet_stack_train): full parameter
gradients vs XLA autodiff of the flax model, interpret mode on CPU."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiopure_tpu.kernels.wavenet_stack_train import (
    wavenet_forward_pallas_train)
from audiopure_tpu.models.wavenet import WaveNet

NL, C, L = 12, 16, 800


@pytest.fixture(scope="module")
def setup():
    net = WaveNet(res_channels=C, skip_channels=C, num_res_layers=NL,
                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, L)) * 0.3
    t = jnp.full((2, 1), 5.0)
    p = flax.core.unfreeze(net.init(jax.random.PRNGKey(1), x, t))
    # zero-init output head makes grad probes vacuous — randomize it
    p["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        p["params"]["final_conv2"]["kernel"].shape) * 0.05
    ct = jax.random.normal(jax.random.PRNGKey(3),
                           net.apply(p, x, t).shape) * 0.1
    return net, p, x, t, ct


def _kernel_fwd(p, x, t):
    return wavenet_forward_pallas_train(
        p, x, t, num_res_layers=NL, dtype=jnp.float32, interpret=True)


def test_forward_matches_flax(setup):
    net, p, x, t, _ = setup
    want = np.asarray(net.apply(p, x, t))
    got = np.asarray(_kernel_fwd(p, x, t))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_full_param_gradients_match_autodiff(setup):
    """Every leaf of the parameter-tree cotangent — dilated/res/skip
    conv kernels AND biases of all 12 layers, the per-block fc_t, the
    stem (init_conv, fc_t1/2) and head (final_conv1/2) — must match the
    flax autodiff gradient."""
    net, p, x, t, ct = setup
    g_ref = jax.grad(lambda pp: (net.apply(pp, x, t) * ct).sum())(p)
    g_got = jax.grad(lambda pp: (_kernel_fwd(pp, x, t) * ct).sum())(p)

    flat_ref = flax.traverse_util.flatten_dict(g_ref["params"])
    flat_got = flax.traverse_util.flatten_dict(g_got["params"])
    assert flat_ref.keys() == flat_got.keys()
    bad = []
    for k in sorted(flat_ref):
        r, g = np.asarray(flat_ref[k]), np.asarray(flat_got[k])
        scale = max(np.abs(r).max(), 1e-8)
        err = np.abs(g - r).max() / scale
        if err > 2e-4:
            bad.append(("/".join(k), float(err)))
    assert not bad, bad


def test_input_and_t_gradients_match_autodiff(setup):
    net, p, x, t, ct = setup
    g_ref = jax.grad(lambda xx: (net.apply(p, xx, t) * ct).sum())(x)
    g_got = jax.grad(lambda xx: (_kernel_fwd(p, xx, t) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)
    gt_ref = jax.grad(lambda tt: (net.apply(p, x, tt) * ct).sum())(t)
    gt_got = jax.grad(lambda tt: (_kernel_fwd(p, x, tt) * ct).sum())(t)
    np.testing.assert_allclose(np.asarray(gt_got), np.asarray(gt_ref),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.heavy
def test_multi_cycle_param_gradients_match_autodiff():
    """NL=24 with dilation_cycle=12 gives n_cycles=2, exercising every
    reversed-cycle index map (tb/wspec/layer into h_all/x_all and the
    five weight-partial outputs) and the dxa carry across grid steps —
    all of which are invisible at n_cycles=1."""
    NL2, C2, L2 = 24, 8, 400
    net = WaveNet(res_channels=C2, skip_channels=C2, num_res_layers=NL2,
                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, L2)) * 0.3
    t = jnp.full((1, 1), 5.0)
    p = flax.core.unfreeze(net.init(jax.random.PRNGKey(1), x, t))
    p["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        p["params"]["final_conv2"]["kernel"].shape) * 0.05
    ct = jax.random.normal(jax.random.PRNGKey(3),
                           net.apply(p, x, t).shape) * 0.1

    def kfwd(pp, xx, tt):
        return wavenet_forward_pallas_train(
            pp, xx, tt, num_res_layers=NL2, dtype=jnp.float32,
            interpret=True)

    np.testing.assert_allclose(np.asarray(kfwd(p, x, t)),
                               np.asarray(net.apply(p, x, t)),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(lambda pp: (net.apply(pp, x, t) * ct).sum())(p)
    g_got = jax.grad(lambda pp: (kfwd(pp, x, t) * ct).sum())(p)
    flat_ref = flax.traverse_util.flatten_dict(g_ref["params"])
    flat_got = flax.traverse_util.flatten_dict(g_got["params"])
    bad = []
    for k in sorted(flat_ref):
        r, g = np.asarray(flat_ref[k]), np.asarray(flat_got[k])
        err = np.abs(g - r).max() / max(np.abs(r).max(), 1e-8)
        if err > 2e-4:
            bad.append(("/".join(k), float(err)))
    assert not bad, bad


@pytest.mark.parametrize("nl,cyc,ch,ll,chunk", [
    (6, 3, 8, 240, 120),    # odd cycle: exercises the xb->xa copy-back
    (10, 5, 16, 200, 200),  # odd cycle, single chunk
    (8, 4, 8, 256, 128),    # even cycle, 2 cycles, non-default chunk
])
@pytest.mark.heavy
def test_config_sweep_gradients_match_autodiff(nl, cyc, ch, ll, chunk):
    """Direct fused_stack_train calls across odd/even dilation cycles,
    cycle counts and chunkings — full param + input grads vs flax."""
    from audiopure_tpu.kernels.wavenet_stack_train import \
        fused_stack_train
    from audiopure_tpu.kernels.wavenet_block import (
        wavenet_head, wavenet_stack_inputs, wavenet_stem)

    net = WaveNet(res_channels=ch, skip_channels=ch, num_res_layers=nl,
                  dilation_cycle=cyc, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, ll)) * 0.3
    t = jnp.full((1, 1), 5.0)
    p = flax.core.unfreeze(net.init(jax.random.PRNGKey(1), x, t))
    p["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        p["params"]["final_conv2"]["kernel"].shape) * 0.05
    ct = jax.random.normal(jax.random.PRNGKey(3),
                           net.apply(p, x, t).shape) * 0.1

    def kfwd(pp, xx):
        prms = pp["params"]
        emb, h = wavenet_stem(prms, xx, t, 128, jnp.float32)
        si = wavenet_stack_inputs(prms, emb, nl, jnp.float32)
        skip = fused_stack_train(h, *si, cyc, chunk, chunk, True)
        return wavenet_head(prms, skip, nl)

    np.testing.assert_allclose(np.asarray(kfwd(p, x)),
                               np.asarray(net.apply(p, x, t)),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(lambda pp: (net.apply(pp, x, t) * ct).sum())(p)
    g_got = jax.grad(lambda pp: (kfwd(pp, x) * ct).sum())(p)
    fr = flax.traverse_util.flatten_dict(g_ref["params"])
    fg = flax.traverse_util.flatten_dict(g_got["params"])
    bad = []
    for k in sorted(fr):
        r, g = np.asarray(fr[k]), np.asarray(fg[k])
        err = np.abs(g - r).max() / max(np.abs(r).max(), 1e-8)
        if err > 2e-4:
            bad.append(("/".join(k), float(err)))
    assert not bad, bad
    gx_ref = jax.grad(lambda xx: (net.apply(p, xx, t) * ct).sum())(x)
    gx_got = jax.grad(lambda xx: (kfwd(p, xx) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.heavy
def test_train_step_dp_mesh_matches_single_device(setup):
    """The pallas_stack train step under an 8-device dp mesh (interpret
    kernels on the CPU mesh, the repo's multi-chip semantic check) must
    produce the same loss and params as the unsharded step."""
    import numpy as onp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)

    net, p, x, t, ct = setup
    sched = make_schedule(50, 1e-4, 0.02)
    opt = optax.adam(1e-3)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (8, 1, L)) * 0.3
    step_plain = make_train_step(_kernel_fwd, sched, opt)
    s0 = init_train_state(p, opt, jax.random.PRNGKey(5))
    s1, loss1 = jax.jit(step_plain)(s0, x0)

    mesh = Mesh(onp.array(jax.devices()[:8]).reshape(8), ("dp",))
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("dp"))
    s0b = init_train_state(p, opt, jax.random.PRNGKey(5))
    ssh = type(s0b)(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, s0b.params),
        opt_state=jax.tree_util.tree_map(lambda _: rep, s0b.opt_state),
        key=rep)
    step_dp = jax.jit(step_plain, in_shardings=(ssh, bsh),
                      out_shardings=(ssh, rep))
    with mesh:
        s2, loss2 = step_dp(jax.device_put(s0b, ssh),
                            jax.device_put(x0, bsh))
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
    f1 = flax.traverse_util.flatten_dict(s1.params["params"])
    f2 = flax.traverse_util.flatten_dict(s2.params["params"])
    for k in f1:
        # the dp batch-grad psum reassociates f32 sums (~1e-6 noise on
        # Adam-scale updates); semantic agreement, not bit equality
        np.testing.assert_allclose(np.asarray(f2[k]), np.asarray(f1[k]),
                                   rtol=1e-4, atol=5e-6,
                                   err_msg="/".join(k))


@pytest.mark.heavy
def test_train_step_accepts_kernel_apply_fn(setup):
    """End-to-end: make_train_step with the kernel apply_fn runs one
    optimizer step and moves the loss the same way as the flax path."""
    import optax

    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)

    net, p, x, t, ct = setup
    sched = make_schedule(50, 1e-4, 0.02)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (4, 1, L)) * 0.3

    def run(apply_fn):
        opt = optax.adam(1e-4)
        state = init_train_state(p, opt, jax.random.PRNGKey(11))
        step = make_train_step(apply_fn, sched, opt)
        losses = []
        s = state
        for i in range(2):
            s, loss = step(s, x0)
            losses.append(float(loss))
        return losses, s

    l_kernel, s_kernel = run(_kernel_fwd)
    l_flax, s_flax = run(lambda pp, xx, tt: net.apply(pp, xx, tt))
    np.testing.assert_allclose(l_kernel, l_flax, rtol=1e-4)
    # params after 2 steps agree leaf-wise
    fk = flax.traverse_util.flatten_dict(s_kernel.params["params"])
    ff = flax.traverse_util.flatten_dict(s_flax.params["params"])
    for k in fk:
        np.testing.assert_allclose(np.asarray(fk[k]), np.asarray(ff[k]),
                                   rtol=1e-3, atol=1e-6,
                                   err_msg="/".join(k))
