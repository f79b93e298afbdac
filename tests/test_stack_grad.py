"""Whole-net input-grad VJP (wavenet_stack_grad): parity with XLA
autodiff of the flax model, interpret mode on CPU."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiopure_tpu.kernels.wavenet_stack_grad import (
    fused_residual_stack_save_h, wavenet_forward_pallas_input_grad)
from audiopure_tpu.models.wavenet import WaveNet

NL, C, L = 12, 16, 800


@pytest.fixture(scope="module")
def setup():
    net = WaveNet(res_channels=C, skip_channels=C, num_res_layers=NL,
                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, L)) * 0.3
    t = jnp.full((2, 1), 5.0)
    p = net.init(jax.random.PRNGKey(1), x, t)
    p = flax.core.unfreeze(p)
    p["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        p["params"]["final_conv2"]["kernel"].shape) * 0.05
    ct = jax.random.normal(jax.random.PRNGKey(3),
                           net.apply(p, x, t).shape) * 0.1
    return net, p, x, t, ct


def test_forward_matches_flax(setup):
    net, p, x, t, _ = setup
    want = np.asarray(net.apply(p, x, t))
    got = np.asarray(wavenet_forward_pallas_input_grad(
        p, x, t, num_res_layers=NL, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_audio_gradient_matches_autodiff(setup):
    net, p, x, t, ct = setup
    g_ref = jax.grad(lambda xx: (net.apply(p, xx, t) * ct).sum())(x)
    g_got = jax.grad(lambda xx: (wavenet_forward_pallas_input_grad(
        p, xx, t, num_res_layers=NL, dtype=jnp.float32,
        interpret=True) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_timestep_gradient_matches_autodiff(setup):
    net, p, x, t, ct = setup
    g_ref = jax.grad(lambda tt: (net.apply(p, x, tt) * ct).sum())(t)
    g_got = jax.grad(lambda tt: (wavenet_forward_pallas_input_grad(
        p, x, tt, num_res_layers=NL, dtype=jnp.float32,
        interpret=True) * ct).sum())(t)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_saved_h_matches_preactivations(setup):
    """The streamed h must equal the layer-0 pre-activation computed by
    hand (zero conv padding, bias-free margins)."""
    net, p, x, t, _ = setup
    from audiopure_tpu.kernels.wavenet_block import wavenet_forward_pallas
    from audiopure_tpu.diffusion.schedule import diffusion_step_embedding

    pp = p["params"]
    xh = jnp.swapaxes(x, 1, 2)
    emb = diffusion_step_embedding(t, 128)
    emb = emb @ pp["fc_t1"]["kernel"] + pp["fc_t1"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    emb = emb @ pp["fc_t2"]["kernel"] + pp["fc_t2"]["bias"]
    emb = emb * jax.nn.sigmoid(emb)
    h0 = jax.nn.relu(
        jnp.einsum("blc,kco->blo", xh, pp["init_conv"]["kernel"])
        + pp["init_conv"]["bias"])
    bp = pp["res_block_0"]
    tb = emb @ bp["fc_t"]["kernel"] + bp["fc_t"]["bias"]
    xb = h0 + tb[:, None, :]
    wd = bp["dilated_conv"]["kernel"]

    def shift(a, off):
        pad = jnp.zeros_like(a[:, :abs(off)])
        return (jnp.concatenate([a[:, off:], pad], 1) if off > 0
                else jnp.concatenate([pad, a[:, :off]], 1) if off < 0
                else a)

    want_h = (shift(xb, -1) @ wd[0] + xb @ wd[1] + shift(xb, 1) @ wd[2]
              + bp["dilated_conv"]["bias"])

    blocks = [pp[f"res_block_{n}"] for n in range(NL)]
    stack = lambda f: jnp.stack([f(b) for b in blocks])
    t_biases = jnp.stack([(emb @ b["fc_t"]["kernel"] + b["fc_t"]["bias"])
                          for b in blocks], axis=1)
    _, h_all = fused_residual_stack_save_h(
        h0, t_biases,
        stack(lambda b: b["dilated_conv"]["kernel"]),
        stack(lambda b: b["dilated_conv"]["bias"]),
        stack(lambda b: b["res_conv"]["kernel"][0]),
        stack(lambda b: b["res_conv"]["bias"]),
        stack(lambda b: b["skip_conv"]["kernel"][0]),
        stack(lambda b: b["skip_conv"]["bias"]),
        dilation_cycle=12, chunk_l=400, interpret=True)
    np.testing.assert_allclose(np.asarray(h_all[:, 0]),
                               np.asarray(want_h), rtol=1e-5, atol=1e-6)


@pytest.mark.heavy
def test_hbm_io_grad_path_matches_autodiff(setup):
    """hbm_io=True (long-audio variant: DMA'd input/skip forward, staged
    g_skip + DMA'd dx backward) must match XLA autodiff exactly like the
    resident path (wavenet_stack_grad.fused_residual_stack_bwd hbm_io)."""
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        fused_stack_input_grad
    from audiopure_tpu.kernels.wavenet_block import (
        wavenet_head, wavenet_stack_inputs, wavenet_stem)

    net, p, x, t, ct = setup

    def fwd(xx, hbm_io):
        pp = p["params"]
        emb, h = wavenet_stem(pp, xx, t, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(pp, emb, NL, jnp.float32)
        skip = fused_stack_input_grad(h, *stack_in, 12, 400, True, hbm_io)
        return wavenet_head(pp, skip, NL)

    out_res = fwd(x, False)
    out_hbm = fwd(x, True)
    np.testing.assert_allclose(np.asarray(out_hbm), np.asarray(out_res),
                               rtol=1e-6, atol=1e-7)

    g_ref = jax.grad(lambda xx: (net.apply(p, xx, t) * ct).sum())(x)
    g_hbm = jax.grad(lambda xx: (fwd(xx, True) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_hbm), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_dh_hbm_grad_path_matches_autodiff(setup):
    """dh_hbm=True (the longest-audio variant: the backward's dh
    layer-resident buffer is evicted to HBM and re-read as clamped
    chunk+2*halo(d) windows) must match XLA autodiff.  L=800 < halo for
    the large-dilation layers here, so the statically-clamped window DMA
    and zero-padded edge rows get exercised hard."""
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        fused_stack_input_grad
    from audiopure_tpu.kernels.wavenet_block import (
        wavenet_head, wavenet_stack_inputs, wavenet_stem)

    net, p, x, t, ct = setup

    def fwd(xx):
        pp = p["params"]
        emb, h = wavenet_stem(pp, xx, t, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(pp, emb, NL, jnp.float32)
        skip = fused_stack_input_grad(h, *stack_in, 12, 400, True, True,
                                      True)
        return wavenet_head(pp, skip, NL)

    out_ref = np.asarray(net.apply(p, x, t))
    np.testing.assert_allclose(np.asarray(fwd(x)), out_ref,
                               rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(lambda xx: (net.apply(p, xx, t) * ct).sum())(x)
    g_dh = jax.grad(lambda xx: (fwd(xx) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_dh), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)

    g_t_ref = jax.grad(lambda tt: (net.apply(p, x, tt) * ct).sum())(t)

    def fwd_t(tt):
        pp = p["params"]
        emb, h = wavenet_stem(pp, x, tt, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(pp, emb, NL, jnp.float32)
        skip = fused_stack_input_grad(h, *stack_in, 12, 400, True, True,
                                      True)
        return wavenet_head(pp, skip, NL)

    g_t = jax.grad(lambda tt: (fwd_t(tt) * ct).sum())(t)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_t_ref),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.heavy
def test_dh_hbm_multi_cycle_matches_autodiff():
    """n_cycles=2 (NL=24, cyc=12): the dh_hbm window DMAs and the dx
    carry must also hold across reversed grid steps."""
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        fused_stack_input_grad
    from audiopure_tpu.kernels.wavenet_block import (
        wavenet_head, wavenet_stack_inputs, wavenet_stem)

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

    def fwd(xx):
        pp = p["params"]
        emb, h = wavenet_stem(pp, xx, t, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(pp, emb, NL2, jnp.float32)
        skip = fused_stack_input_grad(h, *stack_in, 12, 400, True, True,
                                      True)
        return wavenet_head(pp, skip, NL2)

    np.testing.assert_allclose(np.asarray(fwd(x)),
                               np.asarray(net.apply(p, x, t)),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(lambda xx: (net.apply(p, xx, t) * ct).sum())(x)
    g_dh = jax.grad(lambda xx: (fwd(xx) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_dh), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_fullgrad_dispatch_bands():
    """Pin the grad_mode='full' dispatch decisions at the flagship
    256/256 config, bf16: resident v5 at 16000, hbm_io at 24000, dh_hbm
    at 32000, per-layer fallback at 40000 (the save_h forward's
    xa/xb+skip resident binds there). Uses the PRODUCTION band helper,
    so estimate drift fails here."""
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        fullgrad_dispatch_band

    def band(L):
        return fullgrad_dispatch_band(L, 2)[0]

    assert band(16000) == "resident"
    assert band(24000) == "hbm_io"
    assert band(32000) == "dh_hbm"
    assert band(36000) == "dh_hbm"
    assert band(40000) == "per-layer"
    # interpret mode always runs the resident path
    assert fullgrad_dispatch_band(40000, 2, interpret=True)[0] \
        == "resident"


def test_vmap_replica_axis_through_input_grad(setup):
    """``vmap(value_and_grad(...))`` over a replica axis — the EOT
    composition (attacks/eot.py) — through the whole-net VJP, on the
    hbm_io layout whose in/out (and the always-ANY h_all stream) can't
    be auto-batched by Pallas: the ``custom_vmap`` collapse rules fold
    the replicas into the batch grid dim.  Values and grads pinned
    against the per-replica python loop."""
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        fused_stack_input_grad
    from audiopure_tpu.kernels.wavenet_block import (
        wavenet_head, wavenet_stack_inputs, wavenet_stem)

    net, p, x, t, ct = setup
    E = 2
    xs = jnp.stack([x * (1.0 + 0.2 * i) for i in range(E)])

    def loss(xx):
        pp = p["params"]
        emb, h = wavenet_stem(pp, xx, t, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(pp, emb, NL, jnp.float32)
        skip = fused_stack_input_grad(h, *stack_in, 12, 400, True, True)
        return (wavenet_head(pp, skip, NL) * ct).sum()

    want_v, want_g = zip(*[jax.value_and_grad(loss)(xs[i])
                           for i in range(E)])
    got_v, got_g = jax.vmap(jax.value_and_grad(loss))(xs)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g),
                               np.asarray(jnp.stack(want_g)),
                               rtol=1e-5, atol=1e-8)


def test_vmap_replica_axis_save_h(setup):
    """Direct ``vmap`` over the save_h forward: its h_all stream is
    memory_space=ANY in EVERY io mode, so the collapse rule must cover
    the resident layout too."""
    net, p, x, t, _ = setup
    pp = p["params"]
    from audiopure_tpu.kernels.wavenet_block import (wavenet_stack_inputs,
                                                     wavenet_stem)

    E = 2
    xs = jnp.stack([x * (1.0 + 0.3 * i) for i in range(E)])

    def fwd(xx):
        emb, h = wavenet_stem(pp, xx, t, 128, jnp.float32)
        stack_in = wavenet_stack_inputs(pp, emb, NL, jnp.float32)
        return fused_residual_stack_save_h(
            h, *stack_in, dilation_cycle=12, chunk_l=400, interpret=True)

    want_skip, want_h = zip(*[fwd(xs[i]) for i in range(E)])
    got_skip, got_h = jax.vmap(fwd)(xs)
    np.testing.assert_allclose(np.asarray(got_skip),
                               np.asarray(jnp.stack(want_skip)), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(got_h),
                               np.asarray(jnp.stack(want_h)), rtol=0,
                               atol=0)
