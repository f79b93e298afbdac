"""Improved-Diffusion UNet: shapes, zero-init head, DiffSpec integration."""

import numpy as np

import pytest
import jax
import jax.numpy as jnp

from audiopure_tpu.diffusion.vpsde import RevSpecDiffusion
from audiopure_tpu.models.unet import UNetModel, create_unet, \
    timestep_embedding


def tiny_unet(**kw):
    defaults = dict(in_channels=1, model_channels=16, out_channels=1,
                    num_res_blocks=1, attention_resolutions=(2,),
                    dropout=0.0, channel_mult=(1, 2), num_heads=2)
    defaults.update(kw)
    return UNetModel(**defaults)


def test_timestep_embedding_convention():
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0]), 8))
    # OpenAI convention: [cos | sin]; at t=0 -> [1,1,1,1, 0,0,0,0]
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)


def test_unet_forward_shape_and_zero_init():
    net = tiny_unet()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32))
    t = jnp.asarray([0, 100])
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), x, t)
    out = jax.jit(net.apply)(variables, x, t)
    assert out.shape == (2, 1, 32, 32)
    # zero-init final conv => exactly zero output at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.heavy
def test_unet_learn_sigma_output_channels():
    net = tiny_unet(out_channels=2)
    x = jnp.zeros((1, 1, 32, 32))
    t = jnp.zeros((1,))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, t)
    out = net.apply(variables, x, t)
    assert out.shape == (1, 2, 32, 32)


def test_create_unet_reference_config():
    net = create_unet()
    assert net.model_channels == 128
    assert net.channel_mult == (1, 2, 2, 2)
    assert net.attention_resolutions == (2, 4)  # "16,8" at 32px
    assert net.num_res_blocks == 3 and net.dropout == 0.3


def test_unet_class_conditional():
    net = tiny_unet(num_classes=10)
    x = jnp.zeros((2, 1, 32, 32))
    t = jnp.zeros((2,))
    y = jnp.asarray([3, 7])
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, t, y)
    out = net.apply(variables, x, t, y)
    assert out.shape == (2, 1, 32, 32)


def test_diffspec_purifier_with_unet():
    """DiffSpec (VP-SDE on mel): standardize -> purify -> inv-standardize,
    on dB-scaled inputs (ref ``improved_diffusion_sde.py:173-221``)."""
    net = tiny_unet()
    x = jnp.zeros((1, 1, 32, 32))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    eps_fn = lambda xx, tt: net.apply(variables, xx, tt.reshape(-1))

    pur = RevSpecDiffusion(eps_fn, N=100, t=10)
    spec = jnp.full((2, 1, 32, 32), -30.0)
    out = pur(spec, jax.random.PRNGKey(1))
    assert out.shape == spec.shape
    assert np.isfinite(np.asarray(out)).all()
    # output is back in dB range, not [-1, 1]
    assert np.abs(np.asarray(out)).max() > 2.0


def test_spec_purifier_rand_t():
    """rand_t draws the noise level per call (ref image_editing_sample
    :188-190) — one compiled program over stacked per-t solver grids."""
    import pytest

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (1, 1, 3, 3)) * 0.1

    def eps_fn(x, t):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    pur = RevSpecDiffusion(eps_fn, N=1000, t=20, rand_t=True, t_delta=5)
    spec = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32),
                              minval=-80.0, maxval=20.0)
    out1 = jax.jit(pur.__call__)(spec, jax.random.PRNGKey(2))
    out2 = jax.jit(pur.__call__)(spec, jax.random.PRNGKey(3))
    assert out1.shape == spec.shape
    assert np.isfinite(np.asarray(out1)).all()
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-3

    # rand_t=False path must agree with the plain grid exactly
    pur0 = RevSpecDiffusion(eps_fn, N=1000, t=20)
    a = np.asarray(pur0(spec, jax.random.PRNGKey(4)))
    ts, t_phys, hs, disc, valid = pur0._stacked_grids()
    assert ts == [20] and bool(valid.all())

    with pytest.raises(ValueError):
        RevSpecDiffusion(eps_fn, rand_t=True, t_delta=0)


def test_spec_purifier_unroll_value_and_grad_parity():
    """``unroll`` is a pure compute-schedule knob (round 4d): same step
    math and key stream, so values AND input gradients must match
    unroll=1 to f32-rounding level (XLA may re-associate fusions across
    the unrolled steps) — including a non-divisor factor."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (1, 1, 3, 3)) * 0.1

    def eps_fn(x, t):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    spec = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32),
                              minval=-80.0, maxval=20.0)
    k = jax.random.PRNGKey(2)
    base = RevSpecDiffusion(eps_fn, N=1000, t=10)
    g_base = jax.jit(jax.grad(lambda s: base(s, k).sum()))(spec)
    for u in (2, 3):
        pur = RevSpecDiffusion(eps_fn, N=1000, t=10, unroll=u)
        np.testing.assert_allclose(
            np.asarray(pur(spec, k)), np.asarray(base(spec, k)),
            rtol=1e-5, atol=1e-4)
        g = jax.jit(jax.grad(lambda s: pur(s, k).sum()))(spec)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_base),
                                   rtol=1e-5, atol=1e-6)


def test_unet_bf16_mode_close_to_f32_and_stays_bf16():
    """bf16 compute mode: GroupNorm results must ride bf16 (an f32-
    promoting norm silently doubles elementwise bandwidth on TPU), and
    the output must agree with the f32 model at bf16-rounding level.
    Params are shared (f32 tree applied under both dtypes)."""
    net32 = tiny_unet()
    net16 = tiny_unet(dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32)) * 0.5
    t = jnp.asarray([3, 40])
    variables = jax.jit(net32.init)(jax.random.PRNGKey(1), x, t)
    # make the zero-init head non-trivial so the comparison has signal
    import flax
    variables = flax.core.unfreeze(variables)
    variables["params"]["out_conv"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          variables["params"]["out_conv"]["kernel"].shape)
        * 0.1)
    want = np.asarray(net32.apply(variables, x, t))
    got = np.asarray(net16.apply(variables, x, t), dtype=np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() < 0.05 * scale, (
        np.abs(got - want).max(), scale)


def test_group_norm_output_dtype_follows_compute_dtype():
    from audiopure_tpu.models.unet import _group_norm
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _group_norm(x, jnp.bfloat16)

    m = M()
    x = jnp.ones((1, 4, 4, 32), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).dtype == jnp.bfloat16


def test_spec_purifier_rand_t_fullgrad_finite():
    """Padded grid rows must not poison grad_mode='full' gradients:
    t_phys=0 padding made _step_fg's 1/sqrt(1-abar(0)) infinite and the
    0*inf where-cotangent NaN'd the whole purifier grad whenever the
    drawn row was shorter than the longest grid (round-3 review find)."""
    import pytest

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (1, 1, 3, 3)) * 0.1

    def eps_fn(x, t):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    pur = RevSpecDiffusion(eps_fn, N=1000, t=20, rand_t=True, t_delta=5,
                           grad_mode="full")
    spec = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32),
                              minval=-80.0, maxval=20.0)
    gfn = jax.jit(jax.grad(lambda s, k: pur(s, k).sum()))
    for seed in range(6):  # several draws -> several padded-row depths
        g = np.asarray(gfn(spec, jax.random.PRNGKey(10 + seed)))
        assert np.isfinite(g).all(), f"NaN grad at seed {seed}"

    # t_delta >= t would let t_drawn reach <= 0 (silent wraparound)
    with pytest.raises(ValueError):
        RevSpecDiffusion(eps_fn, t=3, rand_t=True, t_delta=4)
