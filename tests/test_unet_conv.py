"""Fused NHWC 3x3 conv kernel (kernels/unet_conv): parity with
lax.conv_general_dilated SAME padding, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiopure_tpu.kernels.unet_conv import conv3x3_pallas


def _xla_conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b[None, None, None, :]


@pytest.mark.parametrize("shape,cout,tile_b", [
    ((5, 32, 32, 16), 24, 1),   # non-square channels, odd batch
    ((4, 16, 16, 8), 8, 2),     # mid resolution
    ((2, 8, 8, 8), 16, 2),      # small
    ((6, 4, 4, 8), 8, 3),       # tiniest UNet level
])
def test_conv3x3_matches_xla(shape, cout, tile_b):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, shape)
    w = jax.random.normal(kw, (3, 3, shape[-1], cout)) * 0.2
    b = jax.random.normal(kb, (cout,)) * 0.1
    want = np.asarray(_xla_conv(x, w, b))
    got = np.asarray(conv3x3_pallas(x, w, b, tile_b=tile_b,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3x3_auto_tile_and_dtype():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 8)) * 0.2
    want = np.asarray(_xla_conv(x, w, jnp.zeros((8,))))
    got = np.asarray(conv3x3_pallas(x, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # bf16 path stays at bf16-rounding distance
    got16 = np.asarray(conv3x3_pallas(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        interpret=True)).astype(np.float32)
    assert np.abs(got16 - want).max() < 0.12 * np.abs(want).max()


def test_auto_interpret_guard_recognizes_axon():
    """Same repo convention as unet_attention: the 'axon' TPU platform
    must count as real hardware in the auto-interpret default."""
    import inspect

    import audiopure_tpu.kernels.unet_conv as uc

    src = inspect.getsource(uc.conv3x3_pallas)
    assert '"axon"' in src and '"tpu"' in src


def test_conv3x3_gradients_match_autodiff():
    """custom-VJP grads (explicit conv-transpose) vs XLA autodiff."""
    from audiopure_tpu.kernels.unet_conv import conv3x3

    kx, kw, kb, kc = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(kx, (3, 8, 8, 8))
    w = jax.random.normal(kw, (3, 3, 8, 16)) * 0.2
    b = jax.random.normal(kb, (16,)) * 0.1
    ct = jax.random.normal(kc, (3, 8, 8, 16))

    ref = jax.grad(lambda *a: (_xla_conv(*a) * ct).sum(),
                   argnums=(0, 1, 2))(x, w, b)
    got = jax.grad(lambda *a: (conv3x3(*a) * ct).sum(),
                   argnums=(0, 1, 2))(x, w, b)
    for r, g, name in zip(ref, got, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.heavy
def test_unet_conv_impl_pallas_matches_xla():
    """create_unet(conv_impl='pallas') shares the exact param tree with
    the XLA model and matches its forward and gradient in interpret
    mode (tiny config)."""
    import flax

    from audiopure_tpu.models.unet import create_unet

    kw = dict(num_channels=16, num_res_blocks=1, dropout=0.0)
    net_x = create_unet(**kw)
    net_p = create_unet(conv_impl="pallas", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32)) * 0.5
    t = jnp.full((2,), 10.0)
    v = flax.core.unfreeze(jax.jit(net_x.init)(jax.random.PRNGKey(1), x,
                                               t))
    # zero-init output conv makes the probe vacuous — randomize it
    v["params"]["out_conv"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        v["params"]["out_conv"]["kernel"].shape) * 0.05
    # identical param trees
    vp = jax.jit(net_p.init)(jax.random.PRNGKey(1), x, t)
    tx = jax.tree_util.tree_structure(v)
    tp = jax.tree_util.tree_structure(flax.core.unfreeze(vp))
    assert tx == tp
    a = np.asarray(net_x.apply(v, x, t))
    b = np.asarray(net_p.apply(v, x, t))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)
    ga = jax.grad(lambda xx: (net_x.apply(v, xx, t) ** 2).sum())(x)
    gb = jax.grad(lambda xx: (net_p.apply(v, xx, t) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape,cout,groups,silu,ss", [
    ((3, 16, 16, 16), 24, 4, True, True),
    pytest.param((2, 8, 8, 32), 32, 32, True, False,
                 marks=pytest.mark.heavy),
    pytest.param((4, 4, 4, 8), 8, 2, False, True,
                 marks=pytest.mark.heavy),
])
def test_conv3x3_gn_matches_xla_composition(shape, cout, groups, silu,
                                            ss):
    from audiopure_tpu.kernels.unet_conv import (_xla_gn_conv,
                                                 conv3x3_gn_pallas)

    B, H, W, C = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], shape)
    w = jax.random.normal(ks[1], (3, 3, C, cout)) * 0.2
    b = jax.random.normal(ks[2], (cout,)) * 0.1
    gs = 1.0 + jax.random.normal(ks[3], (C,)) * 0.1
    gb = jax.random.normal(ks[4], (C,)) * 0.1
    sc = (jax.random.normal(ks[5], (B, C)) * 0.2 if ss
          else jnp.zeros((B, C)))
    sh = (jax.random.normal(ks[6], (B, C)) * 0.2 if ss
          else jnp.zeros((B, C)))
    want = np.asarray(_xla_gn_conv(x, w, b, gs, gb, sc, sh, groups,
                                   silu))
    got = np.asarray(conv3x3_gn_pallas(x, w, b, gs, gb, sc, sh,
                                       groups=groups, silu=silu,
                                       interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.heavy
def test_conv3x3_gn_gradients_match_autodiff():
    from audiopure_tpu.kernels.unet_conv import _xla_gn_conv, conv3x3_gn

    B, H, W, C, Co, G = 2, 8, 8, 16, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    args = (jax.random.normal(ks[0], (B, H, W, C)),
            jax.random.normal(ks[1], (3, 3, C, Co)) * 0.2,
            jax.random.normal(ks[2], (Co,)) * 0.1,
            1.0 + jax.random.normal(ks[3], (C,)) * 0.1,
            jax.random.normal(ks[4], (C,)) * 0.1,
            jax.random.normal(ks[5], (B, C)) * 0.2,
            jax.random.normal(ks[6], (B, C)) * 0.2)
    ct = jax.random.normal(ks[7], (B, H, W, Co))
    ref = jax.grad(lambda *a: (_xla_gn_conv(*a, G, True) * ct).sum(),
                   argnums=tuple(range(7)))(*args)
    got = jax.grad(lambda *a: (conv3x3_gn(*a, G, True) * ct).sum(),
                   argnums=tuple(range(7)))(*args)
    for r, g, name in zip(ref, got, ("dx", "dw", "db", "dgs", "dgb",
                                     "dsc", "dsh")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.heavy
def test_unet_conv_impl_pallas_fused_matches_xla():
    """conv_impl='pallas_fused' (GN/scale-shift/SiLU folded into the
    conv kernel): identical param tree, matching forward + gradient;
    the train-time dropout branch (unfused order) also agrees with the
    XLA model under the same dropout rng."""
    import flax

    from audiopure_tpu.models.unet import create_unet

    kw = dict(num_channels=16, num_res_blocks=1, dropout=0.3)
    net_x = create_unet(**kw)
    net_f = create_unet(conv_impl="pallas_fused", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32)) * 0.5
    t = jnp.full((2,), 10.0)
    v = flax.core.unfreeze(jax.jit(net_x.init)(jax.random.PRNGKey(1), x,
                                               t))
    v["params"]["out_conv"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        v["params"]["out_conv"]["kernel"].shape) * 0.05
    vf = jax.jit(net_f.init)(jax.random.PRNGKey(1), x, t)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(flax.core.unfreeze(vf))
    a = np.asarray(net_x.apply(v, x, t))
    b = np.asarray(net_f.apply(v, x, t))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)
    ga = jax.grad(lambda xx: (net_x.apply(v, xx, t) ** 2).sum())(x)
    gb = jax.grad(lambda xx: (net_f.apply(v, xx, t) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=2e-4, atol=3e-4)
    # train mode: dropout forces the unfused second conv; same rng ->
    # same mask -> outputs agree
    rng = {"dropout": jax.random.PRNGKey(7)}
    at = np.asarray(net_x.apply(v, x, t, train=True, rngs=rng))
    bt = np.asarray(net_f.apply(v, x, t, train=True, rngs=rng))
    np.testing.assert_allclose(bt, at, rtol=2e-4, atol=3e-4)
