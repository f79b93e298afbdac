"""Pallas fused WaveNet block: parity with the flax model (interpret mode
on CPU; the compiled path is exercised by bench.py on the TPU)."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from audiopure_tpu.kernels.wavenet_block import (fused_residual_block,
                                                 fused_residual_block_v3,
                                                 wavenet_forward_pallas)
from audiopure_tpu.models.wavenet import WaveNet


def _net_and_params(layers=4, cycle=2):
    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=layers,
                  dilation_cycle=cycle, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32,
                  diffusion_step_embed_dim_out=32)
    x = jnp.zeros((1, 1, 400))
    params = flax.core.unfreeze(
        net.init(jax.random.PRNGKey(1), x, jnp.zeros((1, 1))))
    params["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2),
        params["params"]["final_conv2"]["kernel"].shape) * 0.1
    return net, params


@pytest.mark.parametrize(
    "impl", [pytest.param("v2", marks=pytest.mark.heavy), "v3"])
def test_full_forward_matches_flax(impl):
    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 400)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=4, dilation_cycle=2, embed_dim_in=16,
        dtype=jnp.float32, tile_l=80, block_impl=impl, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "impl", [pytest.param("v2", marks=pytest.mark.heavy), "v3"])
@pytest.mark.parametrize("dilation", [1, 4, 64, 120])
def test_block_dilation_edges(dilation, impl):
    """Edge correctness: zero padding (not bias) beyond the signal, for
    dilations smaller and larger than the tile."""
    C, L, TL = 8, 256, 128
    key = jax.random.PRNGKey(dilation)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (1, L, C)) * 0.5
    tb = jax.random.normal(ks[1], (1, C)) * 0.5
    wd = jax.random.normal(ks[2], (3, C, 2 * C)) * 0.2
    bd = jax.random.normal(ks[3], (2 * C,)) * 0.1
    wres = jax.random.normal(ks[4], (C, C)) * 0.2
    bres = jax.random.normal(ks[5], (C,)) * 0.1
    wskip = jax.random.normal(ks[6], (C, C)) * 0.2
    bskip = jax.random.normal(ks[7], (C,)) * 0.1

    acc = jax.random.normal(jax.random.PRNGKey(99), (1, L, C)) * 0.3
    fn = fused_residual_block if impl == "v2" else fused_residual_block_v3
    got_x, got_s = fn(
        x, tb, wd, bd, wres, bres, wskip, bskip, acc, dilation=dilation,
        tile_l=TL, interpret=True)

    # numpy reference of the reference block semantics
    xb = np.asarray(x + tb[:, None, :])[0]
    xp = np.pad(xb, ((dilation, dilation), (0, 0)))
    h = (xp[:L] @ np.asarray(wd[0])
         + xp[dilation: dilation + L] @ np.asarray(wd[1])
         + xp[2 * dilation: 2 * dilation + L] @ np.asarray(wd[2])
         + np.asarray(bd))
    gate = np.tanh(h[:, :C]) / (1 + np.exp(-h[:, C:]))
    # residual adds the *biased* x (ref in-place quirk, WaveNet.py:78-97)
    want_x = (xb + gate @ np.asarray(wres)
              + np.asarray(bres)) * np.sqrt(0.5)
    want_s = (gate @ np.asarray(wskip) + np.asarray(bskip)
              + np.asarray(acc)[0])
    np.testing.assert_allclose(np.asarray(got_x)[0], want_x, atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s)[0], want_s, atol=1e-4,
                               rtol=1e-3)


def _np_block(xb, wd, bd, wres, bres, wskip, bskip, d, L, C):
    """numpy reference of one residual block on the biased input xb."""
    xp = np.pad(xb, ((d, d), (0, 0)))
    h = (xp[:L] @ np.asarray(wd[0])
         + xp[d: d + L] @ np.asarray(wd[1])
         + xp[2 * d: 2 * d + L] @ np.asarray(wd[2]) + np.asarray(bd))
    gate = np.tanh(h[:, :C]) / (1 + np.exp(-h[:, C:]))
    x_next = (xb + gate @ np.asarray(wres) + np.asarray(bres)) * np.sqrt(0.5)
    skip = gate @ np.asarray(wskip) + np.asarray(bskip)
    return x_next, skip


@pytest.mark.parametrize("d1", [1, 4, 16, 64])
def test_fused_pair_matches_two_blocks(d1):
    """The pair kernel must equal two sequential reference blocks,
    including boundary zero-padding of BOTH layers."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_pair

    d2 = 2 * d1
    C, L, TL = 8, 1024, 512 if d1 == 64 else 256
    key = jax.random.PRNGKey(d1)
    ks = jax.random.split(key, 16)
    x = jax.random.normal(ks[0], (2, L, C)) * 0.5
    tb1 = jax.random.normal(ks[1], (2, C)) * 0.5
    tb2 = jax.random.normal(ks[2], (2, C)) * 0.5

    def wset(i):
        return (jax.random.normal(ks[3 + i], (3, C, 2 * C)) * 0.2,
                jax.random.normal(ks[4 + i], (2 * C,)) * 0.1,
                jax.random.normal(ks[5 + i], (C, C)) * 0.2,
                jax.random.normal(ks[6 + i], (C,)) * 0.1,
                jax.random.normal(ks[7 + i], (C, C)) * 0.2,
                jax.random.normal(ks[8 + i], (C,)) * 0.1)

    w1, w2 = wset(0), wset(6)
    acc = jax.random.normal(ks[15], (2, L, C)) * 0.3
    got_x, got_s = fused_residual_pair(x, tb1, tb2, w1, w2, acc,
                                       d1=d1, d2=d2, tile_l=TL,
                                       interpret=True)
    for b in range(2):
        xb1 = np.asarray(x)[b] + np.asarray(tb1)[b]
        x1, s1 = _np_block(xb1, *[np.asarray(a) for a in w1], d1, L, C)
        xb2 = x1 + np.asarray(tb2)[b]
        x2, s2 = _np_block(xb2, *[np.asarray(a) for a in w2], d2, L, C)
        np.testing.assert_allclose(np.asarray(got_x)[b], x2, atol=1e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_s)[b],
                                   s1 + s2 + np.asarray(acc)[b],
                                   atol=1e-4, rtol=1e-3)


def test_full_forward_v4_matches_flax():
    """v4 (pair-fused) full forward == flax model; L/tile chosen so the
    pair path actually engages (halo sum <= tile_l // 8)."""
    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 1024)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=4, dilation_cycle=2, embed_dim_in=16,
        dtype=jnp.float32, tile_l=256, block_impl="v4", interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_full_forward_v5_matches_flax():
    """v5 (whole-net layer-resident kernel) == flax model, including the
    zero-padding margins and the cross-cycle ping-pong (4 layers = 2
    cycles of 2)."""
    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 1024)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=4, dilation_cycle=2, embed_dim_in=16,
        dtype=jnp.float32, block_impl="v5", interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.heavy
def test_full_forward_v5_odd_cycle_matches_flax():
    """Odd dilation_cycle exercises the xb->xa copy-back across cycles."""
    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=6,
                  dilation_cycle=3, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32,
                  diffusion_step_embed_dim_out=32)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 1024)) * 0.3
    t = jnp.asarray([[7.0]])
    params = flax.core.unfreeze(
        net.init(jax.random.PRNGKey(10), x, jnp.zeros((1, 1))))
    params["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(11),
        params["params"]["final_conv2"]["kernel"].shape) * 0.1
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=6, dilation_cycle=3, embed_dim_in=16,
        dtype=jnp.float32, block_impl="v5", interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.heavy
def test_full_forward_v4_single_tile_short_audio():
    """L == tile_l: the pair window (tile + 2*halos) exceeds L, so the
    clamped element-offset read would go out of bounds — dispatch must
    fall back to single blocks and stay exact (advisor r2 finding)."""
    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 1, 256)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=4, dilation_cycle=2, embed_dim_in=16,
        dtype=jnp.float32, tile_l=256, block_impl="v4", interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.heavy
def test_full_forward_v4_tile_upgrade_matches_flax():
    """The (64,128) pair only fits a 2x tile (2*halo(128)=256 > 512//3);
    this config drives the per-pair tile-upgrade path end to end."""
    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=8,
                  dilation_cycle=12, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32,
                  diffusion_step_embed_dim_out=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 4096)) * 0.3
    t = jnp.asarray([[5.0]])
    params = flax.core.unfreeze(
        net.init(jax.random.PRNGKey(4), x, jnp.zeros((1, 1))))
    params["params"]["final_conv2"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(5),
        params["params"]["final_conv2"]["kernel"].shape) * 0.1
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=8, dilation_cycle=12, embed_dim_in=16,
        dtype=jnp.float32, tile_l=512, block_impl="v4", interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.heavy
def test_cli_pallas_path_selects_grad_kernel():
    """--conv_impl pallas --grad_mode full must route through a
    custom-VJP wrapper ('ref' keeps the forward-only kernel): the
    whole-net input-grad VJP when layers fill whole dilation cycles,
    the per-layer VJP otherwise."""
    from cli.common import pallas_forward_fn

    fwd = pallas_forward_fn("full")
    assert callable(fwd) and fwd is not wavenet_forward_pallas
    assert pallas_forward_fn("ref") is wavenet_forward_pallas

    # dispatch correctness on a tiny net: full-cycle config must give the
    # same value as the forward-only kernel and be differentiable
    net = WaveNet(res_channels=16, skip_channels=16, num_res_layers=12,
                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 400)) * 0.3
    t = jnp.full((1, 1), 3.0)
    params = net.init(jax.random.PRNGKey(1), x, t)
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(fwd(params, x, t, num_res_layers=12,
                         dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    g = jax.grad(lambda xx: fwd(params, xx, t, num_res_layers=12,
                                dtype=jnp.float32).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_full_grad_purifier_on_pallas_eps_net():
    """grad_mode='full' RevDiffWave gradients through the pallas eps-net
    (interpret mode) match the flax/XLA eps-net."""
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.kernels.wavenet_block_grad import \
        wavenet_forward_pallas_grad

    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 400)) * 0.3
    key = jax.random.PRNGKey(8)

    def purify_loss(eps_fn, xx):
        rd = RevDiffWave(eps_fn, T=50, t=2, grad_mode="full")
        return jnp.sum(rd(xx, key) ** 2)

    eps_xla = lambda a, t: net.apply(params, a, t)
    eps_pal = lambda a, t: wavenet_forward_pallas_grad(
        params, a, t, num_res_layers=4, dilation_cycle=2, embed_dim_in=16,
        dtype=jnp.float32, tile_l=80)

    v1, g1 = jax.value_and_grad(lambda xx: purify_loss(eps_xla, xx))(x)
    v2, g2 = jax.value_and_grad(lambda xx: purify_loss(eps_pal, xx))(x)
    np.testing.assert_allclose(v2, v1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4,
                               rtol=1e-3)


def test_wavenet_pallas_grad_matches_xla_autodiff():
    """wavenet_forward_pallas_grad (custom VJP: pallas fwd + recompute
    bwd) must match jax.grad through the flax/XLA net — params, input,
    and value."""
    from audiopure_tpu.kernels.wavenet_block_grad import \
        wavenet_forward_pallas_grad

    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 400)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    w = jax.random.normal(jax.random.PRNGKey(6), (2, 1, 400))

    def loss_xla(p, xx):
        return jnp.sum(net.apply(p, xx, t) * w)

    def loss_pallas(p, xx):
        return jnp.sum(wavenet_forward_pallas_grad(
            p, xx, t, num_res_layers=4, dilation_cycle=2, embed_dim_in=16,
            dtype=jnp.float32, tile_l=80) * w)

    (v1, gx1), gp1 = jax.value_and_grad(loss_xla, argnums=(1,))(params, x), \
        jax.grad(loss_xla)(params, x)
    (v2, gx2), gp2 = jax.value_and_grad(loss_pallas, argnums=(1,))(
        params, x), jax.grad(loss_pallas)(params, x)

    np.testing.assert_allclose(v2, v1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx2[0]), np.asarray(gx1[0]),
                               atol=1e-4, rtol=1e-3)
    flat1 = flax.traverse_util.flatten_dict(gp1["params"])
    flat2 = flax.traverse_util.flatten_dict(gp2["params"])
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat2[k]),
                                   np.asarray(flat1[k]), atol=1e-3,
                                   rtol=1e-3, err_msg=str(k))


@pytest.mark.heavy
def test_v5_long_audio_falls_back_within_vmem():
    """L beyond the layer-resident VMEM budget must not OOM: the v5 path
    re-dispatches (v5x hbm_io first, v4 past that; measured on-chip v5
    OOM at L=24000: 160.59M of 128M). Correctness of the re-dispatch
    checked against flax."""
    net = WaveNet(res_channels=16, skip_channels=16, num_res_layers=12,
                  dtype=jnp.float32)
    L = 24000
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, L)) * 0.3
    t = jnp.full((1, 1), 5.0)
    params = net.init(jax.random.PRNGKey(1), x, t)
    want = np.asarray(net.apply(params, x, t))
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=12, dtype=jnp.float32,
        block_impl="v5", interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_full_forward_v5x_hbm_io_matches_flax():
    """v5x (hbm_io whole-net kernel: input/skip in HBM, explicit DMAs
    replacing the double-buffered staging blocks) == flax, including the
    margin zeroing around the DMA'd input and the last-cycle skip DMA
    out.  This is the production path for the 1.5 s KWS bucket length
    (L=24000 bf16), where v5's resident set exceeds VMEM."""
    from audiopure_tpu.kernels.wavenet_block import (
        fused_residual_stack, wavenet_head, wavenet_stack_inputs,
        wavenet_stem)

    net, params = _net_and_params()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 1024)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    want = np.asarray(net.apply(params, x, t))
    p = params["params"]
    emb, h = wavenet_stem(p, x, t, 16, jnp.float32)
    stack_in = wavenet_stack_inputs(p, emb, 4, jnp.float32)
    skip = fused_residual_stack(h, *stack_in, dilation_cycle=2,
                                chunk_l=256, interpret=True, hbm_io=True)
    got = np.asarray(wavenet_head(p, skip, 4))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_stack_chunk_loop_bit_matches_unrolled():
    """chunk_loop=True (lax.fori_loop chunk body: one compiled body +
    pl.ds dynamic slices + uniform boundary mask, instead of L/chunk_l
    unrolled copies) is pure codegen — it must be BIT-identical to the
    unrolled path on both io modes and across chunk sizes.  Built for
    the f32 VMEM fit: the unrolled f32 body spills ~50 MB of vregs
    (round-4h OOM dumps, docs/BENCH.md)."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_stack

    rng = jax.random.PRNGKey(7)
    B, L, C, NL, cyc, Cs = 2, 512, 8, 4, 2, 8
    ks = jax.random.split(rng, 8)
    args = (jax.random.normal(ks[0], (B, L, C)),
            jax.random.normal(ks[1], (B, NL, C)) * 0.1,
            jax.random.normal(ks[2], (NL, 3, C, 2 * C)) * 0.3,
            jax.random.normal(ks[3], (NL, 2 * C)) * 0.1,
            jax.random.normal(ks[4], (NL, C, C)) * 0.3,
            jax.random.normal(ks[5], (NL, C)) * 0.1,
            jax.random.normal(ks[6], (NL, C, Cs)) * 0.3,
            jax.random.normal(ks[7], (NL, Cs)) * 0.1)
    for hbm_io in (False, True):
        base = fused_residual_stack(*args, dilation_cycle=cyc,
                                    chunk_l=128, interpret=True,
                                    hbm_io=hbm_io)
        for chunk in (64, 128):
            loop = fused_residual_stack(*args, dilation_cycle=cyc,
                                        chunk_l=chunk, interpret=True,
                                        hbm_io=hbm_io, chunk_loop=True)
            assert float(jnp.abs(base - loop).max()) == 0.0, (hbm_io,
                                                              chunk)


def test_v5x_dispatch_at_kws_bucket_length():
    """The dispatch table: bf16 L=24000 must select v5x (est 103.7 MB
    <= 118), not the v4 fallback; f32 L=24000 stays v4 (est 196.9)."""
    from audiopure_tpu.kernels.wavenet_block import (v5_vmem_est_mb,
                                                     v5x_vmem_est_mb)
    assert v5_vmem_est_mb(24000, 2) > 118.0          # v5 proper OOMs
    assert v5x_vmem_est_mb(24000, 2) <= 118.0        # v5x fits
    assert v5x_vmem_est_mb(24000, 4) > 118.0         # f32 falls past v5x


def test_forward_dispatch_bands():
    """Pin the whole-net forward dispatch bands at the flagship
    256/256-channel config so estimate drift can't silently change
    dispatch (round-4h/4i measurements, docs/BENCH.md):

      bf16 L=16000  resident v5 (measured 84-93.6% of peak)
      bf16 L=24000  v5x hbm_io (KWS bucket; v5 measured OOM 160.59M)
      f32  L=16000  v5x + chunk_loop, chunk 2000 (unrolled v5x measured
                    OOM 156.7M of 128M — ~50M vreg spills; chunk_loop
                    measured fit, 82.4% of peak at b16)
      f32  L=24000-32000  w_hbm (chunk_loop measured OOM 143.55M of
                    128M at every chunk size, round-5a; w_hbm streams
                    the per-layer weights and is measured FIT at
                    74.6-86.4% of peak, 1.24-1.26x the v4 fallback,
                    round-5b/5c)
      f32  L>32000  v4 (w_hbm measured OOM 133.93M at L=36000 and
                    145.65M at L=40000 — round-5c)

    An explicit chunk_l override opts out of the chunk_loop/w_hbm
    rescues (measured probes force their own configuration)."""
    from audiopure_tpu.kernels.wavenet_block import forward_dispatch_band

    assert forward_dispatch_band(16000, 2) == ("resident", None)
    assert forward_dispatch_band(24000, 2) == ("hbm_io", None)
    assert forward_dispatch_band(16000, 4) == ("chunk_loop", 2000)
    assert forward_dispatch_band(24000, 4) == ("whbm", 2000)
    assert forward_dispatch_band(32000, 4) == ("whbm", 2000)
    assert forward_dispatch_band(36000, 4) == ("v4", None)
    assert forward_dispatch_band(40000, 4) == ("v4", None)
    assert forward_dispatch_band(16000, 4, chunk_l=4000) == ("v4", None)
    assert forward_dispatch_band(24000, 4, chunk_l=4000) == ("v4", None)
    # w_hbm rides the same measurement gates as chunk_loop (cyc=12,
    # <=256 ch — ADVICE r4)
    assert forward_dispatch_band(24000, 4, cyc=14) == ("v4", None)
    # small-channel models fit resident even at f32 long audio (the
    # estimates are calibrated at 256 ch and scale by channel ratio)
    assert forward_dispatch_band(24000, 4, c_res=16, skip_ch=16) \
        == ("resident", None)
    # ADVICE r4: the chunk_loop fit was only measured at cyc=12 — a
    # larger dilation_cycle must fall back to v4, not dispatch into an
    # unmeasured VMEM fit
    assert forward_dispatch_band(16000, 4, cyc=14) == ("v4", None)
    # ADVICE r4: the resident weights term scales quadratically with
    # channels; a 512-ch config at short L must NOT be kept resident by
    # a linearly-scaled estimate (weights alone are ~4x the 13 MB pin)
    mode_512, _ = forward_dispatch_band(8000, 2, c_res=512, skip_ch=512)
    assert mode_512 != "resident"
    from audiopure_tpu.kernels.wavenet_block import v5_vmem_est_mb
    # quadratic weights component: 512 ch weights = 4x the 256-ch 13 MB
    assert v5_vmem_est_mb(16000, 2, c_res=512, skip_ch=512) >= \
        104.0 * 2 + 13.0 * 4 - 1e-6


def test_full_forward_f32_chunk_loop_dispatch_matches_flax(monkeypatch):
    """The auto f32 rescue path end-to-end: when the band says
    chunk_loop, wavenet_forward_pallas must hand fused_residual_stack
    ``hbm_io=True, chunk_loop=True`` with the band's chunk — and still
    match flax.  (The tiny test net would fit resident on its own, so
    the band is pinned; the 256-ch band decision itself is
    test_forward_dispatch_bands.)"""
    from audiopure_tpu.kernels import wavenet_block as wb

    net, params = _net_and_params()
    L = 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, L)) * 0.3
    t = jnp.asarray([[5.0]])
    want = np.asarray(net.apply(params, x, t))
    monkeypatch.setattr(wb, "forward_dispatch_band",
                        lambda *a, **kw: ("chunk_loop", 256))
    calls = []
    orig = wb.fused_residual_stack

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(wb, "fused_residual_stack", spy)
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=4, dilation_cycle=2,
        embed_dim_in=16, dtype=jnp.float32, interpret=True))
    assert calls and calls[0]["chunk_loop"] and calls[0]["hbm_io"]
    assert calls[0]["chunk_l"] == 256
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_full_forward_f32_whbm_dispatch_matches_flax(monkeypatch):
    """The auto f32 long-audio rescue: when the band says whbm,
    wavenet_forward_pallas must hand fused_residual_stack
    ``hbm_io=True, chunk_loop=True, w_hbm=True`` with the band's chunk
    — and still match flax (round-5b: bit-exact vs v4 on-chip)."""
    from audiopure_tpu.kernels import wavenet_block as wb

    net, params = _net_and_params()
    L = 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, L)) * 0.3
    t = jnp.asarray([[5.0]])
    want = np.asarray(net.apply(params, x, t))
    monkeypatch.setattr(wb, "forward_dispatch_band",
                        lambda *a, **kw: ("whbm", 256))
    calls = []
    orig = wb.fused_residual_stack

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(wb, "fused_residual_stack", spy)
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=4, dilation_cycle=2,
        embed_dim_in=16, dtype=jnp.float32, interpret=True))
    assert calls and calls[0]["w_hbm"] and calls[0]["chunk_loop"] \
        and calls[0]["hbm_io"]
    assert calls[0]["chunk_l"] == 256
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_v6_bf16_gate_default_matches_flax_bf16():
    """The TPU production path (bf16 compute -> v6 bf16-gate default):
    interpret-mode parity with the flax bf16 model at bf16-rounding
    tolerance."""
    net = WaveNet(res_channels=16, skip_channels=16, num_res_layers=12,
                  dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 400)) * 0.3
    t = jnp.full((2, 1), 5.0)
    params = net.init(jax.random.PRNGKey(1), x, t)
    want = np.asarray(net.apply(params, x, t), dtype=np.float32)
    got = np.asarray(wavenet_forward_pallas(
        params, x, t, num_res_layers=12, dtype=jnp.bfloat16,
        block_impl="v5", interpret=True), dtype=np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() < 0.05 * scale, (
        np.abs(got - want).max(), scale)


def test_stack_hbm_io_vmap_folds_into_batch():
    """A replica ``vmap`` (the EOT/NES axis) over the hbm_io /
    chunk_loop stack must fold into the batch grid dim via the
    ``custom_vmap`` collapse rule — Pallas TPU rejects the auto-batched
    form of ANY-space blocks (round-5 f32 EOT bench crash).  Semantics
    pinned against the per-replica python loop, both io modes."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_stack

    rng = jax.random.PRNGKey(11)
    E, B, L, C, NL, cyc, Cs = 3, 2, 512, 8, 4, 2, 8
    ks = jax.random.split(rng, 8)
    xs = jax.random.normal(ks[0], (E, B, L, C))
    tb = jax.random.normal(ks[1], (B, NL, C)) * 0.1
    ws = (jax.random.normal(ks[2], (NL, 3, C, 2 * C)) * 0.3,
          jax.random.normal(ks[3], (NL, 2 * C)) * 0.1,
          jax.random.normal(ks[4], (NL, C, C)) * 0.3,
          jax.random.normal(ks[5], (NL, C)) * 0.1,
          jax.random.normal(ks[6], (NL, C, Cs)) * 0.3,
          jax.random.normal(ks[7], (NL, Cs)) * 0.1)

    for chunk_loop in (False, True):
        def one(x):
            return fused_residual_stack(
                x, tb, *ws, dilation_cycle=cyc, chunk_l=128,
                interpret=True, hbm_io=True, chunk_loop=chunk_loop)

        want = jnp.stack([one(xs[i]) for i in range(E)])
        got = jax.vmap(one)(xs)
        assert float(jnp.abs(got - want).max()) == 0.0, chunk_loop

    # per-replica t_biases too (both row args mapped)
    tbs = jax.random.normal(jax.random.PRNGKey(12), (E, B, NL, C)) * 0.1
    two = lambda x, t: fused_residual_stack(
        x, t, *ws, dilation_cycle=cyc, chunk_l=128, interpret=True,
        hbm_io=True)
    want = jnp.stack([two(xs[i], tbs[i]) for i in range(E)])
    got = jax.vmap(two)(xs, tbs)
    assert float(jnp.abs(got - want).max()) == 0.0

    # mapped WEIGHTS (per-replica params) take the lax.map fallback
    wds = jnp.stack([ws[0] * (1.0 + 0.1 * i) for i in range(E)])
    three = lambda x, wd: fused_residual_stack(
        x, tb, wd, *ws[1:], dilation_cycle=cyc, chunk_l=128,
        interpret=True, hbm_io=True)
    want = jnp.stack([three(xs[i], wds[i]) for i in range(E)])
    got = jax.vmap(three)(xs, wds)
    assert float(jnp.abs(got - want).max()) == 0.0


def test_stack_w_hbm_bit_matches_resident_weights():
    """w_hbm=True (weights stay in HBM and stream through 2-slot VMEM
    scratch with per-layer prefetched DMAs, per-cycle bias slabs) is
    pure data movement — BIT-identical to the VMEM-window path on both
    chunk modes and at f32 (the dtype the mode exists for: the f32
    double-buffered cycle windows are ~50 MB of the measured 143.55M
    OOM at L=24000, round-5b)."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_stack

    rng = jax.random.PRNGKey(7)
    B, L, C, NL, cyc, Cs = 2, 512, 8, 4, 2, 8
    ks = jax.random.split(rng, 8)
    for dt in (jnp.float32, jnp.bfloat16):
        args = (jax.random.normal(ks[0], (B, L, C), dt),
                jax.random.normal(ks[1], (B, NL, C), dt) * 0.1,
                jax.random.normal(ks[2], (NL, 3, C, 2 * C), dt) * 0.3,
                jax.random.normal(ks[3], (NL, 2 * C)) * 0.1,
                jax.random.normal(ks[4], (NL, C, C), dt) * 0.3,
                jax.random.normal(ks[5], (NL, C)) * 0.1,
                jax.random.normal(ks[6], (NL, C, Cs), dt) * 0.3,
                jax.random.normal(ks[7], (NL, Cs)) * 0.1)
        # like-for-like twin at the SAME chunk mode: bf16 chunk_loop
        # differs from the unrolled body by CPU-interpret bf16 double
        # rounding (pre-existing, never dispatched — bf16 keeps the
        # unrolled body), so the data-movement claim is pinned against
        # the matching non-w_hbm config, not across chunk modes
        for chunk_loop in (False, True):
            base = fused_residual_stack(*args, dilation_cycle=cyc,
                                        chunk_l=128, interpret=True,
                                        hbm_io=True,
                                        chunk_loop=chunk_loop)
            got = fused_residual_stack(*args, dilation_cycle=cyc,
                                       chunk_l=128, interpret=True,
                                       hbm_io=True,
                                       chunk_loop=chunk_loop, w_hbm=True)
            assert float(jnp.abs(
                (base - got).astype(jnp.float32)).max()) == 0.0, (
                dt, chunk_loop)


def test_stack_w_hbm_vmap_folds_into_batch():
    """The EOT/NES replica ``vmap`` over the w_hbm stack folds into the
    batch grid dim (same custom_vmap collapse as hbm_io — w_hbm rides
    the same ANY-space restriction)."""
    from audiopure_tpu.kernels.wavenet_block import fused_residual_stack

    rng = jax.random.PRNGKey(11)
    E, B, L, C, NL, cyc, Cs = 3, 2, 512, 8, 4, 2, 8
    ks = jax.random.split(rng, 8)
    xs = jax.random.normal(ks[0], (E, B, L, C))
    tb = jax.random.normal(ks[1], (B, NL, C)) * 0.1
    ws = (jax.random.normal(ks[2], (NL, 3, C, 2 * C)) * 0.3,
          jax.random.normal(ks[3], (NL, 2 * C)) * 0.1,
          jax.random.normal(ks[4], (NL, C, C)) * 0.3,
          jax.random.normal(ks[5], (NL, C)) * 0.1,
          jax.random.normal(ks[6], (NL, C, Cs)) * 0.3,
          jax.random.normal(ks[7], (NL, Cs)) * 0.1)

    def one(x):
        return fused_residual_stack(
            x, tb, *ws, dilation_cycle=cyc, chunk_l=128,
            interpret=True, hbm_io=True, chunk_loop=True, w_hbm=True)

    want = jnp.stack([one(xs[i]) for i in range(E)])
    got = jax.vmap(one)(xs)
    assert float(jnp.abs(got - want).max()) == 0.0
