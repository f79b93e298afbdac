"""WaveNet parity vs an independently-built torch implementation.

The reference WaveNet can't run on CPU (hard-coded ``.cuda()`` in
``util.py:88``), so the golden here is a torch module constructed in this
test from the architecture spec (``WaveNet.py:53-172``): same convs, same
gated unit, same FiLM t-embedding, weights copied from the flax params.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiopure_tpu.models.wavenet import WaveNet

RES, SKIP, LAYERS, CYCLE = 8, 8, 4, 2
EMB_IN, EMB_MID, EMB_OUT = 16, 32, 32
L = 256


class TorchWaveNet(torch.nn.Module):
    """Spec-faithful torch WaveNet (fused weight-norm convs)."""

    def __init__(self):
        super().__init__()
        self.init_conv = torch.nn.Conv1d(1, RES, 1)
        self.fc_t1 = torch.nn.Linear(EMB_IN, EMB_MID)
        self.fc_t2 = torch.nn.Linear(EMB_MID, EMB_OUT)
        self.blocks = torch.nn.ModuleList()
        for n in range(LAYERS):
            d = 2 ** (n % CYCLE)
            blk = torch.nn.ModuleDict(dict(
                fc_t=torch.nn.Linear(EMB_OUT, RES),
                dilated=torch.nn.Conv1d(RES, 2 * RES, 3, dilation=d,
                                        padding=d),
                res=torch.nn.Conv1d(RES, RES, 1),
                skip=torch.nn.Conv1d(RES, SKIP, 1),
            ))
            self.blocks.append(blk)
        self.final1 = torch.nn.Conv1d(SKIP, SKIP, 1)
        self.final2 = torch.nn.Conv1d(SKIP, 1, 1)

    @staticmethod
    def t_embed(steps):
        half = EMB_IN // 2
        freq = torch.exp(torch.arange(half).float()
                         * -(math.log(10000.0) / (half - 1)))
        args = steps.float() * freq[None, :]
        return torch.cat([torch.sin(args), torch.cos(args)], dim=1)


def torch_forward(tnet, x, steps):
    emb = TorchWaveNet.t_embed(steps)
    e = tnet.fc_t1(emb)
    emb = e * torch.sigmoid(e)
    e = tnet.fc_t2(emb)
    emb = e * torch.sigmoid(e)

    h = torch.relu(tnet.init_conv(x))
    skip_sum = 0.0
    for blk in tnet.blocks:
        part_t = blk["fc_t"](emb)[:, :, None]
        hb = h + part_t
        hh = blk["dilated"](hb)
        gate = torch.tanh(hh[:, :RES]) * torch.sigmoid(hh[:, RES:])
        # reference residual adds the *biased* x (in-place quirk,
        # ref WaveNet.py:78-97)
        h = (hb + blk["res"](gate)) * math.sqrt(0.5)
        skip_sum = skip_sum + blk["skip"](gate)
    out = skip_sum * math.sqrt(1.0 / LAYERS)
    out = torch.relu(tnet.final1(out))
    return tnet.final2(out)


def _copy_flax_to_torch(params, tnet):
    p = params["params"]

    def conv_w(name):
        # flax (k, in, out) -> torch (out, in, k)
        return torch.from_numpy(
            np.asarray(p[name]["kernel"]).transpose(2, 1, 0).copy())

    def dense(name):
        return (torch.from_numpy(np.asarray(p[name]["kernel"]).T.copy()),
                torch.from_numpy(np.asarray(p[name]["bias"]).copy()))

    with torch.no_grad():
        tnet.init_conv.weight.copy_(conv_w("init_conv"))
        tnet.init_conv.bias.copy_(
            torch.from_numpy(np.asarray(p["init_conv"]["bias"])))
        for fc, name in [(tnet.fc_t1, "fc_t1"), (tnet.fc_t2, "fc_t2")]:
            w, b = dense(name)
            fc.weight.copy_(w); fc.bias.copy_(b)
        for n, blk in enumerate(tnet.blocks):
            bp = p[f"res_block_{n}"]
            w, b = (torch.from_numpy(np.asarray(bp["fc_t"]["kernel"]).T.copy()),
                    torch.from_numpy(np.asarray(bp["fc_t"]["bias"]).copy()))
            blk["fc_t"].weight.copy_(w); blk["fc_t"].bias.copy_(b)
            for tmod, fname in [(blk["dilated"], "dilated_conv"),
                                (blk["res"], "res_conv"),
                                (blk["skip"], "skip_conv")]:
                tmod.weight.copy_(torch.from_numpy(
                    np.asarray(bp[fname]["kernel"]).transpose(2, 1, 0).copy()))
                tmod.bias.copy_(torch.from_numpy(
                    np.asarray(bp[fname]["bias"]).copy()))
        for tmod, fname in [(tnet.final1, "final_conv1"),
                            (tnet.final2, "final_conv2")]:
            tmod.weight.copy_(conv_w(fname))
            tmod.bias.copy_(torch.from_numpy(
                np.asarray(p[fname]["bias"])))


@pytest.fixture(scope="module")
def nets():
    net = WaveNet(res_channels=RES, skip_channels=SKIP,
                  num_res_layers=LAYERS, dilation_cycle=CYCLE,
                  diffusion_step_embed_dim_in=EMB_IN,
                  diffusion_step_embed_dim_mid=EMB_MID,
                  diffusion_step_embed_dim_out=EMB_OUT)
    key = jax.random.PRNGKey(42)
    x0 = jnp.zeros((1, 1, L))
    params = net.init(key, x0, jnp.zeros((1, 1)))
    # randomize the zero-init head so the parity test is non-trivial
    import flax
    params = flax.core.unfreeze(params)
    k = jax.random.PRNGKey(7)
    params["params"]["final_conv2"]["kernel"] = (
        jax.random.normal(k, params["params"]["final_conv2"]["kernel"].shape)
        * 0.1)
    tnet = TorchWaveNet()
    _copy_flax_to_torch(params, tnet)
    return net, params, tnet


def test_wavenet_matches_torch(nets):
    net, params, tnet = nets
    rng = np.random.RandomState(0)
    x = rng.randn(3, 1, L).astype(np.float32) * 0.3
    steps = np.array([[5.0], [0.0], [123.0]], dtype=np.float32)

    got = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(steps)))
    with torch.no_grad():
        want = torch_forward(tnet, torch.from_numpy(x),
                             torch.from_numpy(steps)).numpy()
    assert got.shape == want.shape == (3, 1, L)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_wavenet_zero_init_head():
    """final conv is zero-init (ref ``WaveNet.py:39-48``): fresh net outputs 0."""
    net = WaveNet(res_channels=RES, skip_channels=SKIP, num_res_layers=2,
                  dilation_cycle=2, diffusion_step_embed_dim_in=EMB_IN,
                  diffusion_step_embed_dim_mid=EMB_MID,
                  diffusion_step_embed_dim_out=EMB_OUT)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 1, L))
    params = net.init(key, x, jnp.zeros((2, 1)))
    out = net.apply(params, x, jnp.ones((2, 1)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_wavenet_jit_and_grad(nets):
    net, params, _ = nets
    x = jnp.ones((2, 1, L)) * 0.1
    steps = jnp.ones((2, 1))
    f = jax.jit(lambda p, x: jnp.sum(net.apply(p, x, steps) ** 2))
    g = jax.grad(f, argnums=1)(params, x)
    assert np.isfinite(np.asarray(g)).all()


def test_remat_matches_plain_forward_and_grad():
    """remat=True is numerically transparent: same outputs/grads, only
    the autodiff memory schedule changes (per-block checkpointing)."""
    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=4,
                  dilation_cycle=2, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32,
                  diffusion_step_embed_dim_out=32)
    import dataclasses
    net_r = dataclasses.replace(net, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 256)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    params = net.init(jax.random.PRNGKey(1), x, t)
    # param trees interchangeable
    out = net.apply(params, x, t)
    out_r = net_r.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(net.apply(p, x, t) ** 2))(params)
    g_r = jax.grad(lambda p: jnp.sum(net_r.apply(p, x, t) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_gates_matches_plain_forward_and_grad():
    """remat='gates' (save the named gate transcendentals, recompute
    only elementwise on backward) is numerically transparent too."""
    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=4,
                  dilation_cycle=2, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32,
                  diffusion_step_embed_dim_out=32)
    import dataclasses
    net_g = dataclasses.replace(net, remat="gates")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 256)) * 0.3
    t = jnp.asarray([[3.0], [17.0]])
    params = net.init(jax.random.PRNGKey(1), x, t)
    np.testing.assert_allclose(np.asarray(net_g.apply(params, x, t)),
                               np.asarray(net.apply(params, x, t)),
                               rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(net.apply(p, x, t) ** 2))(params)
    g_r = jax.grad(lambda p: jnp.sum(net_g.apply(p, x, t) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
