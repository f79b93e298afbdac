"""Defended-system EOT-PGD trajectory parity vs the executed reference.

The strongest checkpoint-level parity evidence: run the REFERENCE
``AudioAttack`` (``robustness_eval/white_box_attack.py:362-470``) against
a defended system built from the reference's own ``RevVPSDE``
(``diffusion_models/diffwave_sde.py``) with converted shared weights,
feed it the EXACT noise arrays our jitted attack program derives from
its PRNG key tree (``audiopure_tpu.utils.key_replay``), and require the
full PGD trajectories — adversarial waveforms, per-iteration success
bookkeeping — to agree to float tolerance.

These tests also pin ``key_replay`` in lockstep with the attack
implementation: if the split tree in ``attacks/pgd.py`` / ``attacks/
eot.py`` / ``diffusion/vpsde.py`` drifts, the torch side consumes the
wrong noise and the trajectories diverge.

Gradient contract: the reference eps-net is queried under
``torch.no_grad`` (``diffwave_ddpm.py:166``), so its gradients flow only
through the linear drift/diffusion terms; the torch defender below
backprops through an explicit Euler loop with that same stop-grad eps —
our ``grad_mode='ref'`` contract (see docs/PARITY.md: adjoint vs
backprop-through-Euler agree because the eps term is autodiff-constant
and everything else is linear in x).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


@pytest.fixture(scope="module")
def ref():
    """Reference modules with unavailable deps stubbed (same recipe as
    tests/test_ref_parity.py; torchsde is never called here — the
    defended system below integrates the Euler loop explicitly so the
    attack can backprop through it)."""
    _stub_module("torchsde", sdeint_adjoint=None, sdeint=None,
                 BrownianInterval=None)
    _stub_module("torchaudio")
    _stub_module("torchaudio.datasets")
    _stub_module("torchaudio.datasets.utils",
                 download_url=None, extract_archive=None)
    _stub_module("torchvision", datasets=None, models=None, transforms=None)
    _stub_module("librosa")
    if REF not in sys.path:
        sys.path.append(REF)

    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import importlib

    mods = types.SimpleNamespace(
        wavenet=importlib.import_module(
            "diffusion_models.DiffWave_Unconditional.WaveNet"),
        util=importlib.import_module(
            "diffusion_models.DiffWave_Unconditional.util"),
        ddpm=importlib.import_module("diffusion_models.diffwave_ddpm"),
        sde=importlib.import_module("diffusion_models.diffwave_sde"),
        wb=importlib.import_module("robustness_eval.white_box_attack"),
    )
    yield mods
    torch.Tensor.cuda = orig_tensor_cuda
    torch.nn.Module.cuda = orig_module_cuda


# -- tiny shared config (matches tests/test_ref_parity.py) --------------------

RES, SKIP, LAYERS, CYCLE = 16, 16, 4, 2
EMB_IN, EMB_MID, EMB_OUT = 32, 64, 64
B, L = 2, 512
T_DIFF = 200
T_STAR = 3
N_CLASSES = 4


def unzero_(tnet, std=0.05):
    with torch.no_grad():
        for p in tnet.parameters():
            if p.numel() and bool((p == 0).all()):
                p.normal_(0, std)
    return tnet


@pytest.fixture(scope="module")
def nets(ref):
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.utils.torch_convert import convert_diffwave

    torch.manual_seed(0)
    tnet = unzero_(ref.wavenet.WaveNet_Speech_Commands(
        in_channels=1, res_channels=RES, skip_channels=SKIP, out_channels=1,
        num_res_layers=LAYERS, dilation_cycle=CYCLE,
        diffusion_step_embed_dim_in=EMB_IN,
        diffusion_step_embed_dim_mid=EMB_MID,
        diffusion_step_embed_dim_out=EMB_OUT)).eval()
    params = convert_diffwave(tnet.state_dict(), num_res_layers=LAYERS)
    jnet = WaveNet(res_channels=RES, skip_channels=SKIP,
                   num_res_layers=LAYERS, dilation_cycle=CYCLE,
                   diffusion_step_embed_dim_in=EMB_IN,
                   diffusion_step_embed_dim_mid=EMB_MID,
                   diffusion_step_embed_dim_out=EMB_OUT)
    return tnet, jnet, params


def _ref_vpsde(ref, tnet):
    dh = ref.util.calc_diffusion_hyperparams(T_DIFF, 1e-4, 0.02)
    wrapper = ref.ddpm.DiffWave(tnet, dh, reverse_timestep=T_DIFF)
    return ref.sde.RevVPSDE(model=wrapper, score_type="guided_diffusion",
                            beta_min=1e-4 * T_DIFF, beta_max=0.02 * T_DIFF,
                            N=T_DIFF, audio_shape=(1, L))


class _RefDefendedSystem(torch.nn.Module):
    """Reference purify -> linear classify, with grad through the Euler
    loop exactly as ``sdeint_adjoint`` provides it (eps-net stop-grad via
    the reference's own ``@torch.no_grad`` on ``compute_eps_t``).

    Noise comes from ``torch.randn_like`` — patch it with a FIFO pop to
    inject the JAX-derived draws (order per purify: q-jump ``e``, then
    ``z_0..z_{t-1}``; ``diffwave_sde.py:183-205``).
    """

    def __init__(self, rsde, W):
        super().__init__()
        self.rsde = rsde
        self.W = torch.from_numpy(W)

    def forward(self, x):  # (B, 1, L)
        b = x.shape[0]
        e = torch.randn_like(x)
        abar = (1 - self.rsde.discrete_betas).cumprod(dim=0)
        xt = (x * abar[T_STAR - 1].sqrt()
              + e * (1.0 - abar[T_STAR - 1]).sqrt())
        dt = 1.0 / T_DIFF
        t0 = 1.0 - T_STAR / T_DIFF - 1e-5  # diffwave_sde.py:195-197
        xf = xt.reshape(b, -1)
        for k in range(T_STAR):
            tau = torch.tensor(t0 + k * dt, dtype=torch.float32)
            z = torch.randn_like(x).reshape(b, -1)
            xf = (xf + self.rsde.f(tau, xf) * dt
                  + self.rsde.g(tau, xf) * float(np.sqrt(dt)) * z)
        return xf @ self.W


def _pop_randn_like(draws):
    it = iter(draws)

    def fake(xx, **kw):
        z = torch.from_numpy(np.asarray(next(it)))
        assert z.numel() == xx.numel(), (z.shape, xx.shape)
        return z.reshape(xx.shape)

    return fake


def _jax_system(jnet, params, W):
    from audiopure_tpu.diffusion.vpsde import RevDiffWave

    rd = RevDiffWave(lambda x, s: jnet.apply(params, x, s),
                     T=T_DIFF, t=T_STAR, remat=False)
    Wj = jnp.asarray(W)

    def model_fn(x, key):
        pur = rd(x, key)
        return pur.reshape(pur.shape[0], -1) @ Wj

    return model_fn


def _setup(ref, nets, seed=5):
    tnet, jnet, params = nets
    rng = np.random.RandomState(seed)
    W = (rng.randn(L, N_CLASSES) * 0.05).astype(np.float32)
    x = (rng.randn(B, 1, L) * 0.2).clip(-0.9, 0.9).astype(np.float32)
    y = rng.randint(0, N_CLASSES, size=B).astype(np.int64)
    tsys = _RefDefendedSystem(_ref_vpsde(ref, tnet), W)
    jfn = _jax_system(jnet, params, W)
    return tsys, jfn, x, y


def _run_pair(ref, monkeypatch, tsys, jfn, x, y, *, iters, eot_def,
              eot_atk, share_eot, key):
    from audiopure_tpu.attacks import AudioAttack
    from audiopure_tpu.utils.key_replay import stage1_noise_fifo

    eps = 0.02
    fifo = [arr for call in stage1_noise_fifo(
        key, (B, 1, L), T_STAR, max_iter_1=iters,
        eot_defense_size=eot_def, eot_attack_size=eot_atk,
        share_eot=share_eot) for arr in call]
    monkeypatch.setattr(torch, "randn_like", _pop_randn_like(fifo))
    ratk = ref.wb.AudioAttack(model=tsys, eps=eps, norm="linf",
                              learning_rate_1=eps / 5, max_iter_1=iters,
                              max_iter_2=0, eot_attack_size=eot_atk,
                              eot_defense_size=eot_def, verbose=0)
    x_adv_ref, (succ_ref, _) = ratk.generate(
        torch.from_numpy(x), torch.from_numpy(y), targeted=False)

    jatk = AudioAttack(jfn, eps=eps, norm="linf", learning_rate_1=eps / 5,
                       max_iter_1=iters, max_iter_2=0,
                       eot_attack_size=eot_atk, eot_defense_size=eot_def,
                       share_eot=share_eot)
    x_adv, succ = jatk.generate(jnp.asarray(x), jnp.asarray(y), key)
    if isinstance(succ, tuple):
        succ = succ[0]
    return (x_adv_ref.detach().numpy(), list(succ_ref),
            np.asarray(x_adv), list(np.asarray(succ)))


def test_defended_pgd_trajectory_share_eot(ref, nets, monkeypatch):
    """EOT-1: the reference reuses the prediction forward's graph for
    ``loss.backward()`` (``white_box_attack.py:390,438-440``) — one
    purify draw per iteration — which is our ``share_eot`` semantics."""
    tsys, jfn, x, y = _setup(ref, nets)
    want_x, want_s, got_x, got_s = _run_pair(
        ref, monkeypatch, tsys, jfn, x, y, iters=3, eot_def=1, eot_atk=1,
        share_eot=True, key=jax.random.PRNGKey(11))
    assert got_s == want_s
    np.testing.assert_allclose(got_x, want_x, rtol=1e-3, atol=2e-4)


def test_defended_pgd_trajectory_eot2(ref, nets, monkeypatch):
    """EOT>1 exact pairing: per iteration a prediction stack of
    ``eot_defense_size`` fresh draws then an attack stack of
    ``eot_attack_size`` draws (``white_box_attack.py:386-435``,
    ``_EOT.py:29-63`` with its default replica-chunks of 1)."""
    tsys, jfn, x, y = _setup(ref, nets, seed=9)
    want_x, want_s, got_x, got_s = _run_pair(
        ref, monkeypatch, tsys, jfn, x, y, iters=2, eot_def=2, eot_atk=2,
        share_eot=False, key=jax.random.PRNGKey(13))
    assert got_s == want_s
    np.testing.assert_allclose(got_x, want_x, rtol=1e-3, atol=2e-4)


def test_defended_pgd_trajectory_eot3_asymmetric(ref, nets, monkeypatch):
    """Asymmetric stacks (defense 2, attack 3) pin the FIFO ordering of
    ``key_replay`` — any drift in the split tree scrambles the torch
    side's noise and the trajectories diverge."""
    tsys, jfn, x, y = _setup(ref, nets, seed=17)
    want_x, want_s, got_x, got_s = _run_pair(
        ref, monkeypatch, tsys, jfn, x, y, iters=2, eot_def=2, eot_atk=3,
        share_eot=False, key=jax.random.PRNGKey(29))
    assert got_s == want_s
    np.testing.assert_allclose(got_x, want_x, rtol=1e-3, atol=2e-4)


def test_sample_step_chaining_matches_reference(ref, nets):
    """sample_step=2 purification CHAINS: round 2 re-purifies round 1's
    output (the reference reassigns ``x0 = xs_[-1]`` inside its loop,
    ``diffwave_sde.py:205``), both rounds concatenated along batch."""
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.utils.key_replay import purify_noise

    tnet, jnet, params = nets
    rsde = _ref_vpsde(ref, tnet)
    rd = RevDiffWave(lambda xx, ss: jnet.apply(params, xx, ss),
                     T=T_DIFF, t=T_STAR, sample_step=2, remat=False)

    rng = np.random.RandomState(3)
    x0 = (rng.randn(B, 1, L) * 0.2).astype(np.float32)
    key = jax.random.PRNGKey(7)
    got = np.asarray(rd(jnp.asarray(x0), key))
    assert got.shape == (2 * B, 1, L)

    abar = (1 - rsde.discrete_betas).cumprod(dim=0)
    dt = 1.0 / T_DIFF
    t0 = 1.0 - T_STAR / T_DIFF - 1e-5
    xs = []
    cur = torch.from_numpy(x0)
    with torch.no_grad():
        for k_it in jax.random.split(key, 2):
            noise = purify_noise(k_it, (B, 1, L), T_STAR)
            e = torch.from_numpy(noise[0])
            xf = (cur * abar[T_STAR - 1].sqrt()
                  + e * (1.0 - abar[T_STAR - 1]).sqrt()).reshape(B, -1)
            for k in range(T_STAR):
                tau = torch.tensor(t0 + k * dt, dtype=torch.float32)
                z = torch.from_numpy(noise[k + 1]).reshape(B, -1)
                xf = (xf + rsde.f(tau, xf) * dt
                      + rsde.g(tau, xf) * float(np.sqrt(dt)) * z)
            cur = xf.reshape(B, 1, L)
            xs.append(cur)
    want = torch.cat(xs, dim=0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
