"""Executed-reference goldens for the black-box attack stack.

Runs the living reference classes at ``/root/reference/robustness_eval/``
(``_EOT.py``, ``_NES.py``, ``black_box_attack.py``) on a tiny torch
classifier with INJECTED noise (torch.randn patched to pop the exact
draws the JAX side makes) and diffs full trajectories — iterates, LR
schedule state effects, retirement — against the masked
fixed-shape reimplementations in ``audiopure_tpu.attacks``.

Key semantics these tests pin (see docs/PARITY.md):

* EOT chunked averaging of scores/loss/grad + per-replica decisions
  (``_EOT.py:19-69``).
* NES antithetic estimator with the clean point prepended to the first
  draw batch (``_NES.py:15-56``).
* FAKEBOB under the reference's ACTIVE ``resolve_loss`` dispatch for
  SCR: plain CE ascent (``_utils.py:117-126``), so ``delete_found``
  never fires, the min-loss best-x bookkeeping keeps the first iterate,
  and the stop-early "convergence" check retires samples whose loss
  moved — reproduced by ``FAKEBOB(loss_mode='ce_ref')``
  (``black_box_attack.py:49-133``).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"

B, L, C = 3, 64, 4


@pytest.fixture(scope="module")
def refmods():
    if REF not in sys.path:
        sys.path.append(REF)
    import importlib

    return types.SimpleNamespace(
        eot=importlib.import_module("robustness_eval._EOT"),
        nes=importlib.import_module("robustness_eval._NES"),
        bb=importlib.import_module("robustness_eval.black_box_attack"),
        utils=importlib.import_module("robustness_eval._utils"),
    )


def _lin_w(seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(L, C) * 0.6).astype(np.float32)


def _jax_model(W):
    Wj = jnp.asarray(W)

    def model_fn(x, key):  # deterministic; key unused
        return x[:, 0, :] @ Wj

    return model_fn


class _TorchLin(torch.nn.Module):
    def __init__(self, W):
        super().__init__()
        self.W = torch.from_numpy(W)

    def forward(self, x):  # (N, 1, L)
        return x[:, 0, :] @ self.W


def _pop_randn(draws):
    """torch.randn replacement popping pre-recorded JAX draws (shape must
    match the requested size exactly)."""
    it = iter(draws)

    def fake_randn(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (list, tuple)):
            size = tuple(size[0])
        z = torch.from_numpy(np.asarray(next(it)))
        assert tuple(z.shape) == tuple(size), (z.shape, size)
        return z

    return fake_randn


# -- 1. EOT wrapper -----------------------------------------------------------

def test_eot_chunked_matches_reference(refmods, monkeypatch):
    """Chunked EOT averaging (scores/loss/grad) + per-replica decisions
    vs the reference loop (``_EOT.py:30-68``), stochastic model, E=4 in
    chunks of 2, identical injected noise per replica."""
    from audiopure_tpu.attacks.eot import EOT
    from audiopure_tpu.attacks.losses import cross_entropy

    W = _lin_w(0)
    E, chunk = 4, 2
    rng = np.random.RandomState(1)
    x = (rng.rand(B, 1, L).astype(np.float32) - 0.5) * 0.4
    y = np.array([0, 1, 2])

    def jmodel(xx, key):
        return xx[:, 0, :] @ jnp.asarray(W) \
            + 0.3 * jax.random.normal(key, (xx.shape[0], C))

    key = jax.random.PRNGKey(3)
    eot_j = EOT(jmodel, cross_entropy, eot_size=E, chunk=chunk,
                use_grad=True)
    scores_j, loss_j, grad_j, dec_j = eot_j(jnp.asarray(x), jnp.asarray(y),
                                            key)

    # replica r draws normal(keys[r], (B, C)) — replicate for torch
    keys = jax.random.split(key, E)
    noises = [np.asarray(jax.random.normal(k, (B, C))) for k in keys]

    class TNoisy(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.W = torch.from_numpy(W)
            self.r = 0

        def forward(self, xx):  # (R*B, 1, L), replica-major rows
            R = xx.shape[0] // B
            noise = torch.from_numpy(
                np.concatenate(noises[self.r: self.r + R], axis=0))
            self.r += R
            return xx[:, 0, :] @ self.W + 0.3 * noise

    tmodel = TNoisy()
    eot_t = refmods.eot.EOT(tmodel, torch.nn.CrossEntropyLoss(
        reduction="none"), EOT_size=E, EOT_batch_size=chunk, use_grad=True)
    xt = torch.from_numpy(x).requires_grad_(True)
    scores_t, loss_t, grad_t, dec_t = eot_t(xt, torch.from_numpy(y))

    np.testing.assert_allclose(np.asarray(scores_j),
                               scores_t.detach().numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(loss_j), loss_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_j), grad_t.numpy(),
                               rtol=1e-4, atol=1e-7)
    # decisions: ours (R, B) vs reference per-audio lists
    np.testing.assert_array_equal(np.asarray(dec_j).T, np.asarray(dec_t))


# -- 2. NES estimator ---------------------------------------------------------

def test_nes_matches_reference(refmods, monkeypatch):
    """Antithetic NES estimate + clean-point convention
    (``_NES.py:15-56``): identical injected u draws, deterministic
    model, 2 draw batches."""
    from audiopure_tpu.attacks.losses import cross_entropy
    from audiopure_tpu.attacks.nes import NES

    W = _lin_w(2)
    spd, spdb, sigma = 8, 4, 0.01
    half, nb = spdb // 2, spd // spdb
    rng = np.random.RandomState(4)
    x = (rng.rand(B, 1, L).astype(np.float32) - 0.5) * 0.4
    y = np.array([1, 0, 3])

    key = jax.random.PRNGKey(9)
    nes_j = NES(_jax_model(W), cross_entropy, samples_per_draw=spd,
                samples_per_draw_batch=spdb, sigma=sigma)
    res = nes_j(jnp.asarray(x), jnp.asarray(y), key)

    # torch pops (B, half, 1, L) per draw batch; ours draws (half, B, 1, L)
    keys = jax.random.split(key, nb + 1)
    pops = []
    for i in range(nb):
        k_noise, _ = jax.random.split(keys[i])
        u = np.asarray(jax.random.normal(k_noise, (half, B, 1, L)))
        pops.append(u.transpose(1, 0, 2, 3))
    monkeypatch.setattr(torch, "randn", _pop_randn(pops))

    eot_t = refmods.eot.EOT(_TorchLin(W), torch.nn.CrossEntropyLoss(
        reduction="none"), EOT_size=1, EOT_batch_size=1, use_grad=False)
    nes_t = refmods.nes.NES(spd, spdb, sigma, eot_t)
    with torch.no_grad():
        mean_loss_t, grad_t, adver_loss_t, adver_score_t, predict_t = \
            nes_t(torch.from_numpy(x), torch.from_numpy(y))

    np.testing.assert_allclose(np.asarray(res.mean_loss),
                               mean_loss_t.numpy(), rtol=1e-5, atol=1e-6)
    # the /sigma (x100) scale amplifies f32 accumulation-order noise
    np.testing.assert_allclose(np.asarray(res.grad), grad_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.adver_loss),
                               adver_loss_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.adver_score),
                               adver_score_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.predict),
                                  np.asarray(predict_t))


# -- 3. FAKEBOB ---------------------------------------------------------------

def _fakebob_noise_pops(key, n_iters, half, nb, b=B):
    """Replicate FAKEBOB->NES key threading to build the torch pop list:
    iteration i: (key, sub)=split(key); NES keys=split(sub, nb+1);
    draw j: k_noise=split(keys[j])[0], u=(half, b, 1, L)."""
    pops = []
    for _ in range(n_iters):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, nb + 1)
        for j in range(nb):
            k_noise, _ = jax.random.split(keys[j])
            u = np.asarray(jax.random.normal(k_noise, (half, b, 1, L)))
            pops.append(u.transpose(1, 0, 2, 3))
    return pops


# plateau_length=100 keeps the LR schedule inert for the B=3 tests: the
# reference inits ``last_ls = [[]] * n_audios`` — ONE shared list
# (the aliasing bug its own ``_EOT.py:28`` comment fixes elsewhere) — so
# with B>1 its plateau windows are cross-sample polluted; we fix that
# (per-sample ring buffer, docs/PARITY.md) and golden-test the schedule
# at B=1 where the bug is vacuous.
_FB_KW = dict(epsilon=0.02, max_lr=0.004, min_lr=1e-6,
              samples_per_draw=4, samples_per_draw_batch_size=4,
              sigma=0.01, momentum=0.9, plateau_length=100,
              plateau_drop=2.0)


def _ref_fakebob(refmods, monkeypatch, W, max_iter, stop_early,
                 stop_early_iter, record):
    monkeypatch.setattr(np, "infty", np.inf, raising=False)

    class RecFakebob(refmods.bb.FAKEBOB):
        def get_grad(self, xx, yy):
            record.append(xx.clone().numpy())
            return super().get_grad(xx, yy)

    return RecFakebob(model=_TorchLin(W), task="SCR", targeted=False,
                      max_iter=max_iter, stop_early=stop_early,
                      stop_early_iter=stop_early_iter, batch_size=B,
                      verbose=0, **_FB_KW)


def test_fakebob_trajectory_matches_reference(refmods, monkeypatch):
    """Full per-iterate agreement over 15 iterations (no early stop):
    momentum, per-sample plateau LR drops, eps-box clipping, success
    bookkeeping (``black_box_attack.py:49-133``)."""
    from audiopure_tpu.attacks.fakebob import FAKEBOB

    W = _lin_w(6)
    n_iters = 15
    rng = np.random.RandomState(7)
    x = (rng.rand(B, 1, L).astype(np.float32) - 0.5) * 0.4
    y = np.argmax(x[:, 0, :] @ W, axis=1)  # start correctly classified

    key = jax.random.PRNGKey(17)
    fb = FAKEBOB(_jax_model(W), task="SCR", targeted=False,
                 max_iter=n_iters - 1, stop_early=False,
                 loss_mode="ce_ref", **_FB_KW)
    final, (xs_j, lr_j, act_j, succ_j, best_j) = fb.trajectory(
        jnp.asarray(x), jnp.asarray(y), key, n_iters=n_iters)

    pops = _fakebob_noise_pops(key, n_iters, half=2, nb=1)
    monkeypatch.setattr(torch, "randn", _pop_randn(pops))
    record = []
    fb_t = _ref_fakebob(refmods, monkeypatch, W, max_iter=n_iters - 1,
                        stop_early=False, stop_early_iter=100,
                        record=record)
    best_t, succ_t = fb_t.generate(torch.from_numpy(x),
                                   torch.from_numpy(y), targeted=False)

    assert len(record) == n_iters
    xs_t = np.stack(record)                     # (n_iters, B, 1, L)
    np.testing.assert_allclose(np.asarray(xs_j), xs_t, rtol=1e-4,
                               atol=1e-6)
    # the trajectory moved (the LR schedule/momentum actually did work)
    assert np.abs(xs_t[-1] - xs_t[0]).max() > 1e-3
    np.testing.assert_array_equal(np.asarray(final.success),
                                  np.asarray(succ_t))
    np.testing.assert_allclose(np.asarray(final.best_adver_x),
                               best_t.numpy(), rtol=1e-4, atol=1e-6)


def test_fakebob_plateau_lr_schedule_matches_reference(refmods,
                                                       monkeypatch):
    """B=1 trajectory with plateau_length=3: under CE ascent the loss
    climbs, so the plateau detector (``:105-111``) halves the LR every
    3 iterations — per-iterate agreement pins the ring-buffer
    reimplementation (window contents, reset-on-drop, min_lr floor).
    B=1 keeps the reference's shared-``last_ls`` aliasing bug vacuous."""
    from audiopure_tpu.attacks.fakebob import FAKEBOB

    W = _lin_w(6)
    n_iters = 13
    rng = np.random.RandomState(11)
    x = (rng.rand(1, 1, L).astype(np.float32) - 0.5) * 0.4
    y = np.argmax(x[:, 0, :] @ W, axis=1)

    kw = dict(_FB_KW, plateau_length=3)
    key = jax.random.PRNGKey(31)
    fb = FAKEBOB(_jax_model(W), task="SCR", targeted=False,
                 max_iter=n_iters - 1, stop_early=False,
                 loss_mode="ce_ref", **kw)
    final, (xs_j, lr_j, _, _, _) = fb.trajectory(
        jnp.asarray(x), jnp.asarray(y), key, n_iters=n_iters)
    # the schedule actually dropped the LR (ring buffer exercised)
    assert float(lr_j[-1, 0]) < kw["max_lr"] / 2

    pops = _fakebob_noise_pops(key, n_iters, half=2, nb=1, b=1)
    monkeypatch.setattr(torch, "randn", _pop_randn(pops))
    record = []
    monkeypatch.setattr(np, "infty", np.inf, raising=False)

    class RecFakebob(refmods.bb.FAKEBOB):
        def get_grad(self, xx, yy):
            record.append(xx.clone().numpy())
            return super().get_grad(xx, yy)

    fb_t = RecFakebob(model=_TorchLin(W), task="SCR", targeted=False,
                      max_iter=n_iters - 1, stop_early=False,
                      stop_early_iter=100, batch_size=1, verbose=0, **kw)
    best_t, succ_t = fb_t.generate(torch.from_numpy(x),
                                   torch.from_numpy(y), targeted=False)

    np.testing.assert_allclose(np.asarray(xs_j), np.stack(record),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(final.success),
                                  np.asarray(succ_t))


@pytest.mark.parametrize("max_iter", [5, 14])
def test_fakebob_stop_early_matches_reference(refmods, monkeypatch,
                                              max_iter):
    """stop_early retirement semantics: the iter-0 prev_loss snapshot and
    the retirement check at iter stop_early_iter (``:117-127``) — under
    CE ascent the 'convergence' test retires every sample whose loss
    moved, capping the attack at stop_early_iter iterations."""
    from audiopure_tpu.attacks.fakebob import FAKEBOB

    W = _lin_w(6)
    rng = np.random.RandomState(7)
    x = (rng.rand(B, 1, L).astype(np.float32) - 0.5) * 0.4
    y = np.argmax(x[:, 0, :] @ W, axis=1)

    key = jax.random.PRNGKey(23)
    fb = FAKEBOB(_jax_model(W), task="SCR", targeted=False,
                 max_iter=max_iter, stop_early=True, stop_early_iter=6,
                 loss_mode="ce_ref", **_FB_KW)
    best_j, succ_j = fb.generate(jnp.asarray(x), jnp.asarray(y), key)

    pops = _fakebob_noise_pops(key, max_iter + 1, half=2, nb=1)
    monkeypatch.setattr(torch, "randn", _pop_randn(pops))
    record = []
    fb_t = _ref_fakebob(refmods, monkeypatch, W, max_iter=max_iter,
                        stop_early=True, stop_early_iter=6, record=record)
    best_t, succ_t = fb_t.generate(torch.from_numpy(x),
                                   torch.from_numpy(y), targeted=False)

    if max_iter > 6:
        # the stop-early check retired everything at iter 6
        assert len(record) <= 8
    np.testing.assert_array_equal(np.asarray(succ_j), np.asarray(succ_t))
    np.testing.assert_allclose(np.asarray(best_j), best_t.numpy(),
                               rtol=1e-4, atol=1e-6)
