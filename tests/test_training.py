"""Training infrastructure: converter parity vs torch weight-norm ckpt,
TrainLoop loss descent + resume, EMA, samplers, classifier/adv training."""

import math
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from audiopure_tpu.diffusion.gaussian import create_gaussian_diffusion
from audiopure_tpu.models.wavenet import WaveNet
from audiopure_tpu.training.classifier import (
    ReduceLROnPlateau,
    StepLR,
    init_classifier_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_lr,
)
from audiopure_tpu.training.ema import update_ema
from audiopure_tpu.training.samplers import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from audiopure_tpu.training.train_loop import TrainLoop
from audiopure_tpu.utils import checkpoint as ckpt_lib
from audiopure_tpu.utils.torch_convert import convert_diffwave


# ---------------------------------------------------------------------------
# torch checkpoint conversion parity
# ---------------------------------------------------------------------------

RES, SKIP, LAYERS, CYCLE = 8, 8, 2, 2
EIN, EMID, EOUT = 16, 32, 32


def _build_torch_wavenet():
    """Weight-normalized torch WaveNet with the reference's parameter
    naming, so its state_dict looks exactly like a real DiffWave ckpt."""
    wn = torch.nn.utils.weight_norm

    class Conv(torch.nn.Module):
        def __init__(self, cin, cout, k, dilation=1):
            super().__init__()
            pad = dilation * (k - 1) // 2
            self.conv = wn(torch.nn.Conv1d(cin, cout, k, dilation=dilation,
                                           padding=pad))
            torch.nn.init.kaiming_normal_(self.conv.weight)

        def forward(self, x):
            return self.conv(x)

    class ZeroConv1d(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = torch.nn.Conv1d(cin, cout, 1)
            self.conv.weight.data.normal_(0, 0.1)  # nonzero for the test
            self.conv.bias.data.normal_(0, 0.1)

        def forward(self, x):
            return self.conv(x)

    class Block(torch.nn.Module):
        def __init__(self, dilation):
            super().__init__()
            self.fc_t = torch.nn.Linear(EOUT, RES)
            self.dilated_conv_layer = Conv(RES, 2 * RES, 3, dilation)
            self.res_conv = wn(torch.nn.Conv1d(RES, RES, 1))
            self.skip_conv = wn(torch.nn.Conv1d(RES, SKIP, 1))

    class Group(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc_t1 = torch.nn.Linear(EIN, EMID)
            self.fc_t2 = torch.nn.Linear(EMID, EOUT)
            self.residual_blocks = torch.nn.ModuleList(
                [Block(2 ** (n % CYCLE)) for n in range(LAYERS)])

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.init_conv = torch.nn.Sequential(Conv(1, RES, 1))
            self.residual_layer = Group()
            self.final_conv = torch.nn.Sequential(
                Conv(SKIP, SKIP, 1), torch.nn.ReLU(),
                ZeroConv1d(SKIP, 1))

        def forward(self, x, steps):
            half = EIN // 2
            freq = torch.exp(torch.arange(half).float()
                             * -(math.log(10000.0) / (half - 1)))
            e = torch.cat([torch.sin(steps * freq), torch.cos(steps * freq)],
                          dim=1)
            e = self.residual_layer.fc_t1(e)
            e = e * torch.sigmoid(e)
            e = self.residual_layer.fc_t2(e)
            emb = e * torch.sigmoid(e)
            h = torch.relu(self.init_conv(x))
            skip = 0
            for blk in self.residual_layer.residual_blocks:
                hb = h + blk.fc_t(emb)[:, :, None]
                hh = blk.dilated_conv_layer(hb)
                gate = torch.tanh(hh[:, :RES]) * torch.sigmoid(hh[:, RES:])
                # residual adds the *biased* x (ref in-place quirk)
                h = (hb + blk.res_conv(gate)) * math.sqrt(0.5)
                skip = skip + blk.skip_conv(gate)
            out = skip * math.sqrt(1.0 / LAYERS)
            return self.final_conv(out)

    return Net()


def test_convert_diffwave_matches_torch_forward():
    torch.manual_seed(0)
    tnet = _build_torch_wavenet().eval()
    sd = tnet.state_dict()
    params = convert_diffwave(sd, num_res_layers=LAYERS)

    net = WaveNet(res_channels=RES, skip_channels=SKIP,
                  num_res_layers=LAYERS, dilation_cycle=CYCLE,
                  diffusion_step_embed_dim_in=EIN,
                  diffusion_step_embed_dim_mid=EMID,
                  diffusion_step_embed_dim_out=EOUT)
    x = np.random.RandomState(0).randn(2, 1, 128).astype(np.float32) * 0.3
    steps = np.array([[3.0], [17.0]], dtype=np.float32)
    got = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(steps)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x), torch.from_numpy(steps)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# EMA / samplers
# ---------------------------------------------------------------------------

def test_update_ema():
    ema = {"w": jnp.ones(3)}
    new = update_ema(ema, {"w": jnp.zeros(3)}, rate=0.9)
    np.testing.assert_allclose(np.asarray(new["w"]), 0.9)


def test_uniform_sampler():
    s = UniformSampler(100)
    t, w = s.sample(1000, np.random.default_rng(0))
    assert t.min() >= 0 and t.max() < 100
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_resampler():
    s = LossSecondMomentResampler(10, history_per_term=2)
    rng = np.random.default_rng(0)
    t, w = s.sample(8, rng)
    np.testing.assert_allclose(w, 1.0)  # not warmed up: uniform
    # feed history: high loss at t=0
    for _ in range(3):
        s.update_with_all_losses(np.arange(10),
                                 np.asarray([10.0] + [0.1] * 9))
    assert s._warmed_up()
    wts = s.weights()
    assert wts[0] > wts[1] * 5  # t=0 heavily oversampled
    d = create_named_schedule_sampler("loss-second-moment",
                                      type("D", (), {"num_timesteps": 5})())
    assert isinstance(d, LossSecondMomentResampler)


# ---------------------------------------------------------------------------
# TrainLoop
# ---------------------------------------------------------------------------

def _tiny_data(n_batches=10**9, batch=8):
    rng = np.random.RandomState(0)
    base = rng.randn(1, 1, 8, 8).astype(np.float32) * 0.2
    i = 0
    while i < n_batches:
        yield {"spectrogram": np.repeat(base, batch, axis=0)
               + rng.randn(batch, 1, 8, 8).astype(np.float32) * 0.01}
        i += 1


def _tiny_unet_apply():
    from audiopure_tpu.models.unet import UNetModel
    net = UNetModel(model_channels=8, num_res_blocks=1,
                    attention_resolutions=(), channel_mult=(1,),
                    dropout=0.0, num_heads=1)
    x0 = jnp.zeros((1, 1, 8, 8))
    params = net.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))
    return (lambda p, x, t: net.apply(p, x, t)), params


def test_train_loop_descends_and_saves(tmp_path):
    from audiopure_tpu.utils import logging as logger
    logger.configure(str(tmp_path / "logs"), ["csv"])

    apply_fn, params = _tiny_unet_apply()
    diffusion = create_gaussian_diffusion(steps=20)
    loop = TrainLoop(apply_fn, params, diffusion, _tiny_data(),
                     batch_size=8, microbatch=4, lr=1e-3,
                     ema_rate="0.5,0.9", save_interval=5)
    losses = [loop.run_step(b) for _, b in zip(range(12), _tiny_data())]
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert loop.step == 12
    loop.save(str(tmp_path / "ckpt"))
    assert ckpt_lib.find_max_step(str(tmp_path / "ckpt")) == 12

    # resume restores params bit-exact
    loop2 = TrainLoop(apply_fn, params, diffusion, _tiny_data(),
                      batch_size=8, lr=1e-3, ema_rate="0.5,0.9",
                      resume_checkpoint=str(tmp_path / "ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(loop.params),
                    jax.tree_util.tree_leaves(loop2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert loop2.step == 12


def test_train_loop_async_save(tmp_path):
    """async_save commits in the background; wait_for_saves flushes, and
    the checkpoint restores bit-exact."""
    from audiopure_tpu.utils import logging as logger
    logger.configure(str(tmp_path), ["csv"])

    apply_fn, params = _tiny_unet_apply()
    diffusion = create_gaussian_diffusion(steps=20)
    loop = TrainLoop(apply_fn, params, diffusion, _tiny_data(),
                     batch_size=8, lr=1e-3, save_interval=2,
                     async_save=True)
    loop.run_loop(max_steps=4)  # saves at steps 2 and 4 asynchronously
    ckpt_lib.wait_for_saves()
    assert ckpt_lib.find_max_step(str(tmp_path)) == 4

    loop2 = TrainLoop(apply_fn, params, diffusion, _tiny_data(),
                      batch_size=8, lr=1e-3,
                      resume_checkpoint=str(tmp_path))
    assert loop2.step == 4
    for a, b in zip(jax.tree_util.tree_leaves(loop.ema_params[0]),
                    jax.tree_util.tree_leaves(loop2.ema_params[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_loop_preemption_save(tmp_path):
    """SIGTERM mid-loop -> checkpoint at the in-flight step + clean
    return + handler restored."""
    import signal

    from audiopure_tpu.utils import logging as logger
    logger.configure(str(tmp_path), ["csv"])

    apply_fn, params = _tiny_unet_apply()
    diffusion = create_gaussian_diffusion(steps=20)

    def data_with_signal():
        for i, b in enumerate(_tiny_data()):
            if i == 3:  # preemption notice arrives mid-training
                signal.raise_signal(signal.SIGTERM)
            yield b

    before = signal.getsignal(signal.SIGTERM)
    loop = TrainLoop(apply_fn, params, diffusion, data_with_signal(),
                     batch_size=8, lr=1e-3, save_interval=10**9)
    loop.run_loop(max_steps=100)  # returns early on the signal
    assert loop.step == 4  # finished the in-flight step, then stopped
    assert ckpt_lib.find_max_step(str(tmp_path)) == 4
    assert signal.getsignal(signal.SIGTERM) is before  # handler restored

    # resume picks up exactly where preemption hit
    loop2 = TrainLoop(apply_fn, params, diffusion, _tiny_data(),
                      batch_size=8, lr=1e-3,
                      resume_checkpoint=str(tmp_path))
    assert loop2.step == 4


# ---------------------------------------------------------------------------
# classifier training
# ---------------------------------------------------------------------------

def _m5_setup():
    from audiopure_tpu.models import create_classifier
    model = create_classifier("m5", num_classes=2)
    x = jnp.zeros((4, 1, 8192))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def _toy_batches(n, batch=16, L=8192, seed=0):
    """Binary task: class = sign of low-freq energy."""
    rng = np.random.RandomState(seed)
    t = np.arange(L) / 16000.0
    for _ in range(n):
        y = rng.randint(0, 2, size=batch)
        x = np.stack([
            (0.5 * np.sin(2 * np.pi * (400 if yi else 3000) * t)
             + 0.02 * rng.randn(L)).astype(np.float32) for yi in y])
        yield x[:, None, :], y


def test_classifier_training_learns():
    model, variables = _m5_setup()
    opt = make_optimizer("adam", lr=2e-3)
    step = make_train_step(model.apply, opt)
    state = init_classifier_state(variables, opt, jax.random.PRNGKey(0))
    accs = []
    for x, y in _toy_batches(30):
        state, m = step(state, jnp.asarray(x), jnp.asarray(y))
        accs.append(float(m["acc"]))
    assert np.mean(accs[-5:]) > 0.9

    ev = make_eval_step(model.apply)
    x, y = next(_toy_batches(1, seed=99))
    out = ev(state.variables, jnp.asarray(x), jnp.asarray(y))
    assert int(out["correct"]) >= 13


def test_adversarial_and_mixup_training_run():
    model, variables = _m5_setup()
    opt = make_optimizer("sgd", lr=1e-2)
    step = make_train_step(
        model.apply, opt, mixup_alpha=0.2,
        adv_config={"eps": 0.01, "alpha": 0.003, "steps": 3, "ratio": 0.5})
    state = init_classifier_state(variables, opt, jax.random.PRNGKey(1))
    for x, y in _toy_batches(3):
        state, m = step(state, jnp.asarray(x), jnp.asarray(y))
        assert np.isfinite(float(m["loss"]))


def test_lr_controllers():
    pl = ReduceLROnPlateau(0.1, patience=1, factor=0.5)
    assert pl.step(1.0) == 0.1
    assert pl.step(1.1) == 0.1   # 1 bad epoch
    assert pl.step(1.2) == 0.05  # patience exceeded
    sl = StepLR(0.1, step_size=2, gamma=0.1)
    assert sl.at_epoch(0) == 0.1 and sl.at_epoch(2) == pytest.approx(0.01)

    opt = make_optimizer("sgd", lr=0.1)
    state = opt.init({"w": jnp.ones(2)})
    state = set_lr(state, 0.05)
    assert float(state.hyperparams["learning_rate"]) == pytest.approx(0.05)


def test_weight_norm_training_and_fusion():
    """Weight-norm WaveNet trains; fused params load into the plain model
    with identical outputs (the reference's train->eval parametrization)."""
    import dataclasses

    import optax

    from audiopure_tpu.diffusion import make_schedule
    from audiopure_tpu.models.wavenet import (WaveNet,
                                              fuse_weight_norm_params)
    from audiopure_tpu.training.diffwave import (init_train_state,
                                                 make_train_step)

    net_wn = WaveNet(res_channels=8, skip_channels=8, num_res_layers=2,
                     dilation_cycle=2, diffusion_step_embed_dim_in=16,
                     diffusion_step_embed_dim_mid=32,
                     diffusion_step_embed_dim_out=32, weight_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 256)) * 0.3
    params = net_wn.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1, 1)))

    schedule = make_schedule(20, 1e-4, 0.02)
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step(net_wn.apply, schedule, opt))
    state = init_train_state(params, opt, jax.random.PRNGKey(2))
    losses = []
    for _ in range(10):
        state, loss = step(state, x)
        losses.append(float(loss))
    # random-t MSE is noisy over 10 steps; just require finite training
    assert np.isfinite(losses).all()

    fused = fuse_weight_norm_params(state.params)
    plain = dataclasses.replace(net_wn, weight_norm=False)
    t = jnp.ones((4, 1))
    np.testing.assert_allclose(
        np.asarray(net_wn.apply(state.params, x, t)),
        np.asarray(plain.apply(fused, x, t)), atol=1e-6)


def test_train_step_rejects_input_grad_kernel_wrappers():
    """The zero-weight-grad attack kernel must be refused even when
    hidden behind the repo's lambda/partial apply-fn idiom (round-3
    review find: the old name-match only caught the bare function)."""
    import functools

    import optax
    import pytest

    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.kernels.wavenet_stack_grad import \
        wavenet_forward_pallas_input_grad
    from audiopure_tpu.training.diffwave import make_train_step

    sched = make_schedule(10, 1e-4, 0.02)
    opt = optax.adam(1e-3)
    wrappers = [
        wavenet_forward_pallas_input_grad,
        lambda p, x, t: wavenet_forward_pallas_input_grad(p, x, t),
        functools.partial(wavenet_forward_pallas_input_grad),
        (lambda f: lambda p, x, t: f(p, x, t))(
            wavenet_forward_pallas_input_grad),  # closure cell
    ]
    for w in wrappers:
        with pytest.raises(ValueError):
            make_train_step(w, sched, opt)

    # a legitimate apply fn still passes
    make_train_step(lambda p, x, t: x, sched, opt)


# ---------------------------------------------------------------------------
# diffwave train-step microbatching (gradient accumulation)
# ---------------------------------------------------------------------------
def test_diffwave_microbatch_matches_manual_accumulation():
    """make_train_step(microbatch=m) must apply the mean of the
    per-slice gradients, each slice drawing its own (t, z) key — checked
    against a hand-built accumulation with the identical key split."""
    from audiopure_tpu.diffusion.schedule import make_schedule
    from audiopure_tpu.training.diffwave import (
        diffusion_training_loss, init_train_state,
        make_train_step)

    net = WaveNet(res_channels=8, skip_channels=8, num_res_layers=4,
                  dilation_cycle=2, dtype=jnp.float32)
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 256)),
                 jnp.zeros((1, 1)))
    sched = make_schedule(20, 1e-4, 0.02)
    opt = optax.sgd(1e-2)   # linear optimizer: update == -lr * grad
    apply_fn = lambda pp, xx, tt: net.apply(pp, xx, tt)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 256)) * 0.3

    state = init_train_state(p, opt, jax.random.PRNGKey(7))
    step = jax.jit(make_train_step(apply_fn, sched, opt, microbatch=2))
    new_state, loss = step(state, x0)

    # manual: same key schedule as the step
    _, sub = jax.random.split(state.key)
    keys = jax.random.split(sub, 2)
    losses, grads = [], []
    for i in range(2):
        li, gi = jax.value_and_grad(
            lambda pp: diffusion_training_loss(
                apply_fn, pp, x0[2 * i: 2 * i + 2], keys[i], sched))(p)
        losses.append(li)
        grads.append(gi)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    np.testing.assert_allclose(float(loss),
                               float((losses[0] + losses[1]) / 2),
                               rtol=1e-6)
    import flax
    fn = flax.traverse_util.flatten_dict(new_state.params["params"])
    fo = flax.traverse_util.flatten_dict(p["params"])
    fg = flax.traverse_util.flatten_dict(gmean["params"])
    for k in fn:
        np.testing.assert_allclose(
            np.asarray(fn[k]), np.asarray(fo[k]) - 1e-2 * np.asarray(fg[k]),
            rtol=1e-5, atol=1e-8, err_msg="/".join(k))
