"""Classifier zoo: shape/finite checks on (B, 1, 32, 32) mel images, M5 on
raw audio, RCNN-KWS on variable-length spectrograms, GRU parity vs torch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiopure_tpu.models import create_classifier
from audiopure_tpu.models.rcnn_kws import GRULayer

SMALL_ZOO = ["vgg19_bn", "resnet18", "resnet50", "wideresnet28_10",
             "resnext29_8_64", "dpn92", "densenet_bc_100_12"]


@pytest.mark.parametrize("name", SMALL_ZOO)
def test_convnet_forward(name):
    model = create_classifier(name, num_classes=10)
    x = jnp.zeros((2, 1, 32, 32))
    # jit init+apply: persistent compilation cache keeps re-runs fast
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(model.apply)(variables, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_convnet_train_mode_updates_batchstats():
    model = create_classifier("resnet18", num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert logits.shape == (4, 10)
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_m5_forward_logprobs():
    model = create_classifier("m5", num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16000)) * 0.1
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)
    # log-softmax: rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(1), 1.0, atol=1e-5)


def test_kws_variable_length():
    model = create_classifier("kwsmodel", num_classes=4)
    for T in (60, 100):
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 1, 40, T))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (3, 4)
        np.testing.assert_allclose(np.exp(np.asarray(out)).sum(1), 1.0,
                                   atol=1e-5)


def test_gru_matches_torch():
    """Single-layer GRU parity against torch.nn.GRU with copied weights."""
    H, C, T, B = 8, 5, 11, 3
    layer = GRULayer(hidden_size=H)
    x = np.random.RandomState(0).randn(B, T, C).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tg = torch.nn.GRU(input_size=C, hidden_size=H, num_layers=1,
                      batch_first=True)
    p = variables["params"]
    with torch.no_grad():
        tg.weight_ih_l0.copy_(torch.from_numpy(
            np.asarray(p["w_ih"]["kernel"]).T.copy()))
        tg.bias_ih_l0.copy_(torch.from_numpy(
            np.asarray(p["w_ih"]["bias"]).copy()))
        tg.weight_hh_l0.copy_(torch.from_numpy(
            np.asarray(p["w_hh_kernel"]).T.copy()))
        tg.bias_hh_l0.copy_(torch.from_numpy(
            np.asarray(p["w_hh_bias"]).copy()))
        want, _ = tg(torch.from_numpy(x))

    got = np.asarray(layer.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-4)


def test_m5_matches_torch():
    """M5 parity vs a torch twin built from the spec
    (``audio_models/M5/M5Net.py:4-38``): conv1d VALID + BN(eval) + relu +
    maxpool(4) x4 -> global avg -> fc -> log_softmax."""
    import torch.nn as thnn
    import torch.nn.functional as thF

    from audiopure_tpu.models.m5 import M5

    class TM5(thnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = thnn.Conv1d(1, 32, 80, 16)
            self.bn1 = thnn.BatchNorm1d(32)
            self.conv2 = thnn.Conv1d(32, 32, 3)
            self.bn2 = thnn.BatchNorm1d(32)
            self.conv3 = thnn.Conv1d(32, 64, 3)
            self.bn3 = thnn.BatchNorm1d(64)
            self.conv4 = thnn.Conv1d(64, 64, 3)
            self.bn4 = thnn.BatchNorm1d(64)
            self.fc1 = thnn.Linear(64, 10)

        def forward(self, x):
            for conv, bn in ((self.conv1, self.bn1), (self.conv2, self.bn2),
                             (self.conv3, self.bn3), (self.conv4, self.bn4)):
                x = thF.max_pool1d(thF.relu(bn(conv(x))), 4)
            x = thF.avg_pool1d(x, x.shape[-1]).squeeze(-1)
            return thF.log_softmax(self.fc1(x), dim=1)

    torch.manual_seed(0)
    tnet = TM5().eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for bn in (tnet.bn1, tnet.bn2, tnet.bn3, tnet.bn4):
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)

    model = M5(n_output=10)
    x_np = np.random.RandomState(0).randn(2, 1, 16000).astype(
        np.float32) * 0.2
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    # copy torch weights into the flax tree
    import flax
    variables = flax.core.unfreeze(variables)
    p, bs = variables["params"], variables["batch_stats"]
    convs = [tnet.conv1, tnet.conv2, tnet.conv3, tnet.conv4]
    bns = [tnet.bn1, tnet.bn2, tnet.bn3, tnet.bn4]
    for i, (conv, bn) in enumerate(zip(convs, bns)):
        cname = f"Conv_{i}"
        bname = f"BatchNorm_{i}"
        p[cname]["kernel"] = jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 1, 0))
        p[cname]["bias"] = jnp.asarray(conv.bias.detach().numpy())
        p[bname]["scale"] = jnp.asarray(bn.weight.detach().numpy())
        p[bname]["bias"] = jnp.asarray(bn.bias.detach().numpy())
        bs[bname]["mean"] = jnp.asarray(bn.running_mean.numpy())
        bs[bname]["var"] = jnp.asarray(bn.running_var.numpy())
    p["Dense_0"]["kernel"] = jnp.asarray(tnet.fc1.weight.detach().numpy().T)
    p["Dense_0"]["bias"] = jnp.asarray(tnet.fc1.bias.detach().numpy())

    got = np.asarray(model.apply(variables, jnp.asarray(x_np)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x_np)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
