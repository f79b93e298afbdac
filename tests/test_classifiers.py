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
