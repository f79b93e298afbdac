"""hoisted_jit: closure constants become runtime parameters.

Guards the program-size property the remote-compile tunnel depends on
(docstring of ``utils/jit_utils.py``): without hoisting, a closed-over
weight matrix is inlined as a dense StableHLO literal.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audiopure_tpu.utils.jit_utils import hoisted_jit


def _make_fn():
    W = jax.random.normal(jax.random.PRNGKey(0), (256, 256))

    def f(x):
        return jnp.tanh(x @ W).sum(axis=1)

    return f, W


def test_matches_plain_jit():
    f, _ = _make_fn()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    np.testing.assert_allclose(np.asarray(hoisted_jit(f)(x)),
                               np.asarray(jax.jit(f)(x)), rtol=1e-6)


def test_constants_not_inlined():
    f, W = _make_fn()
    x = jnp.ones((4, 256))
    h = hoisted_jit(f)
    h(x)  # trace + build
    (run, consts), = h._cache.values()
    assert any(c.shape == W.shape for c in consts)
    hoisted_size = len(run.lower(consts, [x]).as_text())
    plain_size = len(jax.jit(f).lower(x).as_text())
    # the 256KB literal dominates the plain program and is absent here
    assert plain_size > 100_000
    assert hoisted_size < plain_size / 50


def test_pytree_args_and_outputs():
    f = hoisted_jit(lambda d: {"out": d["a"] * 2 + d["b"],
                               "aux": (d["a"].sum(),)})
    d = {"a": jnp.arange(3.0), "b": jnp.ones((3,))}
    out = f(d)
    np.testing.assert_allclose(np.asarray(out["out"]), [1.0, 3.0, 5.0])
    assert out["aux"][0] == 3.0


def test_cache_per_signature():
    f, _ = _make_fn()
    h = hoisted_jit(f)
    h(jnp.ones((2, 256)))
    h(jnp.ones((2, 256)))
    assert len(h._cache) == 1
    h(jnp.ones((5, 256)))
    assert len(h._cache) == 2


def test_grad_through_hoisted_output():
    # hoisted programs still feed autodiff at the caller level
    f, W = _make_fn()
    h = hoisted_jit(lambda x: f(x).sum())
    g = jax.grad(lambda x: jax.jit(f)(x).sum())(jnp.ones((2, 256)))
    # grads are taken on the plain path; hoisted path must agree in value
    np.testing.assert_allclose(float(h(jnp.ones((2, 256)))),
                               float(jax.jit(f)(jnp.ones((2, 256))).sum()),
                               rtol=1e-6)
    assert g.shape == (2, 256)
