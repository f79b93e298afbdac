"""nondifferentiable(): opaque primal, zero tangent, works where inner ops
have no JVP rule."""

import numpy as np

import jax
import jax.numpy as jnp

from audiopure_tpu.utils.grads import nondifferentiable


def test_zero_gradient():
    f = nondifferentiable(lambda x: 3.0 * x)
    g = jax.grad(lambda x: jnp.sum(f(x) + x))(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), 1.0)  # only the +x path


def test_primal_unchanged():
    f = nondifferentiable(lambda x, y: x * y)
    out = f(jnp.asarray(2.0), jnp.asarray(5.0))
    assert float(out) == 10.0


def test_inner_without_jvp_rule():
    """An inner function whose primitive has no autodiff path (pure_callback
    has no JVP) must still run under grad."""
    def no_jvp(x):
        return jax.pure_callback(
            lambda a: np.asarray(a) * 2.0,
            jax.ShapeDtypeStruct(x.shape, x.dtype), x)

    f = nondifferentiable(no_jvp)
    g = jax.grad(lambda x: jnp.sum(f(x) * x))(jnp.ones(3))
    # d/dx [f(x)*x] with f opaque = f(x) = 2
    np.testing.assert_allclose(np.asarray(g), 2.0)
