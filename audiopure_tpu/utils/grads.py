"""Gradient-surgery helpers."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def nondifferentiable(fn: Callable) -> Callable:
    """Make ``fn`` opaque to autodiff: primal runs as-is, tangent is zero.

    Stronger than ``stop_gradient(fn(x))``: JAX never *linearizes* the
    inside, so ops without JVP rules (e.g. Pallas kernels with
    input_output_aliases) work under ``jax.grad``. This is exactly the
    reference's gradient contract for the eps-net
    (``@torch.no_grad`` on ``compute_eps_t``, ``diffwave_ddpm.py:166``).
    """

    @jax.custom_jvp
    def wrapped(*args):
        return fn(*args)

    @wrapped.defjvp
    def _jvp(primals, tangents):  # noqa: ANN001
        del tangents
        out = wrapped(*primals)
        zero = jax.tree_util.tree_map(jnp.zeros_like, out)
        return out, zero

    return wrapped
