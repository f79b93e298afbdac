"""BPDA: Backward-Pass Differentiable Approximation.

TPU-native rebuild of ``robustness_eval/_BPDA.py:6-63``: the reference
builds a ``torch.autograd.Function`` whose backward re-runs a substitute
function under ``enable_grad``; in JAX this is exactly ``jax.custom_vjp`` —
forward runs the (possibly non-differentiable) original, backward pulls the
VJP of the substitute.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax


def bpda(ori_f: Callable, sub_f: Optional[Callable] = None) -> Callable:
    """Return ``f`` with ``f(x) == ori_f(x)`` but ``grad f == grad sub_f``.

    ``sub_f`` defaults to identity (the straight-through estimator the
    reference uses for quantization defenses, ``time_defense.py:74``).
    Extra args are passed through non-differentiably.
    """
    if sub_f is None:
        sub_f = lambda x, *a, **k: x

    @jax.custom_vjp
    def f(x, *args):
        return ori_f(x, *args)

    def fwd(x, *args):
        return ori_f(x, *args), (x, args)

    def bwd(res, g):
        x, args = res
        _, vjp = jax.vjp(lambda xx: sub_f(xx, *args), x)
        (dx,) = vjp(g)
        return (dx,) + tuple(None for _ in args)

    f.defvjp(fwd, bwd)
    return f
