"""jit with closure-constant hoisting.

``jax.jit`` inlines closed-over device arrays into the lowered program as
dense StableHLO literals. For this framework's callable-style APIs
(``model_fn(x, key)`` closures over full parameter trees, mirroring the
reference's ``nn.Module`` objects) that makes attack/eval programs
enormous: the DiffSpec PGD program measured 692 MB of StableHLO text, of
which 689 MB was copies of the UNet/WRN weight literals — rejected by
this host's remote-compile tunnel (HTTP 413) and slow to upload even
when accepted.

``hoisted_jit`` traces the function once to a jaxpr, pulls every
closed-over array out of ``jaxpr.consts`` into explicit runtime
arguments, and jits an ``eval_jaxpr`` wrapper — weights become XLA
*parameters* (bound at dispatch, zero bytes in the program body), which
is also how a functional-first design would have passed them.
(``jax.closure_convert`` is not enough: it deliberately leaves concrete
array constants baked in, hoisting only differentiable tracers.)

One cache entry per argument (treedef, shape, dtype) signature.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax import tree_util


class hoisted_jit:
    """``hoisted_jit(fn)(*args)`` == ``jax.jit(fn)(*args)`` but with
    closed-over arrays passed as runtime parameters instead of being
    inlined as program literals.

    ``fn`` must be a pure function of array-pytree positional arguments;
    retracing happens per (treedef, shape, dtype) signature, and the
    hoisted constants are captured at trace time (so params swapped into
    the closure between same-shape calls are NOT picked up — freeze the
    closure per instance, as the attack classes do).
    """

    def __init__(self, fn: Callable):
        self._fn = fn
        self._cache = {}

    def clear(self):
        """Drop every cached (jaxpr, hoisted-consts) entry.

        The hoisted constants are captured at first trace per signature;
        if new parameter values are swapped into the same closure (e.g. a
        checkpoint reloaded into a live system/attack object), call this
        so the next dispatch re-captures them — otherwise the stale
        weights keep being served (advisor r2)."""
        self._cache.clear()

    @staticmethod
    def _signature(args):
        leaves, treedef = tree_util.tree_flatten(args)
        return (treedef, tuple((getattr(a, "shape", ()),
                                str(getattr(a, "dtype", type(a))),
                                getattr(a, "sharding", None))
                               for a in leaves))

    @staticmethod
    def _replicate_for_mesh(consts, flat_args):
        """If any input is sharded over a multi-device mesh, replicate the
        hoisted constants onto that mesh — committed-to-one-device consts
        would otherwise clash with dp-sharded inputs (mixed device sets).
        This is the standard layout anyway: params replicated, batch
        sharded."""
        for a in flat_args:
            s = getattr(a, "sharding", None)
            if isinstance(s, jax.sharding.NamedSharding) \
                    and s.mesh.devices.size > 1:
                rep = jax.sharding.NamedSharding(
                    s.mesh, jax.sharding.PartitionSpec())
                return [jax.device_put(c, rep) for c in consts]
        return consts

    def _build(self, args):
        flat, in_tree = tree_util.tree_flatten(args)
        store = {}

        def flat_fn(*flat_args):
            out = self._fn(*tree_util.tree_unflatten(in_tree, flat_args))
            flat_out, store["out_tree"] = tree_util.tree_flatten(out)
            return flat_out

        closed = jax.make_jaxpr(flat_fn)(*flat)
        out_tree = store["out_tree"]
        jaxpr = closed.jaxpr
        # commit every hoisted constant to device ONCE: host-side (numpy)
        # consts would otherwise be re-transferred on every dispatch —
        # catastrophic through a remote-device tunnel (measured 37x
        # end-to-end slowdown before this device_put)
        import numpy as np
        consts = [c if isinstance(c, jax.Array)
                  else jax.device_put(np.asarray(c))
                  for c in closed.consts]

        @jax.jit
        def run(consts, flat_args):
            outs = jax.core.eval_jaxpr(jaxpr, consts, *flat_args)
            return tree_util.tree_unflatten(out_tree, outs)

        return run, consts

    def __call__(self, *args):
        sig = self._signature(args)
        entry = self._cache.get(sig)
        if entry is None:
            run, consts = self._build(args)
            consts = self._replicate_for_mesh(
                consts, tree_util.tree_flatten(args)[0])
            entry = (run, consts)
            self._cache[sig] = entry
        run, consts = entry
        return run(consts, tree_util.tree_flatten(args)[0])
