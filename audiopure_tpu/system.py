"""AcousticSystem: the purify -> transform -> classify composite.

TPU-native rebuild of the reference's single most important abstraction
(``acoustic_system.py:3-53``): *waveform -> [wave-defense] -> [wave->spec
transform] -> [spec-defense] -> classifier -> logits*.

Differences from the reference, by design:

* Purely functional. ``classifier``, ``transform`` and ``defender`` are
  callables over arrays; the whole forward is jit-able and differentiable, so
  attacks differentiate through the full n-step sampler with ``jax.grad``
  instead of torchsde's adjoint.
* Stochastic defenses take an explicit PRNG key — EOT correctness depends on
  fresh noise per replica (SURVEY.md §7), which global torch RNG state gives
  implicitly and JAX makes explicit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


class AcousticSystem:
    """Composite audio system: audio -> prediction logits.

    Args:
      classifier: spec -> logits (or audio -> logits for raw-waveform nets).
      transform: audio -> spectrogram, or None for raw-waveform classifiers.
      defender: ``f(x, key)`` purifier (or ``f(x)`` for deterministic
        defenses), operating on waveforms (``defense_type='wave'``) or
        spectrograms (``defense_type='spec'``).
      defense_type: 'wave' or 'spec' (reference ``acoustic_system.py:26``).
    """

    def __init__(
        self,
        classifier: Callable[[jnp.ndarray], jnp.ndarray],
        transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        defender: Optional[Callable] = None,
        defense_type: str = "wave",
        defender_stochastic: bool = True,
    ):
        if defense_type not in ("wave", "spec"):
            raise NotImplementedError(
                "argument defense_type should be 'wave' or 'spec'!"
            )
        self.classifier = classifier
        self.transform = transform
        self.defender = defender
        self.defense_type = defense_type
        self.defender_stochastic = defender_stochastic

    def _defend(self, x: jnp.ndarray, key) -> jnp.ndarray:
        if self.defender_stochastic:
            if key is None:
                raise ValueError(
                    "stochastic defender requires a PRNG key; pass key= or "
                    "mark defender_stochastic=False"
                )
            return self.defender(x, key)
        return self.defender(x)

    def __call__(self, x: jnp.ndarray, key=None,
                 defend: bool = True) -> jnp.ndarray:
        """x: (B, 1, L) waveform in [-1, 1]. Returns (B, n_classes) logits.

        A defender with ``sample_step > 1`` returns ``k*B`` purified copies
        (``diffwave_sde.py:212``); their logits are averaged back to B —
        the reference instead feeds the enlarged batch onward, which
        silently mis-shapes the attack bookkeeping.
        """
        B = x.shape[0]
        out = x
        if defend and self.defender is not None and self.defense_type == "wave":
            out = self._defend(out, key)
        if self.transform is not None:
            out = self.transform(out)
        if defend and self.defender is not None and self.defense_type == "spec":
            out = self._defend(out, key)
        logits = self.classifier(out)
        if logits.shape[0] != B:
            k = logits.shape[0] // B
            logits = logits.reshape(k, B, -1).mean(axis=0)
        return logits
