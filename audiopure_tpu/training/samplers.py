"""Timestep schedule samplers for diffusion training.

Rebuild of ``improved_diffusion/resample.py:61-154``: uniform sampling and
loss-second-moment importance sampling of t. The reference synchronizes
per-rank loss history with ``dist.all_gather``; under JAX's
single-controller model the full batch's losses already land on the host,
so the history update is plain numpy.
"""

from __future__ import annotations

import numpy as np


class ScheduleSampler:
    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, batch_size: int, rng: np.random.Generator):
        """Importance-sample timesteps; returns (t indices, IS weights)."""
        w = self.weights()
        p = w / w.sum()
        t = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[t])
        return t.astype(np.int32), weights.astype(np.float32)

    def update_with_all_losses(self, ts, losses) -> None:
        pass


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self._weights = np.ones(num_timesteps)

    def weights(self):
        return self._weights


class LossSecondMomentResampler(ScheduleSampler):
    """Sample t proportional to sqrt(E[loss(t)^2]) once warmed up
    (ref ``resample.py:87-154``)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 1e-3):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term),
                                      dtype=np.float64)
        self._loss_counts = np.zeros(num_timesteps, dtype=np.int64)

    def _warmed_up(self) -> bool:
        return (self._loss_counts == self.history_per_term).all()

    def weights(self):
        if not self._warmed_up():
            return np.ones(self.num_timesteps, dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            t = int(t)
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1


def create_named_schedule_sampler(name: str, diffusion) -> ScheduleSampler:
    """ref ``resample.py:12-27``."""
    if name == "uniform":
        return UniformSampler(diffusion.num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(diffusion.num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
