"""Exponential moving average of parameters.

Rebuild of ``improved_diffusion/nn.py:update_ema`` + the TrainLoop's
per-rate EMA params (``train_util.py:82-92,246-252``): a pure pytree op.
"""

from __future__ import annotations

import jax


def update_ema(ema_params, params, rate: float = 0.9999):
    """ema <- ema*rate + params*(1-rate), leafwise."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p * (1.0 - rate), ema_params, params)
