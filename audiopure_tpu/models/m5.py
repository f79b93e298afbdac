"""M5: raw-waveform 1D CNN classifier.

TPU-native rebuild of the reference's only waveform-input classifier
(``audio_models/M5/M5Net.py:4-38``): 4 stages of
conv1d -> batchnorm -> relu -> maxpool(4), then global average pool and a
linear head with log-softmax output.

Layout is NWC so the stride-16 k=80 stem conv and the k=3 convs map onto the
MXU. The public API takes the reference's ``(B, 1, L)``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class M5(nn.Module):
    n_input: int = 1
    first_kernel_size: int = 80
    n_output: int = 10
    stride: int = 16
    n_channel: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # receptive-field check: 4 stages of VALID conv + pool/4 must keep
        # a non-empty time axis, or the final mean silently NaNs
        L = x.shape[-1]
        n = (L - self.first_kernel_size) // self.stride + 1
        n = n // 4
        for _ in range(3):
            n = (n - 2) // 4
        if n < 1:
            raise ValueError(
                f"M5 input length {L} too short for its receptive field")
        # (B, C_in, L) -> (B, L, C_in)
        h = jnp.swapaxes(x, 1, 2)

        def stage(h, feat, ksize, stride=1):
            h = nn.Conv(feat, (ksize,), strides=(stride,), padding="VALID",
                        dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype)(h)
            h = nn.relu(h)
            # max pool 4 (torch MaxPool1d(4): stride=kernel, floor mode)
            pooled_len = h.shape[1] // 4
            h = h[:, : pooled_len * 4, :].reshape(
                h.shape[0], pooled_len, 4, h.shape[2]
            ).max(axis=2)
            return h

        h = stage(h, self.n_channel, self.first_kernel_size, self.stride)
        h = stage(h, self.n_channel, 3)
        h = stage(h, 2 * self.n_channel, 3)
        h = stage(h, 2 * self.n_channel, 3)

        h = h.mean(axis=1)  # global average pool over time
        h = nn.Dense(self.n_output, dtype=self.dtype)(h)
        return nn.log_softmax(h, axis=-1)
