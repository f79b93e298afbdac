"""Attention-RCNN keyword-spotting classifier.

TPU-native rebuild of the reference's Qualcomm-KWS model
(``audio_models/RCNN_KWS/model.py:5-114``): separable conv stem ->
2-layer bidirectional GRU -> additive attention -> linear head with
log-softmax, on variable-length mel spectrograms.

TPU-first choices:

* The GRU is a ``lax.scan`` over time with an MXU-friendly fused gate matmul
  (one (C_in+C_h) x 3C_h dense per step direction) instead of cuDNN RNN
  kernels.
* Bidirectionality = scan + reversed scan, concatenated.
* The attention "loop over timesteps" in the reference
  (``model.py:104-108``) is a single batched dense over (B, T, H).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRULayer(nn.Module):
    """Unidirectional GRU over (B, T, C_in) -> (B, T, H), torch semantics."""

    hidden_size: int
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        H = self.hidden_size
        # input projection for ALL timesteps in one big matmul (MXU-friendly;
        # the recurrent scan then only carries the small hidden matmul)
        gi_all = nn.Dense(3 * H, name="w_ih", dtype=self.dtype)(x)  # (B,T,3H)

        w_hh = self.param(
            "w_hh_kernel", nn.initializers.lecun_normal(), (H, 3 * H),
            self.dtype)
        b_hh = self.param("w_hh_bias", nn.initializers.zeros, (3 * H,),
                          self.dtype)

        def cell(h, gi):
            gh = h @ w_hh + b_hh
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = nn.sigmoid(i_r + h_r)
            z = nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((B, H), dtype=x.dtype)
        gis = jnp.swapaxes(gi_all, 0, 1)  # (T, B, 3H)
        if self.reverse:
            gis = gis[::-1]
        _, ys = jax.lax.scan(cell, h0, gis)
        if self.reverse:
            ys = ys[::-1]
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class BiGRU(nn.Module):
    hidden_size: int
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for layer in range(self.num_layers):
            fwd = GRULayer(self.hidden_size, False, self.dtype,
                           name=f"fwd_{layer}")(h)
            bwd = GRULayer(self.hidden_size, True, self.dtype,
                           name=f"bwd_{layer}")(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        return h  # (B, T, 2H)


class KWSModel(nn.Module):
    """(B, 1, n_mels, T) or (B, n_mels, T) spectrogram -> (B, C) log-probs."""

    in_size: int = 40
    hidden_size: int = 64
    kernel_size: tuple = (20, 5)
    stride: tuple = (8, 2)
    gru_num_layers: int = 2
    num_classes: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 4:
            x = x[:, 0]              # (B, n_mels, T)
        h = jnp.swapaxes(x, 1, 2)    # (B, T, n_mels) time-major NWC

        # separable conv stem (ref ``model.py:5-12``): depthwise k over
        # time (stride[1]) then pointwise 1x1 with stride[0] and groups
        # in_size/kernel_size[0].
        h = nn.Conv(self.in_size, (self.kernel_size[1],),
                    strides=(self.stride[1],),
                    feature_group_count=self.in_size, padding="VALID",
                    dtype=self.dtype, name="depthwise")(h)
        h = nn.Conv(self.hidden_size, (1,), strides=(self.stride[0],),
                    feature_group_count=self.in_size // self.kernel_size[0],
                    padding="VALID", dtype=self.dtype, name="pointwise")(h)

        out = BiGRU(self.hidden_size, self.gru_num_layers,
                    self.dtype)(h)   # (B, T', 2H)

        # additive attention (ref ``AttnMech`` + ``ApplyAttn``)
        e = jnp.tanh(nn.Dense(2 * self.hidden_size, name="attn_w",
                              dtype=self.dtype)(out))
        e = nn.Dense(1, use_bias=False, name="attn_v",
                     dtype=self.dtype)(e)[..., 0]  # (B, T')
        a = nn.softmax(e, axis=-1)
        c = jnp.einsum("bt,bth->bh", a, out)
        logits = nn.Dense(self.num_classes, use_bias=False, name="head",
                          dtype=self.dtype)(c)
        return nn.log_softmax(logits, axis=-1)
