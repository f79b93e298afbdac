"""Stage 2 of the Qin et al. imperceptible attack.

TPU-native rebuild of ``white_box_attack.py:474-710`` ("not used" by the
reference's eval CLIs but part of the API): refine a stage-1 adversarial
example under a psychoacoustic hinge loss so its perturbation stays below
the clean signal's masking threshold.

Host side: the masking threshold and PSD maximum of the clean input are
precomputed once (``attacks/masker.py``). Device side: the optimization
loop is a ``lax.scan`` where both gradients — network loss and the
masking-threshold hinge — come from one ``jax.grad`` each; the reference's
separate ``loss.backward()`` + manual perturbation-PSD backward
(``:564-570``) collapse into autodiff through our XLA STFT.

The per-sample alpha schedule (``:536-559``) and early-stop bookkeeping
(``:579-592``) become masked updates.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audiopure_tpu.ops.stft import stft_power


def approximate_psd(perturbation: jnp.ndarray,
                    psd_maximum_stabilized: jnp.ndarray,
                    window_size: int = 2048,
                    hop_size: int = 512) -> jnp.ndarray:
    """Normalized PSD approximation of a perturbation
    (ref ``_approximate_power_spectral_density:653-682``).

    perturbation: (B, L); psd_maximum_stabilized: (B,).
    Returns (B, n_freq, frames).
    """
    gain = np.sqrt(8.0 / 3.0)
    spec = stft_power(perturbation, n_fft=window_size, hop_length=hop_size,
                      center=False, power=2.0)  # |stft|^2, (B, n_freq, T)
    psd = (gain / window_size) ** 2 * spec
    return 10.0 ** 9.6 / psd_maximum_stabilized[:, None, None] * psd


def masking_hinge_loss(perturbation: jnp.ndarray,
                       masking_threshold_stabilized: jnp.ndarray,
                       psd_maximum_stabilized: jnp.ndarray) -> jnp.ndarray:
    """mean(relu(PSD(delta) - threshold)) per sample (ref ``:636-637``)."""
    psd = approximate_psd(perturbation, psd_maximum_stabilized)
    return jnp.mean(jax.nn.relu(psd - masking_threshold_stabilized),
                    axis=(1, 2))


def stage_2(
    model_fn: Callable,
    loss_fn: Callable,
    masker,
    x: jnp.ndarray,
    x_adv: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    targeted: bool = False,
    max_iter: int = 4000,
    learning_rate: float = 1.0,
    alpha: float = 0.05,
    alpha_min: float = 5e-4,
    increase_factor_alpha: float = 1.2,
    num_iter_increase_alpha: int = 20,
    decrease_factor_alpha: float = 0.8,
    num_iter_decrease_alpha: int = 50,
    loss_theta_min: float = 0.05,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x_imperceptible, success_mask).

    ``masker``: a :class:`PsychoacousticMasker`; thresholds are computed
    host-side from the clean ``x`` exactly like
    ``_stabilized_threshold_and_psd_maximum`` (ref ``:684-710``).
    """
    B = x.shape[0]
    lr = 2.0 ** -15 * learning_rate  # float-domain scale (ref ``:491``)

    # host-side threshold precompute
    thresholds, psd_maxima = [], []
    for xi in np.asarray(x)[:, 0, :]:
        th, pm = masker.calculate_threshold_and_psd_maximum(xi)
        thresholds.append(th)
        psd_maxima.append(pm)
    threshold_stab = jnp.asarray(10.0 ** (np.asarray(thresholds) * 0.1),
                                 dtype=x.dtype)
    psd_max_stab = jnp.asarray(10.0 ** (np.asarray(psd_maxima) * 0.1),
                               dtype=x.dtype)

    sign = -1.0 if targeted else 1.0

    def net_loss(delta, k):
        logits = model_fn(x + delta, k)
        return loss_fn(logits, y).sum(), logits

    def theta_loss(delta):
        return masking_hinge_loss(delta[:, 0, :], threshold_stab,
                                  psd_max_stab)

    def body(carry, inp):
        delta, alpha_t, best_x, best_theta, success = carry
        i, key_i = inp

        (_, logits), grad_net = jax.value_and_grad(
            net_loss, has_aux=True)(delta, key_i)
        pred = jnp.argmax(logits, axis=-1)
        hit = (pred == y) if targeted else (pred != y)

        loss_theta, grad_theta_flat = jax.value_and_grad(
            lambda d: theta_loss(d).sum())(delta)
        loss_theta_per = theta_loss(delta)

        # best-imperceptible bookkeeping (ref ``:524-534``)
        better = jnp.logical_and(hit, loss_theta_per < best_theta)
        best_x = jnp.where(better[:, None, None], x + delta, best_x)
        best_theta = jnp.where(better, loss_theta_per, best_theta)
        success = jnp.logical_or(success, hit)

        # alpha schedule (ref ``:536-559``)
        inc = jnp.logical_and(i % num_iter_increase_alpha == 0, i > 0)
        dec = jnp.logical_and(i % num_iter_decrease_alpha == 0, i > 0)
        alpha_t = jnp.where(jnp.logical_and(inc, hit),
                            alpha_t * increase_factor_alpha, alpha_t)
        alpha_t = jnp.where(jnp.logical_and(dec, ~hit),
                            jnp.maximum(alpha_t * decrease_factor_alpha,
                                        alpha_min), alpha_t)

        step = grad_net + alpha_t[:, None, None] * grad_theta_flat
        delta = delta + sign * lr * step
        delta = jnp.clip(x + delta, clip_min, clip_max) - x
        return (delta, alpha_t, best_x, best_theta, success), None

    delta0 = x_adv - x
    carry0 = (delta0,
              jnp.full((B,), alpha, dtype=x.dtype),
              x_adv,
              jnp.full((B,), jnp.inf, dtype=x.dtype),
              jnp.zeros((B,), dtype=bool))
    keys = jax.random.split(key, max_iter)
    (delta, _, best_x, best_theta, success), _ = jax.lax.scan(
        body, carry0, (jnp.arange(max_iter), keys))

    # samples that never produced an imperceptible adv example fall back to
    # the final perturbed input (ref ``:594-606``)
    found = jnp.isfinite(best_theta)
    x_out = jnp.where(found[:, None, None], best_x, x + delta)
    return x_out, jnp.logical_and(success, found)
