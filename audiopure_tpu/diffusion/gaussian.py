"""Full DDPM math for the spectrogram path (Improved Diffusion).

TPU-native rebuild of
``improved_diffusion/gaussian_diffusion.py:101-841`` +
``losses.py:12-77`` + ``respace.py:7-122``: q/p distributions, ancestral and
DDIM sampling loops (as ``lax.scan``), hybrid VLB/MSE training losses,
bits-per-dim evaluation, and DDIM-style timestep respacing.

Stateless design: one ``GaussianDiffusion`` object holds numpy schedule
tables (folded into compiled programs as constants); every method is pure
and jit-able. Model signature: ``model(x, t, **kwargs) -> (B, C | 2C, ...)``
with t the *original-scale* discrete step indices (rescaling applied here).
"""

from __future__ import annotations

import enum
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """'linear' (scaled to any step count) or 'cosine'
    (ref ``gaussian_diffusion.py:18-47``)."""
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 0.02, num_steps,
                           dtype=np.float64)
    if name == "cosine":
        def acb(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = [min(1 - acb((i + 1) / num_steps) / acb(i / num_steps),
                     0.999) for i in range(num_steps)]
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {name}")


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


# ---------------------------------------------------------------------------
# gaussian log-likelihood helpers (ref losses.py)
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) in nats (ref ``losses.py:12-47``)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of an 8-bit-discretized gaussian on [-1, 1]
    (ref ``losses.py:50-77``)."""
    centered = x - means
    inv_std = jnp.exp(-log_scales)
    plus_in = inv_std * (centered + 1.0 / 255.0)
    min_in = inv_std * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_1m_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_1m_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample schedule values and broadcast to ndim dims."""
    out = jnp.asarray(arr, dtype=jnp.float32)[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def mean_flat(x):
    return x.mean(axis=tuple(range(1, x.ndim)))


# ---------------------------------------------------------------------------
# GaussianDiffusion
# ---------------------------------------------------------------------------

class GaussianDiffusion:
    """ref ``gaussian_diffusion.py:101-186`` constructor semantics."""

    def __init__(
        self,
        betas: np.ndarray,
        model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
        model_var_type: ModelVarType = ModelVarType.FIXED_LARGE,
        loss_type: LossType = LossType.MSE,
        rescale_timesteps: bool = False,
    ):
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type
        self.rescale_timesteps = rescale_timesteps

        betas = np.asarray(betas, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        self.betas = betas
        self.num_timesteps = len(betas)

        alphas = 1.0 - betas
        # clamp away exact zero (beta == 1 at the final step of very short
        # linear schedules) so the 1/alphas_cumprod tables stay finite
        self.alphas_cumprod = np.maximum(np.cumprod(alphas), 1e-20)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(
            1.0 - self.alphas_cumprod)
        self.log_one_minus_alphas_cumprod = np.log(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(
            1.0 / self.alphas_cumprod - 1)

        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev)
            / (1.0 - self.alphas_cumprod))
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:]))
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev)
            / (1.0 - self.alphas_cumprod))
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas)
            / (1.0 - self.alphas_cumprod))

    # -- timestep scaling (ref ``:864-867``) --------------------------------
    def _scale_timesteps(self, t):
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    # -- q distributions -----------------------------------------------------
    def q_mean_variance(self, x_start, t):
        mean = _extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t,
                                x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Diffuse x_start to step t (ref ``q_sample:188-210``)."""
        return (_extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
                + _extract(self.sqrt_one_minus_alphas_cumprod, t,
                           x_start.ndim) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (_extract(self.posterior_mean_coef1, t, x_t.ndim) * x_start
                + _extract(self.posterior_mean_coef2, t, x_t.ndim) * x_t)
        var = _extract(self.posterior_variance, t, x_t.ndim)
        log_var = _extract(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    # -- x0 predictions --------------------------------------------------------
    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (_extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - _extract(self.sqrt_recipm1_alphas_cumprod, t,
                           x_t.ndim) * eps)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _extract(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _extract(self.posterior_mean_coef2 / self.posterior_mean_coef1,
                      t, x_t.ndim)
        return c1 * xprev - c2 * x_t

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return ((_extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                 - pred_xstart)
                / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))

    # -- p distribution (ref ``p_mean_variance:232-313``) -----------------------
    def p_mean_variance(self, model, x, t, clip_denoised=True,
                        denoised_fn=None, model_kwargs=None):
        model_kwargs = model_kwargs or {}
        B, C = x.shape[0], x.shape[1]
        model_output = model(x, self._scale_timesteps(t), **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED,
                                   ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2,
                                                       axis=1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t,
                                   x.ndim)
                max_log = _extract(np.log(self.betas), t, x.ndim)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            var = np.append(self.posterior_variance[1], self.betas[1:])
            model_variance = _extract(var, t, x.ndim)
            model_log_variance = _extract(np.log(var), t, x.ndim)
        else:  # FIXED_SMALL
            model_variance = _extract(self.posterior_variance, t, x.ndim)
            model_log_variance = _extract(
                self.posterior_log_variance_clipped, t, x.ndim)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        else:
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:  # EPSILON
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(
                pred_xstart, x, t)

        return dict(mean=model_mean, variance=model_variance,
                    log_variance=model_log_variance,
                    pred_xstart=pred_xstart)

    # -- ancestral sampling (ref ``p_sample:356-447``) ----------------------------
    def p_sample(self, model, x, t, key, clip_denoised=True,
                 denoised_fn=None, model_kwargs=None):
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero * jnp.exp(
            0.5 * out["log_variance"]) * noise
        return sample, out["pred_xstart"]

    def p_sample_loop(self, model, shape, key, noise=None,
                      clip_denoised=True, denoised_fn=None,
                      model_kwargs=None):
        """Full reverse loop as a scan (ref ``p_sample_loop:389-447``)."""
        k0, key = jax.random.split(key)
        x = noise if noise is not None else jax.random.normal(
            k0, shape, dtype=jnp.float32)

        def step(carry, inp):
            xi = carry
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
            xi, _ = self.p_sample(model, xi, t, k, clip_denoised,
                                  denoised_fn, model_kwargs)
            return xi, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)
        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    # -- DDIM (ref ``ddim_sample:479-564``) ------------------------------------------
    def ddim_sample(self, model, x, t, key, clip_denoised=True,
                    denoised_fn=None, model_kwargs=None, eta=0.0):
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        abar = _extract(self.alphas_cumprod, t, x.ndim)
        abar_prev = _extract(self.alphas_cumprod_prev, t, x.ndim)
        sigma = (eta * jnp.sqrt((1 - abar_prev) / (1 - abar))
                 * jnp.sqrt(1 - abar / abar_prev))
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(abar_prev)
                     + jnp.sqrt(1 - abar_prev - sigma ** 2) * eps)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        return mean_pred + nonzero * sigma * noise, out["pred_xstart"]

    def ddim_reverse_sample(self, model, x, t, clip_denoised=True,
                            denoised_fn=None, model_kwargs=None, eta=0.0):
        """Deterministic ODE step from x_t to x_{t+1} (ref ``:533-564``)."""
        assert eta == 0.0
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        eps = ((_extract(self.sqrt_recip_alphas_cumprod, t, x.ndim) * x
                - out["pred_xstart"])
               / _extract(self.sqrt_recipm1_alphas_cumprod, t, x.ndim))
        abar_next = _extract(self.alphas_cumprod_next, t, x.ndim)
        return (out["pred_xstart"] * jnp.sqrt(abar_next)
                + jnp.sqrt(1 - abar_next) * eps), out["pred_xstart"]

    def ddim_sample_loop(self, model, shape, key, noise=None,
                         clip_denoised=True, denoised_fn=None,
                         model_kwargs=None, eta=0.0):
        k0, key = jax.random.split(key)
        x = noise if noise is not None else jax.random.normal(
            k0, shape, dtype=jnp.float32)

        def step(carry, inp):
            xi = carry
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
            xi, _ = self.ddim_sample(model, xi, t, k, clip_denoised,
                                     denoised_fn, model_kwargs, eta)
            return xi, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)
        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    # -- losses (ref ``_vb_terms_bpd:643-675``, ``training_losses:677-745``) ---------
    def _vb_terms_bpd(self, model, x_start, x_t, t, clip_denoised=True,
                      model_kwargs=None, frozen_out=None):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(
            x_start, x_t, t)
        if frozen_out is not None:
            model_fn = lambda *a, r=frozen_out, **k: r
        else:
            model_fn = model
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised,
                                   model_kwargs=model_kwargs)
        kl = normal_kl(true_mean, true_log_var, out["mean"],
                       out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, out["mean"], 0.5 * out["log_variance"])
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return dict(output=output, pred_xstart=out["pred_xstart"])

    def training_losses(self, model, x_start, t, key, model_kwargs=None):
        """Per-sample loss dict (ref ``training_losses:677-745``)."""
        model_kwargs = model_kwargs or {}
        noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        terms = {}

        if self.loss_type in (LossType.KL, LossType.RESCALED_KL):
            terms["loss"] = self._vb_terms_bpd(
                model, x_start, x_t, t, clip_denoised=False,
                model_kwargs=model_kwargs)["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
        else:
            model_output = model(x_t, self._scale_timesteps(t),
                                 **model_kwargs)
            if self.model_var_type in (ModelVarType.LEARNED,
                                       ModelVarType.LEARNED_RANGE):
                model_output, model_var_values = jnp.split(
                    model_output, 2, axis=1)
                # vb term with frozen mean (stop-grad on the mean half)
                frozen = jnp.concatenate(
                    [jax.lax.stop_gradient(model_output),
                     model_var_values], axis=1)
                terms["vb"] = self._vb_terms_bpd(
                    None, x_start, x_t, t, clip_denoised=False,
                    frozen_out=frozen)["output"]
                if self.loss_type == LossType.RESCALED_MSE:
                    terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

            target = {
                ModelMeanType.PREVIOUS_X: self.q_posterior_mean_variance(
                    x_start, x_t, t)[0],
                ModelMeanType.START_X: x_start,
                ModelMeanType.EPSILON: noise,
            }[self.model_mean_type]
            terms["mse"] = mean_flat((target - model_output) ** 2)
            terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms

    # -- bpd eval (ref ``_prior_bpd:747-768``, ``calc_bpd_loop:770-841``) ---------------
    def _prior_bpd(self, x_start):
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1,
                     dtype=jnp.int32)
        mean, _, log_var = self.q_mean_variance(x_start, t)
        kl = normal_kl(mean, log_var, 0.0, 0.0)
        return mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(self, model, x_start, key, clip_denoised=True,
                      model_kwargs=None):
        B = x_start.shape[0]

        def step(carry, inp):
            t_scalar, k = inp
            t = jnp.full((B,), t_scalar, dtype=jnp.int32)
            noise = jax.random.normal(k, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(model, x_start, x_t, t, clip_denoised,
                                     model_kwargs)
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
            mse = mean_flat((eps - noise) ** 2)
            return carry, (out["output"], xstart_mse, mse)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)
        _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, (ts, keys))
        vb = vb.T  # (B, T) in reverse-t order; reference appends t desc
        prior_bpd = self._prior_bpd(x_start)
        total_bpd = vb.sum(axis=1) + prior_bpd
        return dict(total_bpd=total_bpd, prior_bpd=prior_bpd, vb=vb,
                    xstart_mse=xstart_mse.T, mse=mse.T)


# ---------------------------------------------------------------------------
# respacing (ref respace.py)
# ---------------------------------------------------------------------------

def space_timesteps(num_timesteps: int, section_counts) -> set:
    """DDIM-style timestep subset selection (ref ``respace.py:7-61``)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired} steps with striding")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into "
                f"{section_count}")
        stride = 1 if section_count <= 1 else (size - 1) / (
            section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


class SpacedDiffusion(GaussianDiffusion):
    """Diffusion on a subset of timesteps with model-step remapping
    (ref ``respace.py:63-122``)."""

    def __init__(self, use_timesteps, **kwargs):
        self.use_timesteps = set(use_timesteps)
        self.original_num_steps = len(kwargs["betas"])

        base = GaussianDiffusion(**kwargs)
        last_alpha_cumprod = 1.0
        new_betas = []
        self.timestep_map = []
        for i, alpha_cumprod in enumerate(base.alphas_cumprod):
            if i in self.use_timesteps:
                new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
                last_alpha_cumprod = alpha_cumprod
                self.timestep_map.append(i)
        kwargs["betas"] = np.array(new_betas)
        super().__init__(**kwargs)

    def p_mean_variance(self, model, *args, **kwargs):
        return super().p_mean_variance(self._wrap(model), *args, **kwargs)

    def training_losses(self, model, *args, **kwargs):
        return super().training_losses(self._wrap(model), *args, **kwargs)

    def _wrap(self, model):
        if model is None:
            return None
        tmap = jnp.asarray(self.timestep_map, dtype=jnp.int32)

        def wrapped(x, ts, **kw):
            new_ts = tmap[ts.astype(jnp.int32)]
            if self.rescale_timesteps:
                new_ts = new_ts.astype(jnp.float32) * (
                    1000.0 / self.original_num_steps)
            return model(x, new_ts, **kw)
        return wrapped

    def _scale_timesteps(self, t):
        return t  # handled by the wrapped model


def create_gaussian_diffusion(
    steps: int = 200,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = False,
    rescale_learned_sigmas: bool = True,
    timestep_respacing: str = "",
) -> SpacedDiffusion:
    """Mirror of ``script_util.create_gaussian_diffusion`` (``:129-170``);
    the audio repo's defaults: 200 linear steps, fixed-large variance,
    epsilon prediction, (rescaled) MSE loss."""
    betas = get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = [steps]
    return SpacedDiffusion(
        use_timesteps=space_timesteps(steps, timestep_respacing),
        betas=betas,
        model_mean_type=(ModelMeanType.EPSILON if not predict_xstart
                         else ModelMeanType.START_X),
        model_var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small
             else ModelVarType.FIXED_SMALL)
            if not learn_sigma else ModelVarType.LEARNED_RANGE),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )
