"""Reverse VP-SDE purifier — the main "Diffusion" defense.

TPU-native rebuild of ``diffusion_models/diffwave_sde.py:34-218`` (waveform)
and ``diffusion_models/improved_diffusion_sde.py:48-226`` (spectrogram,
"DiffSpec"). The reference integrates the reverse SDE with torchsde's Euler
solver and adjoint gradients; here the Euler loop is a ``lax.scan`` and
gradients flow by ``jax.grad`` through the scan (with per-step
``jax.checkpoint``), replacing the adjoint method entirely.

Reference discretization quirks reproduced exactly (SURVEY.md §7 "hard
parts"):

* time grid ``ts = [1 - t/T - 1e-5, 1 - 1e-5]`` with ``dt = 1/T`` — torchsde
  takes exactly t Euler steps; at step k the *discrete* index is
  ``floor((1-t')*N) - 1 = t-k-1`` (``diffwave_sde.py:69-77``),
* discrete beta tables inside the continuous SDE:
  ``beta(t) = discrete_betas[idx] * N`` (``:77``),
* score from the eps-net with *discrete* normalization:
  ``score = -eps / sqrt(1-abar[idx])`` (``:99``),
* diffusion scaled by ``sqrt((1-abar[idx-1])/(1-abar[idx]))``, zero at
  idx==0 (``:108-115``),
* the eps-net is queried under ``torch.no_grad`` (``diffwave_ddpm.py:166``),
  so reference gradients exclude the score-net Jacobian. ``grad_mode='ref'``
  reproduces that built-in BPDA-like surrogate; ``grad_mode='full'``
  differentiates through the score net (the stronger adaptive attack).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RevVPSDE:
    """Euler–Maruyama integrator for the reverse VP-SDE.

    Args:
      eps_fn: ``eps_fn(x, steps)`` epsilon-net apply; x keeps its natural
        shape (no flatten-to-2D dance — that was a torchsde API restriction).
      N: total discrete steps (200 for DiffWave, 1000 for ImprovedDiffusion).
      beta_min/beta_max: continuous-time betas; the reference passes
        ``0.0001*T`` and ``0.02*T`` for DiffWave (``diffwave_sde.py:158``).
      grad_mode: 'ref' (stop-grad through eps-net) or 'full'.
      eps_is_scaled: if True, eps-net expects t in [0, N) *unscaled* ints
        (DiffWave); the ImprovedDiffusion UNet takes the same convention.
    """

    def __init__(
        self,
        eps_fn: Callable,
        N: int = 200,
        beta_min: float = 0.02,
        beta_max: float = 4.0,
        grad_mode: str = "ref",
        remat: bool = True,
    ):
        from audiopure_tpu.utils.grads import nondifferentiable

        # 'ref' gradient contract: the eps-net is opaque to autodiff
        # (never linearized — required for kernels without JVP rules)
        self.eps_fn = nondifferentiable(eps_fn) if grad_mode == "ref" \
            else eps_fn
        self.N = int(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        self.grad_mode = grad_mode
        self.remat = remat

        betas = np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        self.discrete_betas = jnp.asarray(betas, dtype=jnp.float32)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        self.sqrt_1m_alphas_cumprod = jnp.asarray(
            np.sqrt(1.0 - alphas_cumprod), dtype=jnp.float32
        )

    def _score_eps(self, x: jnp.ndarray, idx) -> jnp.ndarray:
        steps = jnp.full((x.shape[0], 1), idx, dtype=jnp.float32)
        return self.eps_fn(x, steps)  # 'ref' mode wraps at construction

    def reverse_drift_diffusion(self, x: jnp.ndarray, idx):
        """Drift/diffusion of the reverse SDE at discrete index ``idx``.

        Returns (f, g) for the *time-reversed* parametrization used by the
        reference's ``f``/``g`` (``diffwave_sde.py:118-134``): the Euler step
        is ``x += f dt + g sqrt(dt) z``.
        """
        beta_t = self.discrete_betas[idx] * self.N
        eps = self._score_eps(x, idx)
        score = -eps / self.sqrt_1m_alphas_cumprod[idx]
        # forward drift - g^2 * score, then time-reversal negates it
        drift = -0.5 * beta_t * x - beta_t * score
        f = -drift
        # diffusion scale factor: sqrt((1-abar[idx-1]) / (1-abar[idx])),
        # zero at idx == 0 (ref ``:108-115``)
        safe_prev = jnp.maximum(idx - 1, 0)
        scale = jnp.sqrt(
            (1.0 - self.alphas_cumprod[safe_prev])
            / (1.0 - self.alphas_cumprod[idx])
        )
        scale = jnp.where(idx > 0, scale, 0.0)
        g = scale * jnp.sqrt(beta_t)
        return f, g

    def integrate(self, x: jnp.ndarray, t, key: jax.Array,
                  max_t: Optional[int] = None) -> jnp.ndarray:
        """Euler–Maruyama from noise level t down to 0 — t steps of dt=1/N.

        Step k uses discrete index ``t-k-1`` (see module docstring).
        ``t`` may be traced (randomized noise level) if ``max_t`` bounds it:
        the scan runs ``max_t`` masked steps.
        """
        dt = 1.0 / self.N
        if max_t is None and isinstance(t, jax.core.Tracer):
            raise TypeError(
                "RevVPSDE.integrate: `t` is a traced value (e.g. a "
                "randomized noise level under jit/vmap); pass max_t=<static "
                "upper bound> so the scan can run a fixed number of masked "
                "steps.")
        n_steps = int(t) if max_t is None else int(max_t)

        def step(carry, inp):
            xk = carry
            k, kk = inp
            idx = t - 1 - k
            f, g = self.reverse_drift_diffusion(xk, jnp.maximum(idx, 0))
            z = jax.random.normal(kk, xk.shape, dtype=xk.dtype)
            x_next = xk + f * dt + g * np.sqrt(dt) * z
            return jnp.where(idx >= 0, x_next, xk), None

        if self.remat:
            step = jax.checkpoint(step)

        keys = jax.random.split(key, n_steps)
        x0, _ = jax.lax.scan(step, x, (jnp.arange(n_steps), keys))
        return x0


class RevDiffWave:
    """VP-SDE waveform purifier ("Diffusion" defense).

    Reference: ``RevDiffWave.audio_editing_sample``
    (``diffwave_sde.py:167-212``): noise to step t with the q-sample jump,
    integrate the reverse SDE back to 0; repeat ``sample_step`` times,
    concatenating results along the batch axis.
    """

    def __init__(
        self,
        eps_fn: Callable,
        T: int = 200,
        t: int = 3,
        sample_step: int = 1,
        beta_0: float = 1e-4,
        beta_T: float = 0.02,
        grad_mode: str = "ref",
        remat: bool = True,
        rand_t: bool = False,
        t_delta: int = 0,
    ):
        self.T = int(T)
        self.t = int(t)
        self.sample_step = int(sample_step)
        self.rand_t = bool(rand_t)
        self.t_delta = int(t_delta)
        self.sde = RevVPSDE(
            eps_fn, N=T, beta_min=beta_0 * T, beta_max=beta_T * T,
            grad_mode=grad_mode, remat=remat,
        )

    def purify_once(self, x0: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        k_noise, k_sde, k_t = jax.random.split(key, 3)
        if self.rand_t:
            # total_noise_levels = t + randint(-t_delta, t_delta)
            # (ref ``diffwave_sde.py:186-189``); masked fixed-bound scan
            t_drawn = self.t + jax.random.randint(
                k_t, (), -self.t_delta, self.t_delta)
            max_t = self.t + self.t_delta
        else:
            t_drawn, max_t = self.t, None
        abar = self.sde.alphas_cumprod[t_drawn - 1]
        e = jax.random.normal(k_noise, x0.shape, dtype=x0.dtype)
        x = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * e
        return self.sde.integrate(x, t_drawn, k_sde, max_t=max_t)

    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """(B, 1, L) -> (sample_step*B, 1, L), like the reference's concat
        over ``sample_step`` purification runs (``diffwave_sde.py:183-212``).

        Purification rounds CHAIN: round ``it`` re-purifies round
        ``it-1``'s output (the reference reassigns ``x0 = xs_[-1]``
        inside its loop, ``diffwave_sde.py:205``), and every
        intermediate purified waveform is concatenated along batch.
        """
        if self.sample_step == 1:
            return self.purify_once(x, key)
        keys = jax.random.split(key, self.sample_step)
        outs = []
        for k in keys:
            x = self.purify_once(x, k)
            outs.append(x)
        return jnp.concatenate(outs, axis=0)


class RevSpecDiffusion:
    """VP-SDE mel-spectrogram purifier ("DiffSpec" defense).

    Reference: ``RevImprovedDiffusion.image_editing_sample``
    (``improved_diffusion_sde.py:173-221``): standardize log-mel to [-1, 1]
    with the SC09 corpus bounds, purify on (B, 1, 32, 32), inverse-
    standardize. N=1000, beta in [0.1, 20] continuous.

    Note the spectrogram RevVPSDE uses *continuous* beta and score
    normalization (``improved_diffusion_sde.py:84-119``) unlike the waveform
    one — reproduced here via ``continuous=True``.
    """

    MEL_UPPER = 38.22   # ref sc09_spectrogram_dataset.py:62-63
    MEL_LOWER = -100.0

    def __init__(
        self,
        eps_fn: Callable,
        N: int = 1000,
        t: int = 100,
        sample_step: int = 1,
        beta_min: float = 0.1,
        beta_max: float = 20.0,
        grad_mode: str = "ref",
        remat: bool = True,
        rand_t: bool = False,
        t_delta: int = 0,
        unroll: int = 1,
    ):
        self.N = int(N)
        self.t = int(t)
        from audiopure_tpu.utils.grads import nondifferentiable

        self.sample_step = int(sample_step)
        # lax.scan unroll factor for the reverse-SDE walk: >1 lets XLA
        # fuse the cheap inter-step elementwise chain into the UNet
        # steps and amortizes loop overhead (a pure compute-schedule
        # knob — the step math and key stream are unchanged)
        self.unroll = int(unroll)
        self.eps_fn = nondifferentiable(eps_fn) if grad_mode == "ref" \
            else eps_fn
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        self.grad_mode = grad_mode
        self.remat = remat
        # rand_t: total_noise_levels = t + randint(-t_delta, t_delta)
        # (ref ``image_editing_sample:188-190``, a HOST numpy draw there;
        # here a traced draw over precomputed per-t solver grids so the
        # whole purifier stays one compiled program)
        self.rand_t = bool(rand_t)
        self.t_delta = int(t_delta)
        if self.rand_t and self.t_delta < 1:
            raise ValueError("rand_t needs t_delta >= 1 "
                             "(randint(-t_delta, t_delta))")
        if self.rand_t and self.t_delta >= t:
            # t_drawn <= 0 would silently index alphas_cumprod[-1]
            # (near-pure noise) with an empty solver row — the reference
            # has the same hazard (image_editing_sample:188-190); fail
            # loudly instead (docs/PARITY.md)
            raise ValueError(
                f"rand_t needs t_delta < t (got t={t}, "
                f"t_delta={t_delta}): t + randint(-t_delta, t_delta) "
                "must stay >= 1")

        betas = np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
        self.alphas_cumprod = jnp.asarray(np.cumprod(1.0 - betas),
                                          dtype=jnp.float32)

    @classmethod
    def standardize(cls, x):
        return 2.0 * (x - cls.MEL_LOWER) / (cls.MEL_UPPER - cls.MEL_LOWER) - 1.0

    @classmethod
    def inv_standardize(cls, x):
        return (x + 1.0) * (cls.MEL_UPPER - cls.MEL_LOWER) / 2.0 + cls.MEL_LOWER

    def _solver_grid(self, t: Optional[int] = None):
        """Host-side f32 replica of torchsde's fixed-step Euler grid.

        The reference passes NO ``dt`` (``improved_diffusion_sde.py:
        202-204``), so torchsde uses its default 1e-3 and accumulates
        ``curr_t = f32(curr_t + dt)`` on f32 tensors, clipping the final
        step at ``t1 = f32(1 - 1e-5)``.  The discrete eps-net index is
        ``(f32(1 - tau) * N).long()`` — truncation on the f32-rounded
        physical time, which can land one integer BELOW the exact value
        (e.g. tau=0.951 -> 48, not 49).  Reproducing that walk exactly
        requires doing it in f32, done here once at trace time (t is
        static).  Returns (t_phys[f32], h[f32 step sizes], disc[int32]).
        """
        if t is None:
            t = self.t
        one = np.float32(1.0)
        dt = np.float32(1e-3)          # torchsde default, NOT 1/N
        # t0/t1 are python-f64 expressions rounded once to f32 by
        # torch.linspace (ref :194-197)
        tau = np.float32(1.0 - t * 1.0 / self.N)
        t1 = np.float32(1.0 - 1e-5)
        taus, hs = [], []
        while tau < t1:
            nxt = min(np.float32(tau + dt), t1)
            taus.append(tau)
            hs.append(np.float32(nxt - tau))
            tau = nxt
        taus = np.asarray(taus, np.float32)
        t_phys = (one - taus).astype(np.float32)
        disc = (t_phys * np.float32(self.N)).astype(np.int32)  # .long() trunc
        return taus, t_phys, np.asarray(hs, np.float32), disc

    def _step_fg(self, x, t_phys, disc):
        """Continuous-time reverse drift/diffusion at physical time
        ``t_phys`` with eps-net step index ``disc``; see
        ``improved_diffusion_sde.py:84-119``."""
        beta_t = self.beta_0 + t_phys * (self.beta_1 - self.beta_0)
        steps = jnp.full((x.shape[0],), disc, dtype=jnp.float32)
        eps = self.eps_fn(x, steps[:, None])
        # continuous alphas_cumprod(t) = exp(-0.5 (b1-b0) t^2 - b0 t)
        abar_cont = jnp.exp(-0.5 * (self.beta_1 - self.beta_0) * t_phys ** 2
                            - self.beta_0 * t_phys)
        score = -eps / jnp.sqrt(1.0 - abar_cont)
        drift = -0.5 * beta_t * x - beta_t * score
        f = -drift
        g = jnp.sqrt(beta_t)
        return f, g

    def _stacked_grids(self):
        """Per-candidate-t solver grids, padded to a common length.

        Returns (t_values, t_phys (T, S), hs (T, S), disc (T, S),
        valid (T, S)) where T = number of candidate noise levels
        (1 without rand_t; 2*t_delta with it) and S = max step count.
        Padded steps carry h=0/valid=False and are no-ops in the scan.
        """
        ts = ([self.t + d for d in range(-self.t_delta, self.t_delta)]
              if self.rand_t else [self.t])
        grids = [self._solver_grid(t) for t in ts]
        S = max(len(g[1]) for g in grids)

        def padded(arr, fill):
            out = np.full((S,), fill, dtype=arr.dtype)
            out[: len(arr)] = arr
            return out

        t_phys = np.stack([padded(g[1], 0.0) for g in grids])
        hs = np.stack([padded(g[2], 0.0) for g in grids])
        disc = np.stack([padded(g[3], 0) for g in grids])
        valid = np.stack([padded(np.ones(len(g[1]), bool), False)
                          for g in grids])
        return ts, t_phys, hs, disc, valid

    def purify_once(self, spec01: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        k_noise, k_sde, k_t = jax.random.split(key, 3)
        ts, t_phys, hs, disc, valid = self._stacked_grids()
        if self.rand_t:
            row = jax.random.randint(k_t, (), 0, len(ts))
            t_drawn = self.t + row - self.t_delta
        else:
            row = jnp.asarray(0)
            t_drawn = jnp.asarray(self.t)
        abar = self.alphas_cumprod[t_drawn - 1]
        e = jax.random.normal(k_noise, spec01.shape, dtype=spec01.dtype)
        x = jnp.sqrt(abar) * spec01 + jnp.sqrt(1.0 - abar) * e

        # exact torchsde grid (f32 walk, final step clipped at 1 - 1e-5,
        # f32-truncated disc indices) — see _solver_grid; with rand_t the
        # drawn row selects among the stacked per-t grids and padded
        # steps are masked no-ops
        tp_r = jnp.asarray(t_phys)[row]
        hs_r = jnp.asarray(hs)[row]
        disc_r = jnp.asarray(disc)[row]
        valid_r = jnp.asarray(valid)[row]

        def step(carry, inp):
            xk = carry
            tp, h, dk, ok, kk = inp
            # padded grid rows carry tp=0, where _step_fg's
            # 1/sqrt(1-abar_cont(0)) is infinite; the inf rides the
            # not-taken where-branch and poisons grad_mode='full'
            # cotangents with 0*inf = NaN. Substitute a benign t BEFORE
            # the computation so padded steps are finite no-ops (the
            # where below still discards their value).
            tp = jnp.where(ok, tp, 0.5)
            f, g = self._step_fg(xk, tp, dk)
            z = jax.random.normal(kk, xk.shape, dtype=xk.dtype)
            x_next = xk + f * h + g * jnp.sqrt(h) * z
            return jnp.where(ok, x_next, xk), None

        if self.remat:
            step = jax.checkpoint(step)
        ks = jax.random.split(k_sde, tp_r.shape[0])
        x0, _ = jax.lax.scan(step, x, (tp_r, hs_r, disc_r, valid_r, ks),
                             unroll=self.unroll)
        return x0

    def __call__(self, spec: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """(B, 1, n_mels, frames) log-mel dB -> purified log-mel dB.

        Rounds chain like the waveform variant (ref
        ``improved_diffusion_sde.py:206``), but in STANDARDIZED space:
        the reference inv-standardizes at the end of each round and then
        q-jumps the raw dB-scale values on the next round
        (``improved_diffusion_sde.py:186-206``) — a bug (the SDE is
        trained on [-1, 1] inputs; dB values ~[-100, 38] make round >= 2
        meaningless).  Fixed here by re-purifying the standardized
        output; deviation documented in docs/PARITY.md.
        """
        x0 = self.standardize(spec)
        if self.sample_step == 1:
            return self.inv_standardize(self.purify_once(x0, key))
        keys = jax.random.split(key, self.sample_step)
        outs = []
        for k in keys:
            x0 = self.purify_once(x0, k)
            outs.append(self.inv_standardize(x0))
        return jnp.concatenate(outs, axis=0)
