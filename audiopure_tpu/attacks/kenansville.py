"""Kenansville signal-processing attacks: FFT-zeroing and SSA compression.

TPU-native rebuild of ``robustness_eval/_KenanFFT.py`` (batched FFT variant,
``:57-246``), ``_Kenan.py`` (scalar variant) and ``_ssa_core.py:50-169``:

* ``fft_compression`` — zero rfft bins whose magnitude is below a per-sample
  threshold, inverse transform (``_KenanFFT.py:57-82``).
* ``ssa`` / ``inv_ssa`` — Singular Spectrum Analysis: hankel trajectory
  matrix -> SVD -> masked component reconstruction. The reference's
  ``torch.nn.Fold`` anti-diagonal averaging (``_ssa_core.py:158-165``)
  becomes a vmapped per-row roll + sum; the dynamic component-count ``k``
  becomes a *mask* on the singular components so shapes stay static.
* ``KenansvilleAttack`` — per-sample binary search over the attack factor
  with model queries (``atk_bst_fft``, ``_KenanFFT.py:180-246``), as one
  ``lax.scan`` over iterations.

Unlike the reference, SSA here is batched (vmapped over the batch) — the
reference ravels the whole batch through one decomposition
(``_KenanFFT.py:95``), which is only correct for batch size 1.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# FFT compression
# ---------------------------------------------------------------------------

def int16_roundtrip(audio: jnp.ndarray) -> jnp.ndarray:
    """The scalar reference variant's int16 output cast
    (``_Kenan.py:83,112``: ``np.asarray(ifft_audio, dtype=np.int16)``),
    as a float-valued round trip: truncate toward zero to an integer,
    saturate to the int16 range.

    The reference pipeline carries raw WAV int16-scale samples, so the
    cast is applied at unit scale — callers on this framework's
    [-1, 1] float convention should pass ``audio * 32768`` (and rescale
    back) if they want bit-exact ``_Kenan.py`` outputs. Deviation: numpy's
    C-cast wraps on out-of-range values (undefined behavior); this
    round trip saturates instead (documented in docs/PARITY.md).
    """
    return jnp.clip(jnp.trunc(audio), -32768.0, 32767.0).astype(
        audio.dtype)


def fft_compression(audio: jnp.ndarray, factor: jnp.ndarray,
                    int16_output: bool = False) -> jnp.ndarray:
    """Zero rfft coefficients with |X_k| < factor (per sample).

    audio: (B, 1, L); factor: (B,). ``int16_output=True`` reproduces the
    scalar variant's int16 output quantization (``_Kenan.py:70-83``);
    default False matches the batched ``_KenanFFT.py:57-82`` float
    pipeline (the variant the reference eval actually drives).
    """
    X = jnp.fft.rfft(audio, axis=2)
    mask = jnp.abs(X) >= factor[:, None, None]
    out = jnp.fft.irfft(X * mask, n=audio.shape[2], axis=2).astype(
        audio.dtype)
    return int16_roundtrip(out) if int16_output else out


# ---------------------------------------------------------------------------
# SSA
# ---------------------------------------------------------------------------

def ssa(y: jnp.ndarray, dim: int):
    """SSA decomposition of a 1-D series (ref ``_ssa_core.py:50-101``).

    Returns (pc, s, v): principal components (t, dim), singular values,
    right singular vectors (dim, dim) with components in columns.
    """
    n = y.shape[-1]
    t = n - (dim - 1)
    idx = np.arange(t)[:, None] + np.arange(dim)[None, :]
    yy = y[..., idx] / np.sqrt(t)
    u, s, vh = jnp.linalg.svd(yy, full_matrices=False)
    v = jnp.swapaxes(vh, -1, -2)
    pc = yy @ v
    return pc, s, v


def inv_ssa(pc: jnp.ndarray, v: jnp.ndarray, k_mask: jnp.ndarray
            ) -> jnp.ndarray:
    """Reconstruct a series from components selected by the boolean/0-1
    ``k_mask`` (dim,) — the masked-static version of the reference's index
    list ``k`` (``_ssa_core.py:104-169``).

    Single-sample: pc (t, dim), v (dim, dim); vmap for batches.
    """
    t, dim = pc.shape
    pc_comp = (pc * k_mask[None, :]) @ v.T            # (t, dim)

    # anti-diagonal sum: xr[p] = sum_j pc_comp[p-j, j]
    cols = jnp.pad(pc_comp.T, ((0, 0), (0, dim)))     # (dim, t+dim)
    rolled = jax.vmap(jnp.roll)(cols, jnp.arange(dim))
    xr = rolled.sum(axis=0)[: t + dim - 1]

    counts = jnp.concatenate([
        jnp.arange(1, dim + 1, dtype=pc.dtype),
        jnp.full((t + dim - 1 - 2 * dim,), dim, dtype=pc.dtype),
        jnp.arange(dim, 0, -1, dtype=pc.dtype),
    ])
    return xr / counts * np.sqrt(t)


def ssa_window(length: int) -> int:
    """Reference window rule (``_KenanFFT.py:96-99``)."""
    return min(int(length * 0.05), 3000)


def ssa_compression(audio: jnp.ndarray, factor_pct: jnp.ndarray,
                    pc=None, s=None, v=None,
                    int16_output: bool = False) -> jnp.ndarray:
    """Keep the top ``factor_pct``% of SSA components (per sample).

    audio: (B, 1, L); factor_pct: (B,) in [0, 100]. ``int16_output=True``
    reproduces the scalar variant's int16 output quantization
    (``_Kenan.py:86-112``).
    """
    B, _, L = audio.shape
    dim = ssa_window(L)
    y = audio[:, 0, :]
    if pc is None:
        pc, s, v = jax.vmap(lambda yy: ssa(yy, dim))(y)
    n_keep = jnp.maximum((dim * factor_pct / 100.0).astype(jnp.int32), 1)
    masks = (jnp.arange(dim)[None, :] < n_keep[:, None]).astype(audio.dtype)
    rec = jax.vmap(inv_ssa)(pc, v, masks)
    if int16_output:
        rec = int16_roundtrip(rec)
    return rec[:, None, :], (pc, s, v)


# ---------------------------------------------------------------------------
# Binary-search attack
# ---------------------------------------------------------------------------

class KenansvilleAttack:
    """Binary search over the attack factor against ``model_fn(x, key)``.

    method='fft': factor in [0, max|FFT|], zero-below-threshold; success
    shrinks the factor (less distortion), failure grows it — the
    ``atk_bst_fft`` loop (``_KenanFFT.py:209-245``).
    method='ssa': factor = % components kept in [0, 100]; success *raises*
    the kept fraction (less distortion), failure lowers it
    (``bst_atk_factor``, ``_KenanFFT.py:133-178``).
    """

    def __init__(self, model_fn: Callable, method: str = "fft",
                 max_iter: int = 15, targeted: bool = False,
                 raster_width: float = 100.0):
        assert method in ("fft", "ssa")
        self.model_fn = model_fn
        self.method = method
        self.max_iter = int(max_iter)
        self.targeted = targeted
        self.raster_width = raster_width
        self._jitted = None

    def generate(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One compiled program per shape (the eager version paid the
        remote-dispatch latency on every outer op — measured 1.1-1.3
        s/utt vs the ~query-bound jitted path); model params are hoisted
        out of the closure like the PGD stage-1 program."""
        from audiopure_tpu.utils.jit_utils import hoisted_jit

        if self._jitted is None:
            self._jitted = hoisted_jit(self._generate_impl)
        return self._jitted(x, y, key)

    def _generate_impl(self, x: jnp.ndarray, y: jnp.ndarray,
                       key: jax.Array
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = x.shape[0]

        if self.method == "fft":
            max_f = jnp.max(jnp.abs(jnp.fft.fft(x, axis=2)), axis=(1, 2))
            perturb = lambda f: fft_compression(x, f)
            shrink_on_success = True
        else:
            dim = ssa_window(x.shape[2])
            pc, s, v = jax.vmap(lambda yy: ssa(yy, dim))(x[:, 0, :])
            max_f = jnp.full((B,), 100.0, dtype=x.dtype)

            def perturb(f):
                n_keep = jnp.maximum((dim * f / 100.0).astype(jnp.int32), 1)
                masks = (jnp.arange(dim)[None, :] < n_keep[:, None]).astype(
                    x.dtype)
                rec = jax.vmap(inv_ssa)(pc, v, masks)
                return rec[:, None, :]

            shrink_on_success = False  # more components = less distortion

        min_f = jnp.zeros((B,), dtype=x.dtype)
        f0 = max_f / 2.0

        def body(carry, key_i):
            min_f, max_f, f, best, succ = carry
            x_p = perturb(f)
            logits = self.model_fn(x_p, key_i)
            pred = jnp.argmax(logits, axis=-1)
            hit = (pred == y) if self.targeted else (pred != y)

            best = jnp.where(hit[:, None, None], x_p, best)
            succ = jnp.logical_or(succ, hit)

            if shrink_on_success:
                new_max = jnp.where(hit, f, max_f)
                new_min = jnp.where(hit, min_f, f)
            else:
                new_min = jnp.where(hit, f, min_f)
                new_max = jnp.where(hit, max_f, f)
            new_f = jnp.abs(new_min + new_max) / 2.0
            return (new_min, new_max, new_f, best, succ), None

        carry0 = (min_f, max_f, f0, x,
                  jnp.zeros((B,), dtype=bool))
        keys = jax.random.split(key, self.max_iter)
        (_, _, _, best, succ), _ = jax.lax.scan(body, carry0, keys)
        return best, succ

    __call__ = generate
