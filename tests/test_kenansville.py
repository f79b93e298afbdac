"""Kenansville FFT/SSA attacks: reconstruction identities and binary-search
behavior on a frequency-sensitive toy classifier."""

import numpy as np

import jax
import jax.numpy as jnp

from audiopure_tpu.attacks.kenansville import (
    KenansvilleAttack,
    fft_compression,
    inv_ssa,
    ssa,
    ssa_compression,
    ssa_window,
)


def test_fft_compression_zero_factor_is_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 256)
                    .astype(np.float32))
    out = fft_compression(x, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_fft_compression_kills_weak_tone():
    t = np.arange(1024) / 16000.0
    strong = np.sin(2 * np.pi * 1000 * t)
    weak = 0.01 * np.sin(2 * np.pi * 3000 * t)
    x = jnp.asarray((strong + weak).astype(np.float32))[None, None]
    X = np.abs(np.fft.rfft(np.asarray(x)[0, 0]))
    thr = jnp.asarray([X.max() * 0.5])
    out = np.asarray(fft_compression(x, thr))[0, 0]
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(1024, 1 / 16000)
    assert spec[np.argmin(np.abs(freqs - 3000))] < 0.05  # weak tone removed
    assert spec[np.argmin(np.abs(freqs - 1000))] > 100   # strong kept


def test_ssa_full_reconstruction():
    """Keeping all components reconstructs the series exactly."""
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(200).astype(np.float32))
    dim = 20
    pc, s, v = ssa(y, dim)
    rec = inv_ssa(pc, v, jnp.ones(dim))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(y), atol=1e-3)


def test_ssa_rank1_series():
    """A constant series is rank-1: one component reconstructs it."""
    y = jnp.ones(100, dtype=jnp.float32)
    pc, s, v = ssa(y, 10)
    mask = jnp.zeros(10).at[0].set(1.0)
    rec = inv_ssa(pc, v, mask)
    np.testing.assert_allclose(np.asarray(rec), 1.0, atol=1e-4)
    assert float(s[1]) < 1e-4  # remaining singular values ~ 0


def test_ssa_compression_batched():
    x = jnp.asarray(np.random.RandomState(1).randn(3, 1, 400)
                    .astype(np.float32))
    out, (pc, s, v) = ssa_compression(x, jnp.asarray([100.0, 50.0, 100.0]))
    assert out.shape == x.shape
    # 100% keeps everything
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(x[2]),
                               atol=1e-3)
    # 50% differs
    assert not np.allclose(np.asarray(out[1]), np.asarray(x[1]), atol=1e-3)


def test_kenansville_fft_attack_on_toy():
    """Classifier keyed on a weak high-freq tone: FFT attack finds a
    threshold that removes it."""
    t = np.arange(1024) / 16000.0
    strong = np.sin(2 * np.pi * 500 * t)
    weak = 0.05 * np.sin(2 * np.pi * 3000 * t)
    x = jnp.asarray((strong + weak).astype(np.float32))[None, None] * 0.5

    hi_bin = int(np.argmin(np.abs(np.fft.rfftfreq(1024, 1 / 16000) - 3000)))

    def model_fn(xx, key):
        spec = jnp.abs(jnp.fft.rfft(xx, axis=2))[:, 0, hi_bin]
        return jnp.stack([spec - 5.0, -spec + 5.0], axis=1)

    y = jnp.asarray([0])  # class 0 iff weak tone present
    assert int(jnp.argmax(model_fn(x, None), 1)[0]) == 0

    atk = KenansvilleAttack(model_fn, method="fft", max_iter=12)
    x_adv, succ = atk.generate(x, y, jax.random.PRNGKey(0))
    assert bool(succ[0])
    assert int(jnp.argmax(model_fn(x_adv, None), 1)[0]) == 1
    # strong tone survives: adv audio correlates with original
    corr = np.corrcoef(np.asarray(x_adv).ravel(), np.asarray(x).ravel())[0, 1]
    assert corr > 0.9


def test_ssa_window_rule():
    assert ssa_window(16000) == 800
    assert ssa_window(100000) == 3000


def test_int16_roundtrip_matches_reference_cast():
    """``int16_output`` reproduces the scalar variant's output cast
    (``_Kenan.py:83``: ``np.asarray(ifft_audio, dtype=np.int16)``) for
    in-range values — truncation toward zero, applied at the raw WAV
    int16 scale the reference pipeline carries."""
    from audiopure_tpu.attacks.kenansville import (fft_compression,
                                                   int16_roundtrip)

    rng = np.random.RandomState(0)
    # int16-scale signal, like the reference's scipy WAV read
    x = (rng.randn(2, 1, 400) * 8000.0).astype(np.float32)

    # the reference fft path on the same data: rfft==fft for real input
    # up to the conjugate half, but _Kenan.py uses full fft — emulate
    # exactly with numpy
    factor = np.array([150.0, 90.0], dtype=np.float32)
    want = []
    for i in range(2):
        X = np.fft.fft(x[i, 0])
        X[np.abs(X) < factor[i]] = 0
        want.append(np.fft.ifft(X).real.astype(np.int16))
    want = np.stack(want)[:, None, :]

    got = fft_compression(jnp.asarray(x), jnp.asarray(factor),
                          int16_output=True)
    np.testing.assert_array_equal(np.asarray(got).astype(np.int16), want)
    # float round trip: values are exactly the int16 lattice
    assert float(jnp.abs(got - jnp.round(got)).max()) == 0.0

    # saturation (documented deviation from numpy's wrapping C cast)
    sat = int16_roundtrip(jnp.asarray([[40000.0, -40000.0, 12.7]]))
    np.testing.assert_array_equal(np.asarray(sat),
                                  [[32767.0, -32768.0, 12.0]])
