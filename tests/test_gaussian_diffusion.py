"""GaussianDiffusion math: closed-form identities, sampling loops,
respacing consistency, losses; UNet forward; spectrogram purifier."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiopure_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    SpacedDiffusion,
    create_gaussian_diffusion,
    discretized_gaussian_log_likelihood,
    get_named_beta_schedule,
    normal_kl,
    space_timesteps,
)
from audiopure_tpu.diffusion.spec_purifier import (
    SpecDDPMPurifier,
    melspec_inv_standardize,
    melspec_standardize,
)

ZERO_MODEL = lambda x, t, **kw: jnp.zeros_like(x)
T = 50
BETAS = get_named_beta_schedule("linear", T)


def _gd(**kw):
    defaults = dict(betas=BETAS, model_mean_type=ModelMeanType.EPSILON,
                    model_var_type=ModelVarType.FIXED_LARGE,
                    loss_type=LossType.MSE)
    defaults.update(kw)
    return GaussianDiffusion(**defaults)


def test_linear_schedule_scaling():
    b200 = get_named_beta_schedule("linear", 200)
    assert abs(b200[0] - 5 * 1e-4) < 1e-12  # scale = 1000/200 = 5
    assert abs(b200[-1] - 5 * 0.02) < 1e-12
    b_cos = get_named_beta_schedule("cosine", 100)
    assert (b_cos > 0).all() and (b_cos <= 0.999).all()


def test_q_sample_statistics():
    gd = _gd()
    x0 = jnp.ones((4096, 1, 2, 2))
    t = jnp.full((4096,), 30, dtype=jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x_t = gd.q_sample(x0, t, noise)
    assert abs(float(x_t.mean()) - gd.sqrt_alphas_cumprod[30]) < 0.02
    assert abs(float(x_t.std()) -
               gd.sqrt_one_minus_alphas_cumprod[30]) < 0.02


def test_posterior_identity():
    """q_posterior(x0, x_t=x0, t) mean must interpolate exactly:
    coef1+coef2 scaling of the same point."""
    gd = _gd()
    x = jnp.ones((2, 1, 2, 2)) * 0.5
    t = jnp.asarray([10, 40])
    mean, var, logvar = gd.q_posterior_mean_variance(x, x, t)
    want = (gd.posterior_mean_coef1[np.array(t)]
            + gd.posterior_mean_coef2[np.array(t)]) * 0.5
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, 0], want,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var)[:, 0, 0, 0],
                               gd.posterior_variance[np.array(t)], rtol=1e-5)


def test_eps_xstart_roundtrip():
    gd = _gd()
    key = jax.random.PRNGKey(1)
    x_t = jax.random.normal(key, (3, 1, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(2), x_t.shape)
    t = jnp.asarray([5, 20, 45])
    x0 = gd._predict_xstart_from_eps(x_t, t, eps)
    eps_back = gd._predict_eps_from_xstart(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps),
                               atol=1e-4)


def test_p_sample_loop_runs():
    gd = _gd()
    out = gd.p_sample_loop(ZERO_MODEL, (8, 1, 4, 4), jax.random.PRNGKey(0))
    assert out.shape == (8, 1, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5  # final mu clipped


def test_ddim_eta0_deterministic():
    gd = _gd()
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 4, 4))
    a = gd.ddim_sample_loop(ZERO_MODEL, (2, 1, 4, 4),
                            jax.random.PRNGKey(0), noise=noise)
    b = gd.ddim_sample_loop(ZERO_MODEL, (2, 1, 4, 4),
                            jax.random.PRNGKey(99), noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_training_losses_mse():
    gd = _gd()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 4, 4)) * 0.5
    t = jnp.asarray([0, 10, 20, 49])
    terms = gd.training_losses(ZERO_MODEL, x0, t, jax.random.PRNGKey(1))
    # zero model predicting eps=0: mse == mean(noise^2) ~ 1
    assert terms["loss"].shape == (4,)
    assert 0.2 < float(terms["mse"].mean()) < 3.0


def test_training_losses_learned_range_has_vb():
    gd = _gd(model_var_type=ModelVarType.LEARNED_RANGE,
             loss_type=LossType.RESCALED_MSE)
    model = lambda x, t, **kw: jnp.concatenate(
        [jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 4)) * 0.3
    t = jnp.asarray([3, 30])
    terms = gd.training_losses(model, x0, t, jax.random.PRNGKey(1))
    assert "vb" in terms and np.isfinite(np.asarray(terms["vb"])).all()


def test_normal_kl_and_likelihood():
    np.testing.assert_allclose(
        np.asarray(normal_kl(0.0, 0.0, 0.0, 0.0)), 0.0, atol=1e-7)
    assert float(normal_kl(1.0, 0.0, 0.0, 0.0)) == pytest.approx(0.5)
    ll = discretized_gaussian_log_likelihood(
        jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.full((2, 2), -2.0))
    assert np.isfinite(np.asarray(ll)).all()


def test_space_timesteps_and_spaced_consistency():
    assert space_timesteps(200, "ddim25") == set(range(0, 200, 8))
    full = space_timesteps(50, [50])
    assert full == set(range(50))
    # full respacing == base diffusion
    sd = SpacedDiffusion(use_timesteps=full, betas=BETAS,
                         model_mean_type=ModelMeanType.EPSILON,
                         model_var_type=ModelVarType.FIXED_LARGE,
                         loss_type=LossType.MSE)
    gd = _gd()
    np.testing.assert_allclose(sd.betas, gd.betas, rtol=1e-10)
    # subsampled: fewer steps, alphas_cumprod at the kept steps preserved
    sd10 = SpacedDiffusion(use_timesteps=space_timesteps(50, [10]),
                           betas=BETAS,
                           model_mean_type=ModelMeanType.EPSILON,
                           model_var_type=ModelVarType.FIXED_LARGE,
                           loss_type=LossType.MSE)
    assert sd10.num_timesteps == 10
    kept = sorted(space_timesteps(50, [10]))
    np.testing.assert_allclose(sd10.alphas_cumprod,
                               gd.alphas_cumprod[kept], rtol=1e-8)


def test_create_gaussian_diffusion_defaults():
    d = create_gaussian_diffusion(steps=200)
    assert d.num_timesteps == 200
    assert d.model_mean_type == ModelMeanType.EPSILON
    assert d.model_var_type == ModelVarType.FIXED_LARGE
    assert d.loss_type == LossType.RESCALED_MSE


def test_bpd_loop_runs():
    gd = _gd()
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 4))
                  * 0.3, -1, 1)
    out = gd.calc_bpd_loop(ZERO_MODEL, x0, jax.random.PRNGKey(1))
    assert out["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert out["vb"].shape == (2, T)


def test_melspec_standardize_roundtrip():
    x = jnp.asarray([[-100.0, 0.0, 38.22]])
    np.testing.assert_allclose(
        np.asarray(melspec_inv_standardize(melspec_standardize(x))),
        np.asarray(x), atol=1e-4)
    s = melspec_standardize(x)
    assert float(s[0, 0]) == pytest.approx(-1.0)
    assert float(s[0, 2]) == pytest.approx(1.0, abs=1e-5)


def test_spec_ddpm_purifier():
    gd = _gd()
    pur = SpecDDPMPurifier(ZERO_MODEL, gd, reverse_timestep=5)
    spec = jnp.full((2, 1, 8, 8), -30.0)  # mid-range dB
    out = pur(spec, jax.random.PRNGKey(0))
    assert out.shape == spec.shape
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert (o >= -100.0 - 1e-3).all() and (o <= 38.23).all()
