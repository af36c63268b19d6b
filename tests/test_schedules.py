import numpy as np
import jax.numpy as jnp

from minddiffusion_tpu.core import schedules as S


def test_sd_linear_betas_match_reference_formula():
    # stablediffusionv2 util.py:172-185: linspace(sqrt(start), sqrt(end))**2
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    ref = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
    np.testing.assert_allclose(betas, ref, rtol=0, atol=1e-12)
    assert betas[0] > 0 and betas[-1] < 1


def test_glide_linear_plain_scaling():
    betas = S.make_beta_schedule("linear_plain", 1000)
    np.testing.assert_allclose(betas[0], 1e-4)
    np.testing.assert_allclose(betas[-1], 2e-2)
    # T=500 doubles the endpoints (scale = 1000/T)
    betas500 = S.make_beta_schedule("linear_plain", 500)
    np.testing.assert_allclose(betas500[0], 2e-4)
    np.testing.assert_allclose(betas500[-1], 4e-2)


def test_squaredcos_cap():
    betas = S.make_beta_schedule("squaredcos_cap_v2", 1000)
    assert betas.shape == (1000,)
    assert betas.max() <= 0.999
    assert (betas > 0).all()
    # monotone increasing for the cosine schedule
    assert (np.diff(betas) > 0).all()


def test_schedule_tables_consistency():
    sched = S.DiffusionSchedule.create("linear", 1000, 0.00085, 0.0120)
    assert sched.num_timesteps == 1000
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2, ac, rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, rtol=1e-4, atol=1e-6
    )
    # posterior mean coefs sum: c1/sqrt(abar_prev)*... sanity: both positive
    assert (np.asarray(sched.posterior_mean_coef1) > 0).all()
    assert (np.asarray(sched.posterior_mean_coef2) >= 0).all()
    # lvlb weights finite, first equals second
    w = np.asarray(sched.lvlb_weights)
    assert np.isfinite(w).all()
    assert w[0] == w[1]


def test_q_sample_roundtrip():
    sched = S.DiffusionSchedule.create("linear", 1000, 0.00085, 0.0120)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    xt = sched.q_sample(x0, t, noise)
    # with zero noise, x_t = sqrt(abar_t) * x0
    np.testing.assert_allclose(
        np.asarray(xt)[0, 0, 0, 0], np.sqrt(np.asarray(sched.alphas_cumprod)[0]), rtol=1e-6
    )
    # predict_xstart inverts q_sample when eps is the true noise
    key_noise = jnp.full_like(x0, 0.37)
    xt2 = sched.q_sample(x0, t, key_noise)
    x0_rec = sched.predict_xstart_from_eps(xt2, t, key_noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_ddim_timesteps_uniform():
    ts = S.make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981
    assert np.all(np.diff(ts) == 20)


def test_ddim_sampling_parameters():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    ac = np.cumprod(1 - betas)
    ts = S.make_ddim_timesteps(50, 1000)
    sigmas, alphas, alphas_prev = S.ddim_sampling_parameters(ac, ts, eta=0.0)
    assert (sigmas == 0).all()
    np.testing.assert_allclose(alphas, ac[ts])
    np.testing.assert_allclose(alphas_prev[0], ac[0])
    np.testing.assert_allclose(alphas_prev[1:], ac[ts[:-1]])
    # eta>0 gives positive sigmas
    sigmas_eta, _, _ = S.ddim_sampling_parameters(ac, ts, eta=1.0)
    assert (sigmas_eta[1:] > 0).all()


def test_space_timesteps_ddim_and_fast27():
    # ddimN grammar
    s = S.space_timesteps(1000, "ddim50")
    assert s == set(range(0, 1000, 20))
    # fast27: 27 steps; the reference documents the exact output set
    # (gaussian_computation.py:162-163)
    f = S.space_timesteps(1000, "fast27")
    assert len(f) == 27
    expected = {0, 22, 44, 66, 88, 111, 133, 155, 177, 199, 200, 222, 244, 266,
                288, 311, 333, 355, 377, 399, 400, 500, 599, 600, 799, 800, 997}
    assert f == expected
    # "60" grammar used by GLIDE base sampling
    s60 = S.space_timesteps(1000, "60")
    assert len(s60) == 60


def test_respace_preserves_alpha_bar():
    betas = S.make_beta_schedule("squaredcos_cap_v2", 1000)
    base_ac = np.cumprod(1 - betas)
    use = S.space_timesteps(1000, "fast27")
    sched = S.respace_schedule(betas, use)
    assert sched.num_timesteps == 27
    tmap = np.asarray(sched.timestep_map)
    assert (np.diff(tmap) > 0).all()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), base_ac[tmap], rtol=1e-5)


def test_ddim_timesteps_quad():
    ts = S.make_ddim_timesteps(20, 1000, method="quad")
    assert ts.shape == (20,)
    assert ts[0] >= 1 and ts[-1] <= 1000
    assert (np.diff(ts) >= 0).all()
    # quadratic spacing: later gaps strictly larger than early gaps
    assert np.diff(ts)[-1] > np.diff(ts)[0]


def test_nondividing_ddim_steps_stay_in_range():
    # reference's arange overshoots for S that does not divide T; ours must not
    for s_count in (3, 7, 13, 37):
        ts = S.make_ddim_timesteps(s_count, 1000)
        assert ts.shape == (s_count,)
        assert ts.max() < 1000 and ts.min() >= 1


def test_ddim_timesteps_edge_ranges():
    """S == T and T/2 < S < T must emit S strictly in-range steps spanning
    the chain (the reference's stride formula crashes at S == T and silently
    compresses to t <= S otherwise); S out of [1, T] must raise."""
    import pytest

    from minddiffusion_tpu.core.schedules import make_ddim_timesteps

    for S in (1000, 600, 501):
        ts = make_ddim_timesteps(S, 1000)
        assert ts.shape == (S,)
        assert 0 <= ts.min() and ts.max() <= 999
        assert ts.max() > 900, "must span the full chain"
        assert (np.diff(ts) > 0).all()
    with pytest.raises(ValueError):
        make_ddim_timesteps(0, 1000)
    with pytest.raises(ValueError):
        make_ddim_timesteps(1001, 1000)


def test_posterior_log_variance_t0_matches_glide_reference():
    """Entry 0 is clipped to log(pv[1]) (GLIDE gaussian_diffusion.py
    convention), not log(1e-20) — the VLB loss reads this at t==0."""
    from minddiffusion_tpu.core.schedules import DiffusionSchedule

    s = DiffusionSchedule.create(schedule="linear", n_timestep=100)
    plv = np.asarray(s.posterior_log_variance_clipped)
    np.testing.assert_allclose(plv[0], plv[1])
    assert plv[0] > -30  # not the log(1e-20) floor
