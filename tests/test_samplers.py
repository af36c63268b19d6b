"""Sampler correctness tests against an analytic oracle.

If the data distribution is a point mass at x_star, the exact noise-prediction
is eps(x_t, t) = (x_t - sqrt(abar_t) * x_star) / sqrt(1 - abar_t). Under this
oracle the deterministic samplers are *exact*: the trajectory stays on
x_t = sqrt(abar_t) x_star + sqrt(1 - abar_t) e0 with e0 fixed by x_T, so the
final latent is sqrt(abar_min) x_star + sqrt(1 - abar_min) e0 — which we
assert to fp32-accumulation tolerance (not a loose "close to x_star" check;
note the terminal chain index is t=1, abar[0]≈0.99915, so outputs keep a
~0.03·e0 noise floor by construction, exactly as the reference's samplers do).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.core.schedules import DiffusionSchedule, space_timesteps, respace_schedule, make_beta_schedule
from minddiffusion_tpu.core import cfg
from minddiffusion_tpu.samplers import ddim, plms, dpm_solver, ancestral

SHAPE = (2, 8, 8, 3)


def make_oracle(schedule, x_star):
    ac = schedule.alphas_cumprod

    def eps_fn(x, t):
        t_int = jnp.clip(jnp.round(t).astype(jnp.int32), 0, schedule.num_timesteps - 1)
        a = jnp.take(ac, t_int).reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * x_star) / jnp.sqrt(1.0 - a)

    return eps_fn


def ddim_exact_limit(schedule, num_steps, x_star, x_T):
    """Closed-form output of an exact eps-oracle DDIM/PLMS chain from x_T."""
    tables = ddim.build_tables(schedule, num_steps)
    a_start = float(tables["alpha"][0])      # abar at the first (noisiest) step
    a_final = float(tables["alpha_prev"][-1])  # abar[0]
    e0 = (x_T - np.sqrt(a_start) * x_star) / np.sqrt(1.0 - a_start)
    return np.sqrt(a_final) * np.asarray(x_star) + np.sqrt(1.0 - a_final) * np.asarray(e0)


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create("linear", 1000, 0.00085, 0.0120)


@pytest.fixture(scope="module")
def x_star():
    return jax.random.normal(jax.random.PRNGKey(7), SHAPE) * 0.5


@pytest.fixture(scope="module")
def x_T():
    return jax.random.normal(jax.random.PRNGKey(3), SHAPE)


def test_ddim_exact_under_oracle(sched, x_star, x_T):
    eps_fn = make_oracle(sched, x_star)
    out = jax.jit(lambda x: ddim.sample(eps_fn, x, sched, num_steps=50))(x_T)
    expected = ddim_exact_limit(sched, 50, x_star, x_T)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4, rtol=0)


def test_ddim_eta_stochastic(sched, x_star, x_T):
    eps_fn = make_oracle(sched, x_star)
    out = ddim.sample(eps_fn, x_T, sched, num_steps=50, eta=1.0, key=jax.random.PRNGKey(0))
    assert np.abs(np.asarray(out - x_star)).max() < 0.2


def test_ddim_img2img_partial_steps(sched, x_star, x_T):
    eps_fn = make_oracle(sched, x_star)
    # encode-at-strength: q_sample x_star to step index 25 of the 50-step chain
    t_enc = 25
    tables = ddim.build_tables(sched, 50)
    t_at = int(tables["t"][50 - t_enc])
    a_at = float(tables["alpha"][50 - t_enc])
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    x_mid = sched.q_sample(x_star, jnp.full((SHAPE[0],), t_at, dtype=jnp.int32), noise)
    out = ddim.sample(eps_fn, x_mid, sched, num_steps=50, t_start_index=t_enc)
    # e0 == noise exactly; a_final = abar[0]
    a_final = float(tables["alpha_prev"][-1])
    expected = np.sqrt(a_final) * np.asarray(x_star) + np.sqrt(1 - a_final) * np.asarray(noise)
    # the sub-chain's q_sample used table abar (fp32) — tolerance slightly wider
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)
    del a_at


def test_ddim_mask_blend_keeps_known_region(sched, x_star, x_T):
    eps_fn = make_oracle(sched, x_star)
    mask = jnp.zeros(SHAPE).at[:, :4].set(1.0)  # top half known
    known = jnp.ones(SHAPE) * 0.25
    out = ddim.sample(
        eps_fn, x_T, sched, num_steps=50, key=jax.random.PRNGKey(2), mask=mask, x0=known
    )
    # the oracle is elementwise, so the unknown region evolves exactly like
    # plain DDIM regardless of the blending in the known region
    expected = ddim_exact_limit(sched, 50, x_star, x_T)
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out) * (1 - m), expected * (1 - m), atol=5e-4, rtol=0
    )
    # known region: the last blend happens *before* the final DDIM update, so
    # the output there is a convex-ish mix pulled strongly toward `known`
    # (exactly as the reference's per-step blend behaves, plms.py:156-159) —
    # assert it moved from x_star toward known
    err_known = np.abs((np.asarray(out) - np.asarray(known)) * m).mean()
    dist_star = np.abs((np.asarray(x_star) - np.asarray(known)) * m).mean()
    assert err_known < 0.5 * dist_star


def test_plms_exact_under_oracle(sched, x_star, x_T):
    eps_fn = make_oracle(sched, x_star)
    out = jax.jit(lambda x: plms.sample(eps_fn, x, sched, num_steps=50))(x_T)
    # eps is constant along the oracle trajectory, so every Adams-Bashforth
    # combo reduces to e0 and PLMS is exact too
    expected = ddim_exact_limit(sched, 50, x_star, x_T)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4, rtol=0)


def test_plms_fewer_steps_still_converges(sched, x_star, x_T):
    eps_fn = make_oracle(sched, x_star)
    out = plms.sample(eps_fn, x_T, sched, num_steps=10)
    expected = ddim_exact_limit(sched, 10, x_star, x_T)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4, rtol=0)


def make_continuous_oracle(sched, x_star):
    """Oracle in the DPM-Solver continuous-time convention: model_t in
    [0, 999] floats; alpha/sigma via the same log-alpha interpolation the
    solver tables use (dpm_solver.build_tables). Needed because time_uniform
    nodes fall at non-integer model times."""
    N = sched.num_timesteps
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    t_disc = jnp.asarray(np.arange(1, N + 1) / N, jnp.float32)
    log_a_disc = jnp.asarray(0.5 * np.log(ac), jnp.float32)

    def eps_fn(x, t_model):
        t_cont = t_model.astype(jnp.float32) / 1000.0 + 1.0 / N
        log_a = jnp.interp(t_cont, t_disc, log_a_disc)
        a = jnp.exp(log_a).reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1.0 - jnp.exp(2.0 * log_a)).reshape(-1, 1, 1, 1)
        return (x - a * x_star) / s

    return eps_fn


def _dpm_expected(sched, steps, x_star, x_T, **kw):
    T = dpm_solver.build_tables(sched, steps, **kw)
    a0, s0 = float(T["node_alpha"][0]), float(T["node_sigma"][0])
    aN, sN = float(T["node_alpha"][-1]), float(T["node_sigma"][-1])
    e0 = (np.asarray(x_T) - a0 * np.asarray(x_star)) / s0
    return aN * np.asarray(x_star) + sN * e0


def test_dpm_solver_exact_under_oracle(sched, x_star, x_T):
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample(eps_fn, x, sched, steps=15))(x_T)
    # data-prediction x0 is exact at every node; the 2M update is then exact
    expected = _dpm_expected(sched, 15, x_star, x_T)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)


def test_dpm_solver_order1(sched, x_star, x_T):
    eps_fn = make_continuous_oracle(sched, x_star)
    out = dpm_solver.sample(eps_fn, x_T, sched, steps=15, order=1)
    expected = _dpm_expected(sched, 15, x_star, x_T, order=1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)


@pytest.mark.parametrize("order,steps", [(1, 12), (2, 12), (2, 13), (3, 12),
                                         (3, 13), (3, 14)])
def test_dpm_singlestep_exact_under_oracle(sched, x_star, x_T, order, steps):
    # under the exact continuous oracle every data prediction is exact, so
    # each singlestep group lands exactly on the trajectory; group/tail
    # bookkeeping (incl. the mixed-order tails of steps % order != 0) is
    # what's actually exercised here
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample_singlestep(
        eps_fn, x, sched, steps=steps, order=order))(x_T)
    expected = _dpm_expected(sched, steps, x_star, x_T, order=min(order, 3))
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)


@pytest.mark.parametrize("order", [2, 3])
def test_dpm_adaptive_under_oracle(sched, x_star, x_T, order):
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample_adaptive(
        eps_fn, x, sched, order=order))(x_T)
    expected = _dpm_expected(sched, 15, x_star, x_T)  # same endpoint marginals
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-3, rtol=0)


def test_dpm_solver_discrete_oracle_converges(sched, x_star, x_T):
    # with the *integer-timestep* oracle (as a real UNet trained on discrete t
    # behaves), the solver still converges to x_star up to the rounding error
    eps_fn = make_oracle(sched, x_star)
    out = dpm_solver.sample(eps_fn, x_T, sched, steps=15)
    assert np.abs(np.asarray(out - x_star)).max() < 0.15


def test_glide_ancestral_and_ddim_converge(x_star, x_T):
    betas = make_beta_schedule("squaredcos_cap_v2", 1000)
    spaced = respace_schedule(betas, space_timesteps(1000, "60"))
    ac_orig = np.cumprod(1 - betas)

    def model_fn(x, t_orig):
        a = jnp.asarray(ac_orig, dtype=jnp.float32)[t_orig].reshape(-1, 1, 1, 1)
        eps = (x - jnp.sqrt(a) * jnp.clip(x_star, -1, 1)) / jnp.sqrt(1.0 - a)
        v = -jnp.ones_like(x)  # frac=0 -> min (posterior) variance
        return eps, v

    out = ancestral.p_sample_loop(model_fn, x_T, spaced, key=jax.random.PRNGKey(0))
    assert np.abs(np.asarray(out - jnp.clip(x_star, -1, 1))).max() < 0.25

    fast = respace_schedule(betas, space_timesteps(1000, "fast27"))
    out2 = ancestral.ddim_sample_loop(model_fn, x_T, fast)
    # the GLIDE-style spaced DDIM chain ends at spaced t=0 where
    # alphas_cumprod_prev[0] == 1.0, so it converges to pred_x0 *exactly*
    # (unlike the SD DDIM table convention which stops at abar[0])
    x_c = np.clip(np.asarray(x_star), -1, 1)
    np.testing.assert_allclose(np.asarray(out2), x_c, atol=5e-3, rtol=0)


def test_cfg_fold_guide():
    u = jnp.zeros((2, 4))
    c = jnp.ones((2, 4))
    folded = cfg.fold(u, c)
    assert folded.shape == (4, 4)
    # guide with scale 2: u + 2*(c-u) = 2c - u
    eps = cfg.guide(folded, 2.0)
    np.testing.assert_allclose(np.asarray(eps), 2.0 * np.asarray(c) - np.asarray(u))

    def apply_fn(x, t, cond):
        return cond + 0.0 * x

    guided = cfg.wrap_model(apply_fn, folded, scale=1.0)
    out = guided(jnp.zeros((2, 4)), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(c))


def test_dpm_solver_order3(sched, x_star, x_T):
    eps_fn = make_continuous_oracle(sched, x_star)
    out = dpm_solver.sample(eps_fn, x_T, sched, steps=15, order=3)
    expected = _dpm_expected(sched, 15, x_star, x_T, order=3)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)
    # order ramp: first steps are gated to lower order
    T = dpm_solver.build_tables(sched, 15, order=3)
    assert T["o2"][0] == 0 and T["o3"][0] == 0 and T["o3"][1] == 0
    assert T["o3"][2] == 1


def test_ddim_accepts_typed_prng_key(sched, x_star, x_T):
    """New-style jax.random.key() (typed) must work alongside legacy
    PRNGKey arrays (the old (n,2,2) reshape broke typed keys)."""
    eps = make_oracle(sched, x_star)
    legacy = ddim.sample(eps, x_T, sched, num_steps=10,
                         key=jax.random.PRNGKey(3))
    typed = ddim.sample(eps, x_T, sched, num_steps=10, key=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(typed))


def test_run_sampler_guards():
    """t_start_index with a non-ddim sampler and mask with dpm_adaptive must
    raise, never silently run the wrong chain."""
    import pytest

    from minddiffusion_tpu.pipelines.stable_diffusion import _run_sampler

    with pytest.raises(ValueError, match="ddim"):
        _run_sampler("plms", None, None, None, 10, None, t_start_index=5)
    with pytest.raises(ValueError, match="mask"):
        _run_sampler("dpm_adaptive", None, None, None, 10, None,
                     mask=np.ones(1))


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpm_solver_noise_prediction_exact_under_oracle(sched, x_star, x_T,
                                                        order):
    """prediction='noise' (plain DPM-Solver, reference algorithm_type=
    'dpmsolver'): under the continuous oracle eps(x(t), t) is CONSTANT along
    the exact trajectory, so every order's update is exact and must land on
    the same analytic endpoint as the ++ family."""
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample(
        eps_fn, x, sched, steps=15, order=order, prediction="noise"))(x_T)
    expected = _dpm_expected(sched, 15, x_star, x_T, order=order)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)


@pytest.mark.parametrize("order,steps", [(2, 12), (3, 13)])
def test_dpm_singlestep_noise_prediction(sched, x_star, x_T, order, steps):
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample_singlestep(
        eps_fn, x, sched, steps=steps, order=order, prediction="noise"))(x_T)
    expected = _dpm_expected(sched, steps, x_star, x_T, order=min(order, 3))
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3, rtol=0)


@pytest.mark.parametrize("order", [2, 3])
def test_dpm_adaptive_noise_prediction(sched, x_star, x_T, order):
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample_adaptive(
        eps_fn, x, sched, order=order, prediction="noise"))(x_T)
    expected = _dpm_expected(sched, 15, x_star, x_T)
    # tolerance = the controller's own accept band (atol 0.0078): constant-
    # eps makes E~0, so the step size opens up and fp32 lambda<->t interp
    # error accumulates to just under the controller's atol
    np.testing.assert_allclose(np.asarray(out), expected, atol=8e-3, rtol=0)


def test_dpm_dynamic_thresholding_math():
    """_dynamic_threshold == the reference's quantile-clip-rescale."""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(3, 4, 4, 2) * 3.0, jnp.float32)
    out = np.asarray(dpm_solver._dynamic_threshold(x0, max_val=1.0))
    xf = np.asarray(x0).reshape(3, -1)
    s = np.maximum(np.quantile(np.abs(xf), 0.995, axis=1), 1.0)
    ref = np.clip(np.asarray(x0), -s[:, None, None, None],
                  s[:, None, None, None]) / s[:, None, None, None]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # values already inside [-max_val, max_val] pass through unchanged
    small = jnp.asarray(rng.randn(2, 8) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dpm_solver._dynamic_threshold(small, 1.0)),
        np.asarray(small), rtol=1e-5, atol=1e-6)


def test_dpm_thresholding_rejects_noise_mode(sched, x_star, x_T):
    eps_fn = make_continuous_oracle(sched, x_star)
    with pytest.raises(ValueError, match="data prediction"):
        dpm_solver.sample(eps_fn, x_T, sched, steps=5, prediction="noise",
                          thresholding=True)


def test_dpm_thresholding_sampling_runs(sched, x_star, x_T):
    """thresholding on, oracle in range: endpoint unchanged (s clamps to 1)."""
    eps_fn = make_continuous_oracle(sched, x_star)
    out = jax.jit(lambda x: dpm_solver.sample(
        eps_fn, x, sched, steps=15, thresholding=True))(x_T)
    assert np.isfinite(np.asarray(out)).all()
