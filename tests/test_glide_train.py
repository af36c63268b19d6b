"""GLIDE training-path tests: VLB loss pieces, samplers, EMA, dataset."""
import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.core.schedules import DiffusionSchedule, make_beta_schedule, respace_schedule, space_timesteps
from minddiffusion_tpu.train import glide_loss as gl
from minddiffusion_tpu.train.ema import init_ema, update_ema
from minddiffusion_tpu.train.resample import LossSecondMomentResampler, UniformSampler


def test_normal_kl_zero_for_identical():
    m = jnp.array([0.3]); lv = jnp.array([-1.2])
    np.testing.assert_allclose(np.asarray(gl.normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)
    # KL > 0 for different distributions
    assert float(gl.normal_kl(m, lv, m + 1.0, lv)[0]) > 0


def test_discretized_ll_peaks_at_mean():
    x = jnp.array([0.0]); 
    ll_at_mean = gl.discretized_gaussian_log_likelihood(x, jnp.array([0.0]), jnp.array([-4.0]))
    ll_off = gl.discretized_gaussian_log_likelihood(x, jnp.array([0.5]), jnp.array([-4.0]))
    assert float(ll_at_mean[0]) > float(ll_off[0])


def test_glide_loss_runs_and_weights_scale():
    betas = make_beta_schedule("squaredcos_cap_v2", 100)
    sched = respace_schedule(betas, set(range(100)))
    B = 4
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 3)) * 0.1

    def model_fn(x_t, t, tokens, mask):
        return jnp.zeros_like(x_t), -jnp.ones_like(x_t)

    toks = jnp.ones((B, 8), jnp.int32); mask = jnp.ones((B, 8), jnp.int32)
    t = jnp.array([0, 10, 50, 99])
    w = jnp.ones((B,))
    loss, metrics = gl.glide_diffusion_loss(model_fn, sched, x0, toks, mask, t, w,
                                            jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(metrics["mse"]) > 0 and float(metrics["vlb"]) > 0
    # doubling the weights doubles the loss
    loss2, _ = gl.glide_diffusion_loss(model_fn, sched, x0, toks, mask, t, 2 * w,
                                       jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss2), 2 * float(loss), rtol=1e-5)


def test_uniform_sampler_bounds():
    s = UniformSampler(1000)
    t, w = s.sample(jax.random.PRNGKey(0), 512)
    assert int(t.min()) >= 0 and int(t.max()) < 1000
    assert (np.asarray(w) == 1).all()


def test_loss_aware_resampler_prefers_high_loss():
    s = LossSecondMomentResampler(10, history_per_term=2)
    rng = np.random.RandomState(0)
    # warm up: timestep 3 has 10x the loss of others
    for _ in range(2):
        ts = np.arange(10)
        losses = np.where(ts == 3, 10.0, 1.0)
        s.update(ts, losses)
    w = s.weights_np()
    assert w[3] == w.max()
    t, iw = s.sample_np(rng, 1000)
    # importance weights are inverse-probability normalized
    assert np.isfinite(iw).all() and (iw > 0).all()
    assert (t == 3).mean() > 0.3


def test_ema_moves_toward_params():
    p = {"w": jnp.zeros((3,))}
    e = init_ema(p)
    new_p = {"w": jnp.ones((3,))}
    e = update_ema(e, new_p, decay=0.9)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.1, rtol=1e-6)


def test_glide_dataset_stream(tmp_path):
    import numpy as np
    from PIL import Image
    from minddiffusion_tpu.data.glide_dataset import GlideTextImageDataset, read_manifests

    d = tmp_path
    rng = np.random.RandomState(0)
    rows = []
    for i in range(8):
        name = f"g{i}.png"
        Image.fromarray(rng.randint(0, 255, (80, 80, 3), np.uint8)).save(d / name)
        rows.append(f"{name}\tcaption {i}")
    (d / "m.tsv").write_text("\n".join(rows) + "\n")
    (d / "manifests.txt").write_text(str(d / "m.tsv") + "\n")
    pairs = read_manifests(str(d / "manifests.txt"))
    assert len(pairs) == 8

    def encode_and_pad(text):
        n = len(text) % 5
        return np.full((8,), n, np.int32), np.ones((8,), np.int32)

    ds = GlideTextImageDataset(pairs, encode_and_pad, batch_size=4, image_size=32,
                               num_timesteps=100, text_drop_p=0.5, seed=0,
                               super_res_size=16)
    batch = next(ds.epoch(0))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["tokens"].shape == (4, 8)
    assert batch["t"].shape == (4,) and batch["t"].max() < 100
    assert batch["low_res"].shape == (4, 16, 16, 3)
