"""CLIP-FID: Fréchet algebra against analytic cases + on-device features."""
import jax
import numpy as np
import pytest

from minddiffusion_tpu.eval import fid


def test_identical_sets_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(512, 16)
    assert abs(fid.clip_fid(f, f)) < 1e-6


def test_mean_shift_analytic():
    # equal covariances: d^2 reduces to |mu1 - mu2|^2
    rng = np.random.RandomState(1)
    base = rng.randn(200_0, 8)
    shift = np.zeros(8)
    shift[0] = 3.0
    d = fid.frechet_distance(*fid.gaussian_stats(base),
                             *fid.gaussian_stats(base + shift))
    np.testing.assert_allclose(d, 9.0, atol=1e-6)


def test_isotropic_scale_analytic():
    # N(0, I) vs N(0, s^2 I) in D dims: d^2 = D (1 - s)^2
    D, s = 6, 2.0
    mu = np.zeros(D)
    d = fid.frechet_distance(mu, np.eye(D), mu, (s ** 2) * np.eye(D))
    np.testing.assert_allclose(d, D * (1 - s) ** 2, atol=1e-9)


def test_noncommuting_covariances_hand_value():
    # C1 = diag(2, 1), C2 = diag(1, 2): tr(C1+C2) = 6 and
    # sqrtm(C1 C2) = sqrt(2) I, so d^2 = 6 - 4*sqrt(2) exactly
    mu = np.zeros(2)
    d = fid.frechet_distance(mu, np.diag([2.0, 1.0]), mu, np.diag([1.0, 2.0]))
    np.testing.assert_allclose(d, 6.0 - 4.0 * np.sqrt(2.0), atol=1e-9)


def test_rotation_invariance():
    # Fréchet distance is invariant under a shared orthogonal transform
    rng = np.random.RandomState(9)
    a, b = rng.randn(400, 5), rng.randn(400, 5) * 1.3 + 0.2
    q, _ = np.linalg.qr(rng.randn(5, 5))
    np.testing.assert_allclose(fid.clip_fid(a @ q, b @ q), fid.clip_fid(a, b),
                               rtol=1e-8)


def test_exact_stats_two_point_sets():
    # {m+d, m-d} has mean m and (ddof=1) covariance 2 d d^T exactly; with
    # 1-D features d^2 = (m1-m2)^2 + (s1-s2)^2 by hand
    s1 = np.array([[1.0], [3.0]])     # mean 2, var 2
    s2 = np.array([[4.0], [8.0]])     # mean 6, var 8
    expected = (6.0 - 2.0) ** 2 + (np.sqrt(8.0) - np.sqrt(2.0)) ** 2
    np.testing.assert_allclose(fid.clip_fid(s1, s2), expected, atol=1e-9)


def test_symmetry_and_nonneg():
    rng = np.random.RandomState(2)
    a, b = rng.randn(300, 12), rng.randn(300, 12) * 1.5 + 0.3
    d_ab, d_ba = fid.clip_fid(a, b), fid.clip_fid(b, a)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-8)
    assert d_ab > 0


def test_rejects_degenerate_input():
    with pytest.raises(ValueError):
        fid.gaussian_stats(np.zeros((1, 4)))


def test_device_feature_extraction_tiny():
    from minddiffusion_tpu.eval.clip_score import CLIPScoreConfig, CLIPScorer

    cfg = CLIPScoreConfig.tiny()
    scorer = CLIPScorer(cfg)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    from minddiffusion_tpu.eval.clip_score import preprocess_uint8

    params = scorer.init(jax.random.PRNGKey(0),
                         preprocess_uint8(imgs, cfg.vision.image_size),
                         np.ones((4, 8), np.int32))
    feats_fn = fid.image_features_fn(cfg)
    f = np.asarray(feats_fn(params, imgs))
    assert f.shape[0] == 4 and np.isfinite(f).all()
    np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, rtol=1e-5)
    # enough rows for stats: tile with small noise-free duplication
    many = np.concatenate([f] * 4, axis=0)
    assert abs(fid.clip_fid(many, many)) < 1e-6
