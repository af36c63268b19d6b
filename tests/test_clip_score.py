"""CLIP-score harness contract tests (tiny towers, CPU, random weights)."""
import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.eval import CLIPScoreConfig, clip_score_fn
from minddiffusion_tpu.eval.clip_score import preprocess_uint8


def test_preprocess_uint8_range_and_shape():
    img = jnp.full((2, 64, 48, 3), 255, jnp.uint8)
    out = preprocess_uint8(img, size=32)
    assert out.shape == (2, 32, 32, 3)
    # white image -> (1 - mean) / std exactly
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]),
        (1.0 - np.array([0.48145466, 0.4578275, 0.40821073]))
        / np.array([0.26862954, 0.26130258, 0.27577711]),
        rtol=1e-5)


def test_clip_score_shapes_and_selfconsistency():
    cfg = CLIPScoreConfig.tiny()
    scorer, fn = clip_score_fn(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.randint(rng, (3, 32, 32, 3), 0, 256, jnp.uint8)
    toks = jnp.stack([
        jnp.concatenate([jnp.array([1, 5, 9, 127]), jnp.zeros(12, jnp.int32)]),
        jnp.concatenate([jnp.array([1, 42, 127]), jnp.zeros(13, jnp.int32)]),
        jnp.concatenate([jnp.array([1, 77, 88, 99, 127]), jnp.zeros(11, jnp.int32)]),
    ])
    params = scorer.init(jax.random.PRNGKey(1),
                         preprocess_uint8(imgs, 32), toks)
    scores = jax.jit(fn)(params, imgs, toks)
    assert scores.shape == (3,)
    assert np.isfinite(np.asarray(scores)).all()
    # cosine * 100 bound
    assert (np.abs(np.asarray(scores)) <= 100.0 + 1e-3).all()
    # deterministic
    scores2 = jax.jit(fn)(params, imgs, toks)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores2))


def test_clip_score_prefers_matching_pairs_after_tuning():
    """Embeddings are random, but a pair scored against itself must equal the
    diagonal of the full cross matrix — checks the pairing plumbing."""
    cfg = CLIPScoreConfig.tiny()
    scorer, fn = clip_score_fn(cfg)
    imgs = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32, 3), 0, 256,
                              jnp.uint8)
    toks = jnp.stack([
        jnp.concatenate([jnp.array([3, 127]), jnp.zeros(14, jnp.int32)]),
        jnp.concatenate([jnp.array([4, 100, 127]), jnp.zeros(13, jnp.int32)]),
    ])
    params = scorer.init(jax.random.PRNGKey(3),
                         preprocess_uint8(imgs, 32), toks)
    pre = preprocess_uint8(imgs, 32)
    ie = scorer.apply(params, pre, method="encode_image")
    te = scorer.apply(params, toks, method="encode_text")
    full = 100.0 * ie @ te.T
    direct = fn(params, imgs, toks)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(np.diag(full)),
                               rtol=1e-4, atol=1e-4)
    # unit-norm embeddings
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ie), axis=-1), 1.0,
                               rtol=1e-5)
