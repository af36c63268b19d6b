"""Fréchet distance over CLIP image features (CLIP-FID).

Distributional complement to the pairwise CLIP-score harness: fit a Gaussian
to the feature clouds of a generated set and a reference set, report the
Fréchet distance. Classic FID uses InceptionV3 features; using the CLIP
image tower instead (Kynkäänniemi et al. 2022, "The Role of ImageNet Classes
in FID") avoids a second backbone and correlates better with human judgment
on text-to-image models. The reference repo has no eval subsystem at all
(SURVEY.md §0 — its only regression artifacts are golden demo PNGs).

Feature extraction runs on-device through `CLIPScorer.encode_image` (one
jitted program per batch); the Gaussian-fit + Fréchet algebra is small host
math in fp64 numpy, where it belongs.

    d² = |mu1 - mu2|² + tr(C1 + C2 - 2·sqrtm(C1 @ C2))

The cross-covariance sqrtm trace is computed eigenvalue-wise via the
symmetrized product C1^{1/2} C2 C1^{1/2} (same spectrum as C1 C2, but
symmetric PSD — no scipy.linalg.sqrtm, no complex drift).
"""
from __future__ import annotations

import numpy as np


def gaussian_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) feature rows -> (mean (D,), covariance (D, D)) in fp64."""
    f = np.asarray(features, np.float64)
    if f.ndim != 2 or f.shape[0] < 2:
        raise ValueError(f"need (N>=2, D) features, got {f.shape}")
    # np.cov collapses D=1 to a 0-d array; keep the (D, D) contract
    return f.mean(axis=0), np.atleast_2d(np.cov(f, rowvar=False))


def _psd_sqrt(mat: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals + eps)) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """Squared Fréchet distance between two Gaussians."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64)
    cov2 = np.asarray(cov2, np.float64)
    diff = float(((mu1 - mu2) ** 2).sum())
    s1 = _psd_sqrt(cov1)
    # eigvalsh of the symmetrized product: spectrum == spectrum(cov1 @ cov2)
    middle = s1 @ cov2 @ s1
    vals = np.clip(np.linalg.eigvalsh((middle + middle.T) / 2.0), 0.0, None)
    tr_sqrt = float(np.sqrt(vals).sum())
    return diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * tr_sqrt


def clip_fid(features_a: np.ndarray, features_b: np.ndarray) -> float:
    """FID between two (N, D) CLIP image-feature sets."""
    return frechet_distance(*gaussian_stats(features_a),
                            *gaussian_stats(features_b))


def image_features_fn(config):
    """Jitted (params, images_uint8) -> L2-normalized CLIP image features.

    `config` is a `CLIPScoreConfig`; batches stream through this and
    accumulate host-side before `clip_fid`.
    """
    import jax

    from minddiffusion_tpu.eval.clip_score import CLIPScorer, preprocess_uint8

    scorer = CLIPScorer(config)

    @jax.jit
    def fn(params, images_uint8):
        images = preprocess_uint8(images_uint8, config.vision.image_size)
        # encode_image output is already L2-normalized
        return scorer.apply(params, images, method=scorer.encode_image)

    return fn
