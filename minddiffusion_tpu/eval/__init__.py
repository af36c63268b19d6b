"""Quantitative evaluation: CLIP-score harness (the reference has no eval
subsystem at all — its regression story is golden demo PNGs)."""
from minddiffusion_tpu.eval.clip_score import (  # noqa: F401
    CLIPScoreConfig,
    CLIPScorer,
    clip_score_fn,
    preprocess_uint8,
)
from minddiffusion_tpu.eval.fid import (  # noqa: F401
    clip_fid,
    frechet_distance,
    gaussian_stats,
    image_features_fn,
)
