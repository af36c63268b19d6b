"""Convert public CLIP checkpoints (OpenCLIP or HuggingFace layout) into
`eval.clip_score.CLIPScorer` flax params.

Why: the eval harness (CLIP-score / CLIP-FID — BASELINE.md's parity metric)
needs BOTH CLIP towers with the joint-space projections, which diffusion
checkpoints do not carry (the reference loads only the text tower,
stablediffusionv2 txt2img.py:52-63). Real weights for SD2's pair are the
laion OpenCLIP ViT-H/14 release, distributed in two public layouts:

  OpenCLIP: visual.conv1.weight, visual.transformer.resblocks.{i}.attn.
            in_proj_weight/out_proj, visual.proj, token_embedding.weight,
            transformer.resblocks.{i}.*, ln_final, text_projection
  HF hub:   vision_model.embeddings.*, vision_model.encoder.layers.{i}.
            self_attn.{q,k,v}_proj, visual_projection.weight,
            text_model.encoder.layers.{i}.*, text_projection.weight

Both are handled; the layout is auto-detected. Layout transposes follow
io/sd_weights.py (torch linear (O,I) -> flax (I,O); torch conv OIHW ->
flax HWIO); HF's separate q/k/v projections are fused into our single qkv
kernel (column order q,k,v — the split order in models/clip.py:65).

Numerical parity of the converted towers against the public torch
implementation is locked by tests/test_clip_weights.py (random HF weights,
no network needed).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _t(x: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(x))


class _Taker:
    """Pull keys from a state dict, tracking hits so leftovers get reported."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used: set = set()
        self.missing: List[str] = []

    def __call__(self, name: str) -> np.ndarray:
        if name not in self.sd:
            self.missing.append(name)
            return None
        self.used.add(name)
        return np.asarray(self.sd[name], np.float32)


def _ln(take, base: str) -> Dict[str, np.ndarray]:
    # LayerNormFp32 wraps nn.LayerNorm in a compact module: one extra level
    return {"LayerNorm_0": {"scale": take(base + ".weight"),
                            "bias": take(base + ".bias")}}


def _dense_p(take, base: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t(take(base + ".weight")), "bias": take(base + ".bias")}


def _block_openclip(take, base: str) -> Dict[str, np.ndarray]:
    return {
        "ln_1": _ln(take, base + ".ln_1"),
        "ln_2": _ln(take, base + ".ln_2"),
        "attn": {
            "qkv": {"kernel": _t(take(base + ".attn.in_proj_weight")),
                    "bias": take(base + ".attn.in_proj_bias")},
            "out_proj": _dense_p(take, base + ".attn.out_proj"),
        },
        "mlp_fc": _dense_p(take, base + ".mlp.c_fc"),
        "mlp_proj": _dense_p(take, base + ".mlp.c_proj"),
    }


def _block_hf(take, base: str) -> Dict[str, np.ndarray]:
    q = take(base + ".self_attn.q_proj.weight")
    k = take(base + ".self_attn.k_proj.weight")
    v = take(base + ".self_attn.v_proj.weight")
    qb = take(base + ".self_attn.q_proj.bias")
    kb = take(base + ".self_attn.k_proj.bias")
    vb = take(base + ".self_attn.v_proj.bias")
    qkv = None
    if all(a is not None for a in (q, k, v, qb, kb, vb)):
        qkv = {"kernel": np.concatenate([_t(q), _t(k), _t(v)], axis=1),
               "bias": np.concatenate([qb, kb, vb])}
    return {
        "ln_1": _ln(take, base + ".layer_norm1"),
        "ln_2": _ln(take, base + ".layer_norm2"),
        "attn": {
            "qkv": qkv,
            "out_proj": _dense_p(take, base + ".self_attn.out_proj"),
        },
        "mlp_fc": _dense_p(take, base + ".mlp.fc1"),
        "mlp_proj": _dense_p(take, base + ".mlp.fc2"),
    }


def convert_clip_checkpoint(
    state_dict: Dict[str, np.ndarray],
    config,
    allow_partial: bool = False,
) -> Tuple[Dict, List[str]]:
    """state_dict (flat torch-layout numpy) + CLIPScoreConfig ->
    ({"params": {visual, text, text_projection}}, report).

    The report lists checkpoint keys that were neither used nor recognized
    buffers, plus any expected-but-missing keys (parity with the reference's
    param_not_load printout).

    A checkpoint missing expected keys raises with the full missing list
    unless `allow_partial=True` (ADVICE r3: None leaves silently embedded in
    the returned tree surface as opaque downstream failures otherwise)."""
    is_hf = any(k.startswith("vision_model.") or k.startswith("text_model.")
                for k in state_dict)
    take = _Taker(state_dict)

    visual: Dict = {}
    text: Dict = {}
    if is_hf:
        pe = take("vision_model.embeddings.patch_embedding.weight")
        visual["patch_embed"] = {
            "kernel": None if pe is None else np.transpose(pe, (2, 3, 1, 0))}
        visual["class_embedding"] = take("vision_model.embeddings.class_embedding")
        visual["positional_embedding"] = take(
            "vision_model.embeddings.position_embedding.weight")
        visual["ln_pre"] = _ln(take, "vision_model.pre_layrnorm")  # HF's typo
        for i in range(config.vision.layers):
            visual[f"resblock_{i}"] = _block_hf(
                take, f"vision_model.encoder.layers.{i}")
        visual["ln_post"] = _ln(take, "vision_model.post_layernorm")
        vp = take("visual_projection.weight")
        visual["proj"] = None if vp is None else _t(vp)

        text["token_embedding"] = take(
            "text_model.embeddings.token_embedding.weight")
        text["positional_embedding"] = take(
            "text_model.embeddings.position_embedding.weight")
        for i in range(config.text.layers):
            text[f"resblock_{i}"] = _block_hf(
                take, f"text_model.encoder.layers.{i}")
        text["ln_final"] = _ln(take, "text_model.final_layer_norm")
        tp = take("text_projection.weight")
        text_projection = None if tp is None else _t(tp)
        buffers = [k for k in state_dict if k.endswith("position_ids")
                   or k == "logit_scale"]
    else:
        pe = take("visual.conv1.weight")
        visual["patch_embed"] = {
            "kernel": None if pe is None else np.transpose(pe, (2, 3, 1, 0))}
        visual["class_embedding"] = take("visual.class_embedding")
        visual["positional_embedding"] = take("visual.positional_embedding")
        visual["ln_pre"] = _ln(take, "visual.ln_pre")
        for i in range(config.vision.layers):
            visual[f"resblock_{i}"] = _block_openclip(
                take, f"visual.transformer.resblocks.{i}")
        visual["ln_post"] = _ln(take, "visual.ln_post")
        visual["proj"] = take("visual.proj")  # stored as (W, embed): no transpose

        text["token_embedding"] = take("token_embedding.weight")
        text["positional_embedding"] = take("positional_embedding")
        for i in range(config.text.layers):
            text[f"resblock_{i}"] = _block_openclip(
                take, f"transformer.resblocks.{i}")
        text["ln_final"] = _ln(take, "ln_final")
        text_projection = take("text_projection")  # (W, embed): no transpose
        buffers = [k for k in state_dict if k in ("logit_scale",)
                   or k.startswith("attn_mask")]

    if take.missing and not allow_partial:
        raise KeyError(
            f"checkpoint is missing {len(take.missing)} expected CLIP keys "
            f"(pass allow_partial=True to get a tree with None leaves): "
            f"{take.missing[:8]}{'...' if len(take.missing) > 8 else ''}")
    report = [f"not loaded: {m}" for m in take.missing]
    for k in state_dict:
        if k not in take.used and k not in buffers:
            report.append(f"unused ckpt key: {k}")

    params = {"params": {"visual": visual, "text": text,
                         "text_projection": text_projection}}
    return params, report
