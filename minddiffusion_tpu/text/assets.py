"""Vocabulary asset resolution.

Tokenizer *logic* lives in this package; the vocabulary *data files* (CLIP BPE
merges, Chinese wordpiece vocab) are standard public assets that ship with SD
checkpoints. Resolution order: explicit path arg > MINDDIFFUSION_TPU_ASSETS
env dir > the mounted reference checkout (present in dev containers).
"""
from __future__ import annotations

import os
from pathlib import Path

_REFERENCE_CANDIDATES = {
    "bpe_simple_vocab_16e6.txt.gz": [
        "/root/reference/vision/stablediffusionv2/ldm/models/clip_zh/bpe_simple_vocab_16e6.txt.gz",
        "/root/reference/vision/wukong-huahua/ldm/models/clip_zh/bpe_simple_vocab_16e6.txt.gz",
    ],
    "vocab_zh.txt": [
        "/root/reference/vision/wukong-huahua/ldm/models/clip_zh/vocab_zh.txt",
    ],
}


def resolve_asset(name: str, explicit: str | None = None) -> str:
    if explicit:
        if not os.path.exists(explicit):
            raise FileNotFoundError(explicit)
        return explicit
    env_dir = os.environ.get("MINDDIFFUSION_TPU_ASSETS")
    if env_dir:
        p = Path(env_dir) / name
        if p.exists():
            return str(p)
    for cand in _REFERENCE_CANDIDATES.get(name, []):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"tokenizer asset {name!r} not found; pass an explicit path or set "
        f"MINDDIFFUSION_TPU_ASSETS to a directory containing it"
    )
