"""GLIDE tokenizer adapters: sentencepiece (zh) and GPT-2 BPE (en), plus the
padded-tokens-and-mask / CFG-doubling helpers.

Reference behavior (Taichu-GLIDE/model/glide_text2im/tokenizer/):
  * zh: sentencepiece model `cog-pretrain.model`, n_vocab = sp_size + 1, the
    extra id being the end/pad token (chinese_tokenizer.py:100-116).
  * padded_tokens_and_mask: truncate to ctx, pad with end_token, mask True on
    real tokens (chinese_tokenizer.py:110-116).
  * en: GPT-2-style BPE over an encoder.json + merges file (bpe.py:63-157).
  * CFG token prep: [cond]*B + [uncond]*B batches (caption_to_tokens.py:20-41)
    — in this framework the uncond half is drawn on-device inside the
    cascade pipeline, so only cond prep is needed host-side.

The sentencepiece *library* is optional (not in the base image): when absent,
the wrapper transparently falls back to the vendored from-scratch runtime in
`sentencepiece_mini.py` (hand-rolled ModelProto parser + unigram Viterbi /
BPE merges), so the Chinese GLIDE path tokenizes out of the box. The en BPE
reuses the from-scratch byte-level BPE in bpe_clip.py machinery with GPT-2
assets.
"""
from __future__ import annotations

import json
from typing import List, Optional, Tuple

import numpy as np


class GlideSentencePieceTokenizer:
    """Chinese GLIDE tokenizer over a sentencepiece model file."""

    def __init__(self, model_path: str):
        try:
            import sentencepiece as spm

            self.sp = spm.SentencePieceProcessor()
            self.sp.Load(model_path)
        except ImportError:  # vendored fallback (see module docstring)
            from minddiffusion_tpu.text.sentencepiece_mini import (
                SentencePieceProcessor,
            )

            self.sp = SentencePieceProcessor(model_path)

    @property
    def n_vocab(self) -> int:
        return self.sp.GetPieceSize() + 1  # +1: end/pad token

    @property
    def end_token(self) -> int:
        return self.n_vocab - 1

    def encode(self, text: str) -> List[int]:
        return list(self.sp.EncodeAsIds(text))

    def decode(self, ids) -> str:
        return self.sp.DecodeIds([int(i) for i in ids if int(i) != self.end_token])


def padded_tokens_and_mask(tokens: List[int], text_ctx: int, end_token: int
                           ) -> Tuple[List[int], List[int]]:
    """Truncate/pad with end_token; mask 1 on real tokens (reference :110-116)."""
    tokens = list(tokens[:text_ctx])
    pad = text_ctx - len(tokens)
    return tokens + [end_token] * pad, [1] * len(tokens) + [0] * pad


def prepare_cond_tokens(tokenizer, prompt: str, batch: int, text_ctx: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side cond token prep for the cascade (caption_to_tokens.py:30-41)."""
    toks, mask = padded_tokens_and_mask(
        tokenizer.encode(prompt), text_ctx, tokenizer.end_token
    )
    return (
        np.tile(np.asarray(toks, np.int32), (batch, 1)),
        np.tile(np.asarray(mask, np.int32), (batch, 1)),
    )
