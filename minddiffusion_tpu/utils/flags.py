"""Resolved-once runtime flag object — the single home for MDT_* env reads.

VERDICT r3 weak-4: shipping model code had 27 MDT_* env vars read at 62 sites,
including `os.environ.get` inside UNet/attention forward paths. This module
centralizes every surviving flag into one frozen snapshot: model code imports
`flags()` and reads attributes; no `os.environ` appears under `models/`.

The snapshot rebuilds only when the MDT_* environment actually changes (a
cheap tuple compare), so production traces see a constant object while tests
that monkeypatch env vars still observe their changes.

Surviving flags (shipped-default opt-outs + tuning knobs; every deleted flag's
lesson lives in ROADMAP.md "Tried and rejected". r5 retired MDT_GN_STATS,
MDT_SD_TAIL, MDT_GLIDE_TUNE=tail — kernels in benchmarks/research/{gn_stats,
glide_tail}.py — and MDT_ATTN_BQ, whose winning value is GLIDE's in-model
block_q=1024 default; other values measured worse, and callers can still
pass block_q programmatically):
  MDT_WINO=0           opt out of the Winograd conv kernel entirely
  MDT_WINO_TUNE=...    comma k=v conv-kernel tuning: hmax=<int>,cmin=<int>,
                       dma=0,chain=0 (winograd shape-gate ceiling/floor,
                       DMA-halo variant, merged resblock chaining)
  MDT_SPLIT_CONCAT=0   opt out of concat-free up-path resblocks
  MDT_MERGE_ALIGNED=0  opt out of the aligned-merge skip join (>=256-ch pairs)
  MDT_FUSED_UP=0       opt out of the subpixel fused upsample+conv
  MDT_CFG_DEDUP=0      opt out of CFG-prefix dedup in guided sampling
  MDT_HOIST            "1" (default): scan-invariant hoisting (wino U +
                       cross-attn K/V; GLIDE hoists K/V only — its wino-U
                       hoist measured negative, add "wino" to force);
                       "0": off; "force": capture even off-TPU (tests);
                       or explicit list e.g. "kv" / "kv,wino"
  MDT_GLIDE_TUNE=...   comma k=v GLIDE cascade tuning: s2d=<0/1> (space-to-
                       depth blocked SRGAN tail conv, default on),
                       skip_join=<concat/split/barrier> (up-path skip-join
                       strategy, default concat), attn_route=<int> (route
                       GLIDE attention sites with nq/nk >= this to the
                       Pallas kernel instead of the 1024/512 defaults —
                       r5 A/B surface for the 16² tiers)
  MDT_XLA_OPTS         extra XLA compiler options / "off" (utils/xla_opts.py)
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

_KEYS = (
    "MDT_WINO", "MDT_WINO_TUNE", "MDT_SPLIT_CONCAT", "MDT_MERGE_ALIGNED",
    "MDT_FUSED_UP", "MDT_CFG_DEDUP", "MDT_HOIST", "MDT_GLIDE_TUNE",
    "MDT_XLA_OPTS",
)


@dataclasses.dataclass(frozen=True)
class Flags:
    wino: bool = True
    wino_dma: bool = True
    wino_chain: bool = True
    wino_hmax: Optional[int] = None
    wino_cmin: Optional[int] = None
    split_concat: bool = True
    merge_aligned: bool = True
    fused_up: bool = True
    cfg_dedup: bool = True
    hoist: bool = True
    hoist_force: bool = False
    hoist_kv: bool = True
    # GLIDE-only wino-U hoist (measured negative there, default off;
    # SD pipelines hoist wino U whenever `hoist` is on)
    hoist_wino_glide: bool = False
    srgan_s2d: bool = True
    glide_skip_join: str = "concat"
    glide_attn_route: Optional[int] = None
    xla_opts: str = ""


def _parse_wino_tune(raw: str) -> dict:
    """'hmax=64,cmin=320,dma=0,chain=0' -> field overrides. Malformed entries
    raise a clear error naming the syntax (ADVICE r3: no IndexError deep in
    a model trace)."""
    out: dict = {}
    for part in raw.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(
                f"MDT_WINO_TUNE entry {part!r}: expected k=v with k in "
                "{hmax,cmin,dma,chain} (e.g. 'hmax=64,cmin=320,dma=0')")
        k, v = part.split("=", 1)
        k = k.strip()
        if k in ("hmax", "cmin"):
            out[f"wino_{k}"] = int(v)
        elif k == "dma":
            out["wino_dma"] = v.strip() != "0"
        elif k == "chain":
            out["wino_chain"] = v.strip() != "0"
        else:
            raise ValueError(
                f"MDT_WINO_TUNE key {k!r}: expected one of "
                "hmax/cmin/dma/chain")
    return out


def _parse_glide_tune(raw: str) -> dict:
    """'s2d=0,skip_join=barrier,tail=1' -> field overrides (same k=v grammar
    as MDT_WINO_TUNE; malformed entries raise a clear error)."""
    out: dict = {}
    for part in raw.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(
                f"MDT_GLIDE_TUNE entry {part!r}: expected k=v with k in "
                "{s2d,skip_join,attn_route} (e.g. 's2d=0,attn_route=256')")
        k, v = part.split("=", 1)
        k, v = k.strip(), v.strip()
        if k == "s2d":
            out["srgan_s2d"] = v != "0"
        elif k == "attn_route":
            out["glide_attn_route"] = int(v)
        elif k == "skip_join":
            if v not in ("concat", "split", "barrier"):
                raise ValueError(
                    f"MDT_GLIDE_TUNE skip_join={v!r}: expected "
                    "concat/split/barrier")
            out["glide_skip_join"] = v
        else:
            raise ValueError(
                f"MDT_GLIDE_TUNE key {k!r}: expected one of "
                "s2d/skip_join/attn_route")
    return out


def _build(env: dict) -> Flags:
    kw: dict = {}
    kw["wino"] = env.get("MDT_WINO", "1") != "0"
    kw.update(_parse_wino_tune(env.get("MDT_WINO_TUNE", "")))
    kw["split_concat"] = env.get("MDT_SPLIT_CONCAT", "1") != "0"
    kw["merge_aligned"] = env.get("MDT_MERGE_ALIGNED", "1") != "0"
    kw["fused_up"] = env.get("MDT_FUSED_UP", "1") != "0"
    kw["cfg_dedup"] = env.get("MDT_CFG_DEDUP", "1") != "0"
    hoist = env.get("MDT_HOIST", "1")
    kw["hoist"] = hoist != "0"
    kw["hoist_force"] = hoist == "force"
    if hoist not in ("0", "1", "force"):
        parts = {p.strip() for p in hoist.split(",")}
        kw["hoist_kv"] = "kv" in parts
        kw["hoist_wino_glide"] = "wino" in parts
    kw.update(_parse_glide_tune(env.get("MDT_GLIDE_TUNE", "")))
    kw["xla_opts"] = env.get("MDT_XLA_OPTS", "")
    return Flags(**kw)


_cache: Tuple[Optional[tuple], Optional[Flags]] = (None, None)


def flags() -> Flags:
    """The current flag snapshot (rebuilt only when MDT_* env changed)."""
    global _cache
    key = tuple(os.environ.get(k) for k in _KEYS)
    if _cache[0] != key:
        _cache = (key, _build({k: v for k, v in zip(_KEYS, key)
                               if v is not None}))
    return _cache[1]
