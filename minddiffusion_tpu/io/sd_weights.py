"""Convert standard Stable Diffusion (LDM/CompVis-layout) checkpoints to this
framework's flax param trees.

The reference loads MindSpore `.ckpt` files whose parameter names mirror the
original torch LDM layout (`model.diffusion_model.*`, `first_stage_model.*`,
`cond_stage_model.*` — see stablediffusionv2/run_train.py:147-162 key
filtering and txt2img.py:52-63 load-with-report). This module implements the
same name surface against torch/safetensors SD checkpoints, which use
identical names; plus the layout transposes:

  torch conv   (O, I, kh, kw) -> flax conv (kh, kw, I, O)
  torch linear (O, I)         -> flax dense (I, O)
  norm weight/bias            -> flax scale/bias
  CLIP in_proj_weight (3W, W) -> fused qkv kernel (W, 3W)

Unmatched keys are *reported*, not fatal (parity with the reference's
param_not_load printout, txt2img.py:58-59).
"""
from __future__ import annotations

import struct
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _t_conv(x):
    return np.transpose(x, (2, 3, 1, 0))


def _t_dense(x):
    return np.transpose(x)


def _ident(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# per-model key translators: our flax path (tuple of str) -> (ldm key, transform)
# ---------------------------------------------------------------------------

def _res_map(prefix: str, leaf_mod: str, leaf: str) -> Optional[Tuple[str, Callable]]:
    """Map a ResBlock sub-leaf to LDM in_layers/out_layers naming."""
    table = {
        ("norm_in", "GroupNorm_0"): "in_layers.0",
        ("conv_in", None): "in_layers.2",
        ("emb_proj", None): "emb_layers.1",
        ("norm_out", "GroupNorm_0"): "out_layers.0",
        ("conv_out", None): "out_layers.3",
        ("skip", None): "skip_connection",
    }
    return table.get((prefix, leaf_mod))


def _xform_for(leaf: str, ldm_name: str, is_conv: bool) -> Tuple[str, Callable]:
    if leaf == "kernel":
        return ldm_name + ".weight", _t_conv if is_conv else _t_dense
    if leaf == "scale":
        return ldm_name + ".weight", _ident
    return ldm_name + ".bias", _ident


def _spatial_transformer_key(parts: List[str], leaf: str, use_linear: bool
                             ) -> Optional[Tuple[str, Callable]]:
    """parts: path inside a SpatialTransformer module."""
    head, rest = parts[0], parts[1:]
    if head == "norm":
        return _xform_for(leaf, "norm", is_conv=False)
    if head in ("proj_in", "proj_out"):
        return _xform_for(leaf, head, is_conv=not use_linear)
    if head.startswith("block_"):
        d = head[len("block_"):]
        base = f"transformer_blocks.{d}"
        inner = rest[0]
        if inner in ("attn1", "attn2"):
            proj = rest[1]
            if proj == "to_out":
                return _xform_for(leaf, f"{base}.{inner}.to_out.0", is_conv=False)
            if proj in ("to_q", "to_k", "to_v"):
                return _xform_for(leaf, f"{base}.{inner}.{proj}", is_conv=False)
            # LoRA base dense inside CrossAttention
            if proj in ("base",):
                return None
        if inner in ("norm1", "norm2", "norm3"):
            return _xform_for(leaf, f"{base}.{inner}", is_conv=False)
        if inner == "ff":
            sub = rest[1]
            if sub == "geglu":
                return _xform_for(leaf, f"{base}.ff.net.0.proj", is_conv=False)
            if sub == "proj_out":
                return _xform_for(leaf, f"{base}.ff.net.2", is_conv=False)
    return None


def unet_translator(config) -> Callable[[Tuple[str, ...]], Optional[Tuple[str, Callable]]]:
    """Build our-path -> (ldm key under model.diffusion_model., transform)."""
    nrb = config.num_res_blocks
    mult = config.channel_mult
    attn_res = set(config.attention_resolutions)

    in_idx: Dict[Tuple, int] = {}
    in_attn: Dict[Tuple, bool] = {}
    n, ds = 1, 1
    for level in range(len(mult)):
        for i in range(nrb):
            in_idx[("res", level, i)] = n
            in_attn[(level, i)] = ds in attn_res
            n += 1
        if level != len(mult) - 1:
            in_idx[("ds", level)] = n
            n += 1
            ds *= 2

    out_idx: Dict[Tuple, int] = {}
    out_has_attn: Dict[Tuple, bool] = {}
    out_up_midx: Dict[int, int] = {}
    n = 0
    for level in reversed(range(len(mult))):
        for i in range(nrb + 1):
            out_idx[("res", level, i)] = n
            has_attn = ds in attn_res
            out_has_attn[(level, i)] = has_attn
            if level and i == nrb:
                out_up_midx[level] = 2 if has_attn else 1
            n += 1
        if level:
            ds //= 2

    use_linear = config.use_linear_in_transformer

    def translate(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
        parts = list(path)
        leaf = parts.pop()
        if leaf in ("lora_a", "lora_b"):
            return None  # adapters have no LDM counterpart (init from zero)
        head = parts.pop(0) if parts else leaf

        if head == "in_conv":
            return _xform_for(leaf, "input_blocks.0.0", is_conv=True)
        if head == "time_embed_0":
            return _xform_for(leaf, "time_embed.0", is_conv=False)
        if head == "time_embed_2":
            return _xform_for(leaf, "time_embed.2", is_conv=False)
        if head == "out_norm":
            return _xform_for(leaf, "out.0", is_conv=False)
        if head == "out_conv":
            return _xform_for(leaf, "out.2", is_conv=True)

        def res_leaf(base: str) -> Optional[Tuple[str, Callable]]:
            sub = parts[0]
            sub2 = parts[1] if len(parts) > 1 else None
            m = _res_map(sub, sub2 if sub2 == "GroupNorm_0" else None, leaf)
            if m is None:
                return None
            is_conv = "conv" in sub or sub == "skip"
            # skip_connection is a 1x1 conv in LDM; ours is conv1x1 too
            return _xform_for(leaf, f"{base}.{m}", is_conv=is_conv)

        if head.startswith("down_"):
            bits = head.split("_")
            if bits[-1] == "ds":
                level = int(bits[1])
                nn_ = in_idx[("ds", level)]
                return _xform_for(leaf, f"input_blocks.{nn_}.0.op", is_conv=True)
            level, i, kind = int(bits[1]), int(bits[2]), bits[3]
            nn_ = in_idx[("res", level, i)]
            if kind == "res":
                return res_leaf(f"input_blocks.{nn_}.0")
            if kind == "attn":
                r = _spatial_transformer_key(parts, leaf, use_linear)
                if r is None:
                    return None
                name, xf = r
                return f"input_blocks.{nn_}.1.{name}", xf

        if head in ("mid_res1", "mid_attn", "mid_res2"):
            slot = {"mid_res1": 0, "mid_attn": 1, "mid_res2": 2}[head]
            if head == "mid_attn":
                r = _spatial_transformer_key(parts, leaf, use_linear)
                if r is None:
                    return None
                name, xf = r
                return f"middle_block.{slot}.{name}", xf
            return res_leaf(f"middle_block.{slot}")

        if head.startswith("up_"):
            bits = head.split("_")
            if bits[-1] == "us":
                level = int(bits[1])
                nn_ = out_idx[("res", level, nrb)]
                midx = out_up_midx[level]
                return _xform_for(leaf, f"output_blocks.{nn_}.{midx}.conv", is_conv=True)
            level, i, kind = int(bits[1]), int(bits[2]), bits[3]
            nn_ = out_idx[("res", level, i)]
            if kind == "res":
                return res_leaf(f"output_blocks.{nn_}.0")
            if kind == "attn":
                r = _spatial_transformer_key(parts, leaf, use_linear)
                if r is None:
                    return None
                name, xf = r
                return f"output_blocks.{nn_}.1.{name}", xf
        return None

    return translate


def vae_translator() -> Callable[[Tuple[str, ...]], Optional[Tuple[str, Callable]]]:
    def block_leaf(base: str, parts: List[str], leaf: str):
        sub = parts[0]
        names = {"norm1": ("norm1", False), "conv1": ("conv1", True),
                 "norm2": ("norm2", False), "conv2": ("conv2", True),
                 "nin_shortcut": ("nin_shortcut", True)}
        if sub in names:
            nm, is_conv = names[sub]
            return _xform_for(leaf, f"{base}.{nm}", is_conv=is_conv)
        return None

    def attn_leaf(base: str, parts: List[str], leaf: str):
        sub = parts[0]
        if sub == "norm":
            return _xform_for(leaf, f"{base}.norm", is_conv=False)
        if sub in ("q", "k", "v", "proj_out"):
            return _xform_for(leaf, f"{base}.{sub}", is_conv=True)
        return None

    def translate(path: Tuple[str, ...]):
        parts = list(path)
        leaf = parts.pop()
        top = parts.pop(0)
        if top == "quant_conv":
            return _xform_for(leaf, "quant_conv", is_conv=True)
        if top == "post_quant_conv":
            return _xform_for(leaf, "post_quant_conv", is_conv=True)
        if top not in ("encoder", "decoder"):
            return None
        base = top
        head = parts.pop(0)
        if head == "conv_in":
            return _xform_for(leaf, f"{base}.conv_in", is_conv=True)
        if head == "conv_out":
            return _xform_for(leaf, f"{base}.conv_out", is_conv=True)
        if head == "norm_out":
            return _xform_for(leaf, f"{base}.norm_out", is_conv=False)
        if head in ("mid_block_1", "mid_block_2"):
            slot = "block_1" if head.endswith("_1") else "block_2"
            return block_leaf(f"{base}.mid.{slot}", parts, leaf)
        if head == "mid_attn":
            return attn_leaf(f"{base}.mid.attn_1", parts, leaf)
        bits = head.split("_")
        if bits[0] == "down" and bits[2] == "block":
            return block_leaf(f"{base}.down.{bits[1]}.block.{bits[3]}", parts, leaf)
        if bits[0] == "down" and bits[2] == "downsample":
            return _xform_for(leaf, f"{base}.down.{bits[1]}.downsample.conv", is_conv=True)
        if bits[0] == "up" and bits[2] == "block":
            return block_leaf(f"{base}.up.{bits[1]}.block.{bits[3]}", parts, leaf)
        if bits[0] == "up" and bits[2] == "upsample":
            return _xform_for(leaf, f"{base}.up.{bits[1]}.upsample.conv", is_conv=True)
        return None

    return translate


def clip_translator() -> Callable[[Tuple[str, ...]], Optional[Tuple[str, Callable]]]:
    """OpenCLIP text-tower naming (SD2 cond_stage_model.model.*)."""

    def translate(path: Tuple[str, ...]):
        parts = list(path)
        leaf = parts.pop()
        head = parts.pop(0) if parts else leaf
        if head == "token_embedding" or leaf == "token_embedding":
            return "token_embedding.weight", _ident
        if head == "positional_embedding" or leaf == "positional_embedding":
            return "positional_embedding", _ident
        if head == "ln_final":
            return _xform_for(leaf, "ln_final", is_conv=False)
        if head.startswith("resblock_"):
            i = head[len("resblock_"):]
            base = f"transformer.resblocks.{i}"
            sub = parts.pop(0)
            if sub == "attn":
                proj = parts.pop(0)
                if proj == "qkv":
                    if leaf == "kernel":
                        return f"{base}.attn.in_proj_weight", _t_dense
                    return f"{base}.attn.in_proj_bias", _ident
                if proj == "out_proj":
                    return _xform_for(leaf, f"{base}.attn.out_proj", is_conv=False)
            if sub in ("ln_1", "ln_2"):
                return _xform_for(leaf, f"{base}.{sub}", is_conv=False)
            if sub == "mlp_fc":
                return _xform_for(leaf, f"{base}.mlp.c_fc", is_conv=False)
            if sub == "mlp_proj":
                return _xform_for(leaf, f"{base}.mlp.c_proj", is_conv=False)
        return None

    return translate


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

_PREFIXES = {
    "unet": "model.diffusion_model.",
    "vae": "first_stage_model.",
    # both SD2 ("model.") and SD1 naming are probed for the text tower
    "text": ("cond_stage_model.model.", "cond_stage_model.transformer.",
             "cond_stage_model."),
}


def _flatten_our_tree(tree) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = tuple(str(getattr(p, "key", p)) for p in path)
        # drop the top-level 'params' collection name
        if key and key[0] == "params":
            key = key[1:]
        flat[key] = leaf
    return flat


def convert_sd_checkpoint(
    state_dict: Dict[str, np.ndarray],
    abstract_params: Dict[str, Any],
    unet_config,
    strict: bool = False,
) -> Tuple[Dict[str, Any], List[str]]:
    """Build {unet, vae, text} flax params from an LDM-layout state dict.

    state_dict: flat name -> numpy array (torch tensors: call .numpy() first,
    or use load_torch_checkpoint / load_safetensors below).
    abstract_params: shape/dtype skeleton from `jax.eval_shape` of init (or
    real init params — only shapes are read).
    Returns (params, report) where report lists unmatched names.
    """
    translators = {
        "unet": unet_translator(unet_config),
        "vae": vae_translator(),
        "text": clip_translator(),
    }
    report: List[str] = []
    used: set = set()
    out: Dict[str, Any] = {}

    for model_kind, abstract in abstract_params.items():
        translate = translators[model_kind]
        prefixes = _PREFIXES[model_kind]
        if isinstance(prefixes, str):
            prefixes = (prefixes,)
        flat = _flatten_our_tree(abstract)
        new_flat: Dict[Tuple[str, ...], Any] = {}
        for path, leaf in flat.items():
            r = translate(path)
            src = None
            if r is not None:
                name, xform = r
                for pref in prefixes:
                    if pref + name in state_dict:
                        src = xform(state_dict[pref + name])
                        used.add(pref + name)
                        break
            if src is None:
                report.append(f"not loaded: {model_kind}/{'/'.join(path)}")
                src = np.zeros(leaf.shape, dtype=np.float32) if hasattr(leaf, "shape") else leaf
            else:
                if tuple(src.shape) != tuple(leaf.shape):
                    msg = (f"shape mismatch {model_kind}/{'/'.join(path)}: "
                           f"ckpt {src.shape} vs model {leaf.shape}")
                    if strict:
                        raise ValueError(msg)
                    report.append(msg)
                    src = np.zeros(leaf.shape, dtype=np.float32)
            new_flat[path] = jnp.asarray(src, dtype=jnp.float32)
        out[model_kind] = _unflatten(new_flat)

    for name in state_dict:
        if name not in used and any(
            name.startswith(p) for ps in _PREFIXES.values()
            for p in ((ps,) if isinstance(ps, str) else ps)
        ):
            report.append(f"unused ckpt key: {name}")
    if strict and any(r.startswith("not loaded") for r in report):
        raise ValueError("\n".join(report))
    return out, report


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = tree.setdefault("params", {})
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = leaf
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pt (CPU) into a flat numpy dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """From-scratch safetensors reader (mirror of save_safetensors below):
    8-byte little-endian header length, JSON header of
    {name: {dtype, shape, data_offsets}}, concatenated row-major tensor
    bytes. No safetensors-package dependency; float tensors are returned as
    fp32 (bf16 decodes via ml_dtypes, which jax already ships)."""
    import json

    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        data = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        a, b = spec["data_offsets"]
        dt = _SAFETENSORS_TO_NUMPY[spec["dtype"]]
        arr = np.frombuffer(data[a:b], dtype=dt).reshape(spec["shape"])
        if np.issubdtype(np.dtype(dt) if not isinstance(dt, np.dtype) else dt,
                         np.floating) or spec["dtype"] == "BF16":
            arr = arr.astype(np.float32)
        out[name] = arr
    return out


# ---------------------------------------------------------------------------
# export: flax params -> LDM-layout state dict / .safetensors
# ---------------------------------------------------------------------------

def _invert(xform: Callable, x: np.ndarray) -> np.ndarray:
    if xform is _t_conv:           # flax HWIO -> torch OIHW
        return np.transpose(x, (3, 2, 0, 1))
    if xform is _t_dense:
        return np.transpose(x)
    return np.asarray(x)


def export_sd_checkpoint(
    params: Dict[str, Any],
    unet_config,
    text_prefix: str = "cond_stage_model.model.",
    dtype=np.float32,
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Inverse of convert_sd_checkpoint: {unet, vae, text} flax params ->
    a flat LDM-layout state dict (torch OIHW convs / (out,in) denses), so
    weights trained or LoRA-merged here can flow back to reference-ecosystem
    tools. Returns (state_dict, report) — report lists any unmapped leaves
    (e.g. LoRA adapter params, which have no LDM names; merge them first via
    io.checkpoints.merge_params)."""
    translators = {
        "unet": unet_translator(unet_config),
        "vae": vae_translator(),
        "text": clip_translator(),
    }
    out: Dict[str, np.ndarray] = {}
    report: List[str] = []
    for model_kind, translate in translators.items():
        if model_kind not in params:
            continue
        pref = _PREFIXES[model_kind]
        if not isinstance(pref, str):
            pref = text_prefix
        for path, leaf in _flatten_our_tree(params[model_kind]).items():
            r = translate(path)
            if r is None:
                report.append(f"not exported: {model_kind}/{'/'.join(path)}")
                continue
            name, xform = r
            out[pref + name] = _invert(xform, np.asarray(leaf, dtype))
    return out, report


_SAFETENSORS_DTYPES = {
    np.dtype(np.float64): "F64",
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}


def _np_bf16():
    import ml_dtypes  # shipped with jax

    return np.dtype(ml_dtypes.bfloat16)


class _LazyDtypeMap(dict):
    # BF16 resolves lazily so importing this module never requires ml_dtypes
    def __missing__(self, key):
        if key == "BF16":
            self[key] = _np_bf16()
            return self[key]
        raise KeyError(f"unsupported safetensors dtype {key!r}")


_SAFETENSORS_TO_NUMPY = _LazyDtypeMap(
    {v: k for k, v in _SAFETENSORS_DTYPES.items()})


def save_safetensors(state_dict: Dict[str, np.ndarray], path: str,
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Minimal safetensors writer (the format is 8-byte little-endian header
    length + JSON header + concatenated row-major tensor bytes); together
    with load_safetensors above the round trip needs no external
    dependency."""
    import json

    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    arrays = []
    for name in sorted(state_dict):
        arr = np.ascontiguousarray(state_dict[name])
        if arr.dtype not in _SAFETENSORS_DTYPES:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        n = arr.nbytes
        header[name] = {
            "dtype": _SAFETENSORS_DTYPES[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + n],
        }
        offset += n
        arrays.append(arr)
    blob = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as f:
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
        for arr in arrays:
            f.write(arr.tobytes())
