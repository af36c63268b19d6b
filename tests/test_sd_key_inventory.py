"""Full-scale LDM key-inventory completeness for the weight converters.

VERDICT r2 item 2: until a real checkpoint can be staged (no egress), the
strongest available proxy is to assert that the translators in
io/sd_weights.py cover the COMPLETE public SD2/SD1 LDM key inventory
bidirectionally, so an unmapped-key regression fails in CI.

Strategy: this file re-derives the expected {checkpoint key -> torch-layout
shape} inventory from the documented LDM architecture (reference
configs/v2-inference.yaml + the public CompVis/openai UNet & AutoencoderKL
layout rules) with deliberately independent code — straight-line loops, no
reuse of the translator — then requires exact dict equality (names AND
shapes, both directions) against what the translators produce for our
full-scale model trees. A curated list of literal key names/shapes known
from the public checkpoint ecosystem is pinned on top as non-derived ground
truth.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.io import sd_weights
from minddiffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from minddiffusion_tpu.models.unet import UNetConfig, UNetModel
from minddiffusion_tpu.models.vae import AutoencoderKL, VAEConfig


# ---------------------------------------------------------------------------
# independent inventory enumerators (torch-layout shapes)
# ---------------------------------------------------------------------------

def _norm(d, base, ch):
    d[base + ".weight"] = (ch,)
    d[base + ".bias"] = (ch,)


def _conv(d, base, cout, cin, k):
    d[base + ".weight"] = (cout, cin, k, k)
    d[base + ".bias"] = (cout,)


def _dense(d, base, cout, cin, bias=True):
    d[base + ".weight"] = (cout, cin)
    if bias:
        d[base + ".bias"] = (cout,)


def _ldm_resblock(d, base, cin, cout, emb):
    _norm(d, base + ".in_layers.0", cin)
    _conv(d, base + ".in_layers.2", cout, cin, 3)
    _dense(d, base + ".emb_layers.1", cout, emb)
    _norm(d, base + ".out_layers.0", cout)
    _conv(d, base + ".out_layers.3", cout, cout, 3)
    if cin != cout:
        _conv(d, base + ".skip_connection", cout, cin, 1)


def _ldm_spatial_transformer(d, base, ch, ctx, use_linear):
    _norm(d, base + ".norm", ch)
    for p in ("proj_in", "proj_out"):
        if use_linear:
            _dense(d, f"{base}.{p}", ch, ch)
        else:
            _conv(d, f"{base}.{p}", ch, ch, 1)
    tb = base + ".transformer_blocks.0"
    for attn, kdim in (("attn1", ch), ("attn2", ctx)):
        _dense(d, f"{tb}.{attn}.to_q", ch, ch, bias=False)
        _dense(d, f"{tb}.{attn}.to_k", ch, kdim, bias=False)
        _dense(d, f"{tb}.{attn}.to_v", ch, kdim, bias=False)
        _dense(d, f"{tb}.{attn}.to_out.0", ch, ch)
    _dense(d, f"{tb}.ff.net.0.proj", 8 * ch, ch)  # GEGLU: 2 * (4*ch)
    _dense(d, f"{tb}.ff.net.2", ch, 4 * ch)
    for n in ("norm1", "norm2", "norm3"):
        _norm(d, f"{tb}.{n}", ch)


def ldm_unet_inventory(mc, mult, nrb, attn_ds, ctx, use_linear,
                       in_ch=4, out_ch=4):
    """Expected model.diffusion_model.* keys for the CompVis/openai UNet."""
    d = {}
    emb = 4 * mc
    _dense(d, "time_embed.0", emb, mc)
    _dense(d, "time_embed.2", emb, emb)
    _conv(d, "input_blocks.0.0", mc, in_ch, 3)

    skips = [mc]
    ch, ds, n = mc, 1, 1
    for level, m in enumerate(mult):
        for _ in range(nrb):
            _ldm_resblock(d, f"input_blocks.{n}.0", ch, mc * m, emb)
            ch = mc * m
            if ds in attn_ds:
                _ldm_spatial_transformer(d, f"input_blocks.{n}.1", ch, ctx,
                                         use_linear)
            skips.append(ch)
            n += 1
        if level != len(mult) - 1:
            _conv(d, f"input_blocks.{n}.0.op", ch, ch, 3)
            skips.append(ch)
            n += 1
            ds *= 2

    _ldm_resblock(d, "middle_block.0", ch, ch, emb)
    _ldm_spatial_transformer(d, "middle_block.1", ch, ctx, use_linear)
    _ldm_resblock(d, "middle_block.2", ch, ch, emb)

    n = 0
    for level in reversed(range(len(mult))):
        m = mult[level]
        for i in range(nrb + 1):
            ich = skips.pop()
            _ldm_resblock(d, f"output_blocks.{n}.0", ch + ich, mc * m, emb)
            ch = mc * m
            has_attn = ds in attn_ds
            if has_attn:
                _ldm_spatial_transformer(d, f"output_blocks.{n}.1", ch, ctx,
                                         use_linear)
            if level and i == nrb:
                _conv(d, f"output_blocks.{n}.{2 if has_attn else 1}.conv",
                      ch, ch, 3)
                ds //= 2
            n += 1

    _norm(d, "out.0", mc)
    _conv(d, "out.2", out_ch, mc, 3)
    return d


def _vae_block(d, base, cin, cout):
    _norm(d, base + ".norm1", cin)
    _conv(d, base + ".conv1", cout, cin, 3)
    _norm(d, base + ".norm2", cout)
    _conv(d, base + ".conv2", cout, cout, 3)
    if cin != cout:
        _conv(d, base + ".nin_shortcut", cout, cin, 1)


def _vae_mid(d, base, ch):
    _vae_block(d, base + ".block_1", ch, ch)
    _norm(d, base + ".attn_1.norm", ch)
    for p in ("q", "k", "v", "proj_out"):
        _conv(d, f"{base}.attn_1.{p}", ch, ch, 1)
    _vae_block(d, base + ".block_2", ch, ch)


def ldm_vae_inventory(ch, mult, nrb, z, embed_dim, in_ch=3, out_ch=3):
    """Expected first_stage_model.* keys for the CompVis AutoencoderKL."""
    d = {}
    # encoder
    _conv(d, "encoder.conv_in", ch, in_ch, 3)
    block_in = ch
    for level, m in enumerate(mult):
        block_out = ch * m
        for j in range(nrb):
            _vae_block(d, f"encoder.down.{level}.block.{j}", block_in, block_out)
            block_in = block_out
        if level != len(mult) - 1:
            _conv(d, f"encoder.down.{level}.downsample.conv",
                  block_in, block_in, 3)
    _vae_mid(d, "encoder.mid", block_in)
    _norm(d, "encoder.norm_out", block_in)
    _conv(d, "encoder.conv_out", 2 * z, block_in, 3)
    # decoder (CompVis indexes up.{level} with level-0 = highest resolution,
    # built in reverse; up.0 has no upsample)
    _conv(d, "decoder.conv_in", block_in, z, 3)
    _vae_mid(d, "decoder.mid", block_in)
    for level in reversed(range(len(mult))):
        block_out = ch * mult[level]
        for j in range(nrb + 1):
            _vae_block(d, f"decoder.up.{level}.block.{j}", block_in, block_out)
            block_in = block_out
        if level:
            _conv(d, f"decoder.up.{level}.upsample.conv", block_in, block_in, 3)
    _norm(d, "decoder.norm_out", block_in)
    _conv(d, "decoder.conv_out", out_ch, block_in, 3)
    _conv(d, "quant_conv", 2 * embed_dim, 2 * z, 1)
    _conv(d, "post_quant_conv", z, embed_dim, 1)
    return d


def openclip_text_inventory(width, layers, vocab, ctx_len):
    """Expected cond_stage_model.model.* keys (OpenCLIP text tower naming,
    as carried by public SD2 checkpoints)."""
    d = {"token_embedding.weight": (vocab, width),
         "positional_embedding": (ctx_len, width)}
    for i in range(layers):
        b = f"transformer.resblocks.{i}"
        d[f"{b}.attn.in_proj_weight"] = (3 * width, width)
        d[f"{b}.attn.in_proj_bias"] = (3 * width,)
        _dense(d, f"{b}.attn.out_proj", width, width)
        _norm(d, f"{b}.ln_1", width)
        _norm(d, f"{b}.ln_2", width)
        _dense(d, f"{b}.mlp.c_fc", 4 * width, width)
        _dense(d, f"{b}.mlp.c_proj", width, 4 * width)
    _norm(d, "ln_final", width)
    return d


# ---------------------------------------------------------------------------
# what the translators produce (names + torch-layout shapes, no materialize)
# ---------------------------------------------------------------------------

def _inverted_shape(xform, shape):
    if xform is sd_weights._t_conv:      # flax HWIO -> torch OIHW
        kh, kw, i, o = shape
        return (o, i, kh, kw)
    if xform is sd_weights._t_dense:
        return tuple(reversed(shape))
    return tuple(shape)


def translated_inventory(abstract_tree, translate):
    out = {}
    for path, leaf in sd_weights._flatten_our_tree(abstract_tree).items():
        r = translate(path)
        assert r is not None, f"translator has no mapping for {'/'.join(path)}"
        name, xform = r
        assert name not in out, f"duplicate target key {name} (from {path})"
        out[name] = _inverted_shape(xform, leaf.shape)
    return out


def _assert_same_inventory(ours, expected, what):
    missing = sorted(set(expected) - set(ours))
    extra = sorted(set(ours) - set(expected))
    assert not missing and not extra, (
        f"{what}: {len(missing)} expected keys unmapped (e.g. {missing[:8]}), "
        f"{len(extra)} unexpected keys produced (e.g. {extra[:8]})")
    bad = {k: (ours[k], expected[k]) for k in expected if ours[k] != expected[k]}
    assert not bad, f"{what}: shape mismatches {dict(list(bad.items())[:8])}"


def _abstract_unet(cfg):
    model = UNetModel(cfg)
    return jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, cfg.context_dim))))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_sd2_unet_full_inventory():
    cfg = UNetConfig.sd2()
    ours = translated_inventory(_abstract_unet(cfg), sd_weights.unet_translator(cfg))
    expected = ldm_unet_inventory(320, (1, 2, 4, 4), 2, {4, 2, 1}, 1024,
                                  use_linear=True)
    assert len(expected) > 600
    _assert_same_inventory(ours, expected, "SD2 UNet")


def test_sd1_wukong_unet_full_inventory():
    cfg = UNetConfig.sd1()
    ours = translated_inventory(_abstract_unet(cfg), sd_weights.unet_translator(cfg))
    expected = ldm_unet_inventory(320, (1, 2, 4, 4), 2, {4, 2, 1}, 768,
                                  use_linear=False)
    _assert_same_inventory(ours, expected, "SD1/wukong UNet")


def test_sd1_inpaint_unet_full_inventory():
    cfg = UNetConfig.sd1_inpaint() if hasattr(UNetConfig, "sd1_inpaint") else \
        UNetConfig.sd1(in_channels=9)
    ours = translated_inventory(_abstract_unet(cfg), sd_weights.unet_translator(cfg))
    expected = ldm_unet_inventory(320, (1, 2, 4, 4), 2, {4, 2, 1}, 768,
                                  use_linear=False, in_ch=9)
    _assert_same_inventory(ours, expected, "inpaint UNet")


def test_vae_full_inventory():
    vae = AutoencoderKL(VAEConfig())
    abstract = jax.eval_shape(lambda: vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    ours = translated_inventory(abstract, sd_weights.vae_translator())
    expected = ldm_vae_inventory(128, (1, 2, 4, 4), 2, 4, 4)
    _assert_same_inventory(ours, expected, "VAE")


def test_clip_text_full_inventory():
    text = CLIPTextEncoder(CLIPTextConfig.sd2_en())
    abstract = jax.eval_shape(lambda: text.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)))
    ours = translated_inventory(abstract, sd_weights.clip_translator())
    expected = openclip_text_inventory(1024, 23, 49408, 77)
    _assert_same_inventory(ours, expected, "CLIP text")


# Literal keys + shapes known from the public SD checkpoint ecosystem
# (stabilityai SD2.x .ckpt/.safetensors state dicts) — non-derived ground
# truth pinned against both the enumerator and the translators.
PINNED_SD2 = {
    "model.diffusion_model.time_embed.0.weight": (1280, 320),
    "model.diffusion_model.input_blocks.0.0.weight": (320, 4, 3, 3),
    "model.diffusion_model.input_blocks.1.0.in_layers.0.weight": (320,),
    "model.diffusion_model.input_blocks.1.0.in_layers.2.weight": (320, 320, 3, 3),
    "model.diffusion_model.input_blocks.1.0.emb_layers.1.weight": (320, 1280),
    "model.diffusion_model.input_blocks.1.0.out_layers.3.bias": (320,),
    "model.diffusion_model.input_blocks.1.1.norm.weight": (320,),
    "model.diffusion_model.input_blocks.1.1.proj_in.weight": (320, 320),
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": (320, 320),
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight": (320, 1024),
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_out.0.weight": (320, 320),
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight": (2560, 320),
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.ff.net.2.weight": (320, 1280),
    "model.diffusion_model.input_blocks.3.0.op.weight": (320, 320, 3, 3),
    "model.diffusion_model.input_blocks.4.0.skip_connection.weight": (640, 320, 1, 1),
    "model.diffusion_model.input_blocks.7.0.skip_connection.weight": (1280, 640, 1, 1),
    "model.diffusion_model.input_blocks.8.1.proj_out.weight": (1280, 1280),
    "model.diffusion_model.middle_block.0.in_layers.2.weight": (1280, 1280, 3, 3),
    "model.diffusion_model.middle_block.1.transformer_blocks.0.attn2.to_v.weight": (1280, 1024),
    "model.diffusion_model.output_blocks.0.0.skip_connection.weight": (1280, 2560, 1, 1),
    "model.diffusion_model.output_blocks.2.1.conv.weight": (1280, 1280, 3, 3),
    "model.diffusion_model.output_blocks.5.2.conv.weight": (1280, 1280, 3, 3),
    "model.diffusion_model.output_blocks.8.2.conv.weight": (640, 640, 3, 3),
    "model.diffusion_model.output_blocks.11.1.proj_out.weight": (320, 320),
    "model.diffusion_model.out.0.weight": (320,),
    "model.diffusion_model.out.2.weight": (4, 320, 3, 3),
    "first_stage_model.encoder.conv_in.weight": (128, 3, 3, 3),
    "first_stage_model.encoder.down.0.block.0.norm1.weight": (128,),
    "first_stage_model.encoder.down.1.block.0.nin_shortcut.weight": (256, 128, 1, 1),
    "first_stage_model.encoder.down.0.downsample.conv.weight": (128, 128, 3, 3),
    "first_stage_model.encoder.mid.attn_1.q.weight": (512, 512, 1, 1),
    "first_stage_model.encoder.conv_out.weight": (8, 512, 3, 3),
    "first_stage_model.quant_conv.weight": (8, 8, 1, 1),
    "first_stage_model.post_quant_conv.weight": (4, 4, 1, 1),
    "first_stage_model.decoder.conv_in.weight": (512, 4, 3, 3),
    "first_stage_model.decoder.up.1.upsample.conv.weight": (256, 256, 3, 3),
    "first_stage_model.decoder.up.0.block.0.nin_shortcut.weight": (128, 256, 1, 1),
    "first_stage_model.decoder.conv_out.weight": (3, 128, 3, 3),
    "cond_stage_model.model.token_embedding.weight": (49408, 1024),
    "cond_stage_model.model.positional_embedding": (77, 1024),
    "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight": (3072, 1024),
    "cond_stage_model.model.transformer.resblocks.22.mlp.c_fc.weight": (4096, 1024),
    "cond_stage_model.model.ln_final.weight": (1024,),
}

# SD1-family deltas (wukong UNet): conv proj_in/out, 768-wide context.
PINNED_SD1_UNET = {
    "model.diffusion_model.input_blocks.1.1.proj_in.weight": (320, 320, 1, 1),
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight": (320, 768),
    "model.diffusion_model.middle_block.1.proj_out.weight": (1280, 1280, 1, 1),
}


def test_pinned_public_keys_sd2():
    unet = translated_inventory(_abstract_unet(UNetConfig.sd2()),
                                sd_weights.unet_translator(UNetConfig.sd2()))
    vae_m = AutoencoderKL(VAEConfig())
    vae = translated_inventory(
        jax.eval_shape(lambda: vae_m.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 32, 32, 3)))),
        sd_weights.vae_translator())
    text_m = CLIPTextEncoder(CLIPTextConfig.sd2_en())
    text = translated_inventory(
        jax.eval_shape(lambda: text_m.init(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 77), jnp.int32))),
        sd_weights.clip_translator())
    full = ({"model.diffusion_model." + k: v for k, v in unet.items()}
            | {"first_stage_model." + k: v for k, v in vae.items()}
            | {"cond_stage_model.model." + k: v for k, v in text.items()})
    for key, shape in PINNED_SD2.items():
        assert key in full, f"public checkpoint key not produced: {key}"
        assert full[key] == shape, (key, full[key], shape)


def test_pinned_public_keys_sd1_unet():
    cfg = UNetConfig.sd1()
    unet = translated_inventory(_abstract_unet(cfg),
                                sd_weights.unet_translator(cfg))
    for key, shape in PINNED_SD1_UNET.items():
        short = key[len("model.diffusion_model."):]
        assert short in unet, f"public checkpoint key not produced: {key}"
        assert unet[short] == shape, (key, unet[short], shape)


def test_full_scale_synthetic_checkpoint_roundtrip():
    """convert_sd_checkpoint on a synthetic full-inventory SD2 state dict:
    zero 'not loaded', zero 'unused', and documented buffer keys (betas,
    model_ema, logit_scale...) that real checkpoints carry are reported as
    unused rather than crashing."""
    cfg = UNetConfig.sd2()
    abstract = {"unet": _abstract_unet(cfg)}
    inv = {("model.diffusion_model." + k): np.zeros(v, np.float32)
           for k, v in ldm_unet_inventory(320, (1, 2, 4, 4), 2, {4, 2, 1},
                                          1024, use_linear=True).items()}
    # buffer/aux keys real checkpoints carry alongside the weights
    inv["model.diffusion_model.extra_buffer"] = np.zeros((1,), np.float32)
    params, report = sd_weights.convert_sd_checkpoint(inv, abstract, cfg)
    not_loaded = [r for r in report if r.startswith("not loaded")]
    unused = [r for r in report if r.startswith("unused")]
    assert not not_loaded, not_loaded[:8]
    assert unused == ["unused ckpt key: model.diffusion_model.extra_buffer"]
