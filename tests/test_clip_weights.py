"""CLIP tower numerical parity against the public torch implementation.

VERDICT r2 item 8 (pre-validate eval numerics): random-weight HF CLIP models
run locally (no network), so the full conversion + forward path can be locked
down before real OpenCLIP weights are staged: torch CLIPModel state dict ->
io/clip_weights.convert_clip_checkpoint -> our towers must reproduce torch's
image/text embeddings and CLIP scores. The OpenCLIP checkpoint layout is
covered by round-tripping the same tensors through that naming.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.eval.clip_score import (CLIPScoreConfig, CLIPScorer,
                                               preprocess_uint8)
from minddiffusion_tpu.io.clip_weights import convert_clip_checkpoint
from minddiffusion_tpu.models.clip import CLIPTextConfig
from minddiffusion_tpu.models.clip_vision import CLIPVisionConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

V_WIDTH, V_LAYERS, V_HEADS, IMG, PATCH = 64, 2, 2, 32, 8
T_WIDTH, T_LAYERS, T_HEADS, VOCAB, CTX = 48, 2, 2, 128, 16
EMBED = 32


def parity_config() -> CLIPScoreConfig:
    return CLIPScoreConfig(
        vision=CLIPVisionConfig(image_size=IMG, patch_size=PATCH, width=V_WIDTH,
                                layers=V_LAYERS, heads=V_HEADS, embed_dim=EMBED),
        text=CLIPTextConfig(vocab_size=VOCAB, width=T_WIDTH, layers=T_LAYERS,
                            heads=T_HEADS, context_length=CTX,
                            use_exact_gelu=True),
    )


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.CLIPConfig(
        projection_dim=EMBED,
        vision_config=dict(image_size=IMG, patch_size=PATCH, hidden_size=V_WIDTH,
                           num_hidden_layers=V_LAYERS, num_attention_heads=V_HEADS,
                           intermediate_size=4 * V_WIDTH, hidden_act="gelu",
                           projection_dim=EMBED),
        text_config=dict(vocab_size=VOCAB, hidden_size=T_WIDTH,
                         num_hidden_layers=T_LAYERS, num_attention_heads=T_HEADS,
                         intermediate_size=4 * T_WIDTH, hidden_act="gelu",
                         max_position_embeddings=CTX, projection_dim=EMBED,
                         # EOT convention: both HF (eos position) and our
                         # argmax pooling pick the highest-id token VOCAB-1
                         eos_token_id=VOCAB - 1),
    )
    torch.manual_seed(7)
    model = transformers.CLIPModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params, report = convert_clip_checkpoint(sd, parity_config())
    assert not [r for r in report if r.startswith("not loaded")], report[:8]
    return params


def make_inputs(batch=3):
    rng = np.random.RandomState(11)
    images = rng.rand(batch, IMG, IMG, 3).astype(np.float32) * 2.0 - 1.0
    tokens = rng.randint(1, VOCAB - 1, size=(batch, CTX)).astype(np.int32)
    tokens[:, 0] = 5
    eot_pos = np.array([4, CTX - 1, 9])
    for b, p in enumerate(eot_pos):
        tokens[b, p] = VOCAB - 1          # single EOT occurrence per row
    return images, tokens


def test_converted_tree_matches_init_structure(converted):
    scorer = CLIPScorer(parity_config())
    ref = jax.eval_shape(lambda: scorer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
        jnp.zeros((1, CTX), jnp.int32)))
    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    got_flat = {jax.tree_util.keystr(p): np.asarray(l).shape
                for p, l in jax.tree_util.tree_leaves_with_path(converted)}
    exp_flat = {jax.tree_util.keystr(p): tuple(l.shape) for p, l in ref_flat}
    assert got_flat == exp_flat


def test_image_embeddings_match_torch(hf_model, converted):
    images, _ = make_inputs()
    scorer = CLIPScorer(parity_config())
    ours = scorer.apply(converted, jnp.asarray(images),
                        method=scorer.encode_image)
    with torch.no_grad():
        theirs = hf_model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)))
        theirs = torch.nn.functional.normalize(theirs, dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)


def test_text_embeddings_match_torch(hf_model, converted):
    _, tokens = make_inputs()
    scorer = CLIPScorer(parity_config())
    ours = scorer.apply(converted, jnp.asarray(tokens),
                        method=scorer.encode_text)
    with torch.no_grad():
        theirs = hf_model.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64)))
        theirs = torch.nn.functional.normalize(theirs, dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)


def test_clip_scores_match_torch(hf_model, converted):
    images, tokens = make_inputs()
    scorer = CLIPScorer(parity_config())
    ours = np.asarray(scorer.apply(converted, jnp.asarray(images),
                                   jnp.asarray(tokens)))
    with torch.no_grad():
        ie = hf_model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)))
        te = hf_model.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64)))
        cos = torch.nn.functional.cosine_similarity(ie, te, dim=-1).numpy()
    np.testing.assert_allclose(ours, 100.0 * cos, atol=2e-4)


def _hf_to_openclip(sd):
    """Rename the HF tensors into the OpenCLIP checkpoint layout (literal
    mapping, independent of the converter's internals)."""
    out = {}
    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"]
    for a, b in (("visual.ln_pre", "vision_model.pre_layrnorm"),
                 ("visual.ln_post", "vision_model.post_layernorm"),
                 ("ln_final", "text_model.final_layer_norm")):
        out[a + ".weight"] = sd[b + ".weight"]
        out[a + ".bias"] = sd[b + ".bias"]
    # projections: OpenCLIP stores (W, embed) parameters, HF (embed, W) linears
    out["visual.proj"] = sd["visual_projection.weight"].T
    out["text_projection"] = sd["text_projection.weight"].T
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    for ours_base, hf_base, n in (
            ("visual.transformer.resblocks", "vision_model.encoder.layers", V_LAYERS),
            ("transformer.resblocks", "text_model.encoder.layers", T_LAYERS)):
        for i in range(n):
            o, h = f"{ours_base}.{i}", f"{hf_base}.{i}"
            out[f"{o}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{h}.self_attn.q_proj.weight"],
                 sd[f"{h}.self_attn.k_proj.weight"],
                 sd[f"{h}.self_attn.v_proj.weight"]], axis=0)
            out[f"{o}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{h}.self_attn.q_proj.bias"],
                 sd[f"{h}.self_attn.k_proj.bias"],
                 sd[f"{h}.self_attn.v_proj.bias"]])
            for a, b in (("attn.out_proj", "self_attn.out_proj"),
                         ("ln_1", "layer_norm1"), ("ln_2", "layer_norm2"),
                         ("mlp.c_fc", "mlp.fc1"), ("mlp.c_proj", "mlp.fc2")):
                out[f"{o}.{a}.weight"] = sd[f"{h}.{b}.weight"]
                out[f"{o}.{a}.bias"] = sd[f"{h}.{b}.bias"]
    out["logit_scale"] = sd["logit_scale"]
    return out


def test_openclip_layout_converts_identically(hf_model, converted):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    oc = _hf_to_openclip(sd)
    params, report = convert_clip_checkpoint(oc, parity_config())
    assert not [r for r in report if r.startswith("not loaded")], report[:8]
    assert not [r for r in report if r.startswith("unused")], report[:8]
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(converted)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_missing_key_reported(hf_model):
    import pytest

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    del sd["text_model.final_layer_norm.weight"]
    # default: a partial checkpoint is a hard error naming the missing keys
    # (ADVICE r3: silent None leaves produced opaque downstream failures)
    with pytest.raises(KeyError, match="final_layer_norm"):
        convert_clip_checkpoint(sd, parity_config())
    # explicit opt-in still returns the tree + report for diagnostics
    _, report = convert_clip_checkpoint(sd, parity_config(),
                                        allow_partial=True)
    assert any("text_model.final_layer_norm.weight" in r for r in report)


def test_preprocess_hand_math():
    """Constant-value image: output must be exactly (v/255 - mean) / std."""
    v = 128
    img = np.full((2, 224, 224, 3), v, np.uint8)
    out = np.asarray(preprocess_uint8(jnp.asarray(img)))
    mean = np.array([0.48145466, 0.4578275, 0.40821073])
    std = np.array([0.26862954, 0.26130258, 0.27577711])
    expected = (v / 255.0 - mean) / std
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-6)
    np.testing.assert_allclose(out, np.broadcast_to(expected, out.shape),
                               rtol=1e-6)
    # resize path: constant stays constant under bicubic
    small = np.full((1, 64, 64, 3), v, np.uint8)
    out2 = np.asarray(preprocess_uint8(jnp.asarray(small)))
    assert out2.shape == (1, 224, 224, 3)
    np.testing.assert_allclose(out2, np.broadcast_to(expected, out2.shape),
                               rtol=1e-5, atol=1e-5)
