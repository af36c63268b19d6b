"""Weight-converter tests: full LDM name coverage + transpose correctness.

Strategy: enumerate our param tree for a small-but-structurally-complete SD
config, emit the LDM-layout state dict the translator expects (with inverse
transposes), convert, and require 100% coverage and exact value round-trips.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.io import sd_weights
from minddiffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from minddiffusion_tpu.models.unet import UNetConfig, UNetModel
from minddiffusion_tpu.models.vae import AutoencoderKL, VAEConfig


def small_sd():
    # structurally complete: 3 levels (2 downsamples), attention at two ds
    # rates, linear-in-transformer False (conv proj like SD1)
    unet_cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                          num_res_blocks=2, attention_resolutions=(2, 1),
                          channel_mult=(1, 2, 2), num_heads=4, context_dim=24)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=2)
    text_cfg = CLIPTextConfig(vocab_size=50, width=24, layers=2, heads=4,
                              context_length=8)
    return unet_cfg, vae_cfg, text_cfg


@pytest.fixture(scope="module")
def abstract():
    unet_cfg, vae_cfg, text_cfg = small_sd()
    unet = UNetModel(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextEncoder(text_cfg)
    rng = jax.random.PRNGKey(0)
    shapes = {
        "unet": jax.eval_shape(
            lambda: unet.init(rng, jnp.zeros((1, 8, 8, 4)),
                              jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 24)))),
        "vae": jax.eval_shape(lambda: vae.init(rng, jnp.zeros((1, 16, 16, 3)))),
        "text": jax.eval_shape(
            lambda: text.init(rng, jnp.zeros((1, 8), jnp.int32))),
    }
    return shapes


def make_fake_state_dict(abstract, unet_cfg):
    """Inverse-transform our tree into LDM naming with deterministic values."""
    translators = {
        "unet": sd_weights.unet_translator(unet_cfg),
        "vae": sd_weights.vae_translator(),
        "text": sd_weights.clip_translator(),
    }
    prefixes = {"unet": "model.diffusion_model.", "vae": "first_stage_model.",
                "text": "cond_stage_model.model."}
    sd, expected = {}, {}
    counter = [0]
    for kind, tree in abstract.items():
        tr = translators[kind]
        flat = sd_weights._flatten_our_tree(tree)
        for path, leaf in flat.items():
            r = tr(path)
            assert r is not None, f"no mapping for {kind}/{'/'.join(path)}"
            name, xform = r
            counter[0] += 1
            val = (np.arange(np.prod(leaf.shape), dtype=np.float32)
                   .reshape(leaf.shape) + counter[0])
            expected[(kind,) + path] = val
            # invert the transform to produce the torch-layout array
            if xform is sd_weights._t_conv:
                sd[prefixes[kind] + name] = np.transpose(val, (3, 2, 0, 1))
            elif xform is sd_weights._t_dense:
                sd[prefixes[kind] + name] = np.transpose(val)
            else:
                sd[prefixes[kind] + name] = val
    return sd, expected


def test_full_coverage_and_roundtrip(abstract):
    unet_cfg, _, _ = small_sd()
    state_dict, expected = make_fake_state_dict(abstract, unet_cfg)
    params, report = sd_weights.convert_sd_checkpoint(state_dict, abstract, unet_cfg)
    not_loaded = [r for r in report if r.startswith("not loaded")]
    unused = [r for r in report if r.startswith("unused")]
    assert not not_loaded, not_loaded[:10]
    assert not unused, unused[:10]
    for kind, tree in params.items():
        flat = sd_weights._flatten_our_tree(tree)
        for path, leaf in flat.items():
            np.testing.assert_array_equal(
                np.asarray(leaf), expected[(kind,) + path],
                err_msg=f"{kind}/{'/'.join(path)}")


def test_converted_params_run(abstract):
    unet_cfg, vae_cfg, text_cfg = small_sd()
    state_dict, _ = make_fake_state_dict(abstract, unet_cfg)
    # scale values down so the forward pass stays finite
    state_dict = {k: v * 1e-6 for k, v in state_dict.items()}
    params, _ = sd_weights.convert_sd_checkpoint(state_dict, abstract, unet_cfg)
    unet = UNetModel(unet_cfg)
    out = unet.apply(params["unet"], jnp.ones((1, 8, 8, 4)),
                     jnp.array([3]), jnp.ones((1, 8, 24)))
    assert out.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_missing_keys_reported(abstract):
    unet_cfg, _, _ = small_sd()
    state_dict, _ = make_fake_state_dict(abstract, unet_cfg)
    removed = sorted(state_dict)[0]
    del state_dict[removed]
    params, report = sd_weights.convert_sd_checkpoint(state_dict, abstract, unet_cfg)
    assert any(r.startswith("not loaded") for r in report)
    with pytest.raises(ValueError):
        sd_weights.convert_sd_checkpoint(state_dict, abstract, unet_cfg, strict=True)


def test_safetensors_cross_compat_with_reference_package(tmp_path):
    """Our from-scratch reader/writer must interoperate bitwise with the real
    safetensors package (including bf16 via ml_dtypes)."""
    st = pytest.importorskip("safetensors.numpy")
    import ml_dtypes

    d = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
         "b": np.ones((2, 2), np.float16),
         "c": np.arange(4, dtype=np.int64),
         "d": np.ones((2,), ml_dtypes.bfloat16)}
    theirs = str(tmp_path / "theirs.safetensors")
    st.save_file(d, theirs, metadata={"format": "pt"})
    out = sd_weights.load_safetensors(theirs)
    assert set(out) == set(d)
    np.testing.assert_array_equal(out["a"], d["a"])
    np.testing.assert_array_equal(out["b"], d["b"].astype(np.float32))
    np.testing.assert_array_equal(out["c"], d["c"])
    np.testing.assert_array_equal(out["d"], np.ones((2,), np.float32))

    ours = str(tmp_path / "ours.safetensors")
    sd_weights.save_safetensors({"a": d["a"], "c": d["c"]}, ours,
                                metadata={"format": "pt"})
    from safetensors import safe_open

    with safe_open(ours, framework="np") as f:
        np.testing.assert_array_equal(f.get_tensor("a"), d["a"])
        np.testing.assert_array_equal(f.get_tensor("c"), d["c"])


def test_export_roundtrip_through_safetensors(abstract, tmp_path):
    """export_sd_checkpoint -> save_safetensors -> load_safetensors ->
    convert_sd_checkpoint must reproduce every leaf bitwise."""
    unet_cfg, _, _ = small_sd()
    # real (random-init shaped) values: materialize the abstract tree
    rng = np.random.RandomState(5)
    params = jax.tree.map(
        lambda l: jnp.asarray(rng.randn(*l.shape), jnp.float32), abstract)

    sd, report = sd_weights.export_sd_checkpoint(params, unet_cfg)
    assert not report, report[:10]

    path = str(tmp_path / "export.safetensors")
    sd_weights.save_safetensors(sd, path, metadata={"format": "pt"})
    loaded = sd_weights.load_safetensors(path)
    assert set(loaded) == set(sd)

    back, report2 = sd_weights.convert_sd_checkpoint(loaded, abstract, unet_cfg)
    assert not [r for r in report2 if r.startswith("not loaded")]
    for kind, tree in back.items():
        for path_, leaf in sd_weights._flatten_our_tree(tree).items():
            np.testing.assert_array_equal(
                np.asarray(leaf),
                np.asarray(sd_weights._flatten_our_tree(params[kind])[path_]),
                err_msg=f"{kind}/{'/'.join(path_)}")
