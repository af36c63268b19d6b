"""MindSpore .ckpt wire-format codec + name adapter tests."""
import numpy as np

from minddiffusion_tpu.io.ms_checkpoint import (
    load_ms_checkpoint,
    ms_to_ldm_names,
    save_ms_checkpoint,
)


def test_wire_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    params = {
        "model.diffusion_model.input_blocks.0.0.weight":
            rng.randn(32, 4, 3, 3).astype(np.float32),
        "model.diffusion_model.out.0.gamma": rng.randn(32).astype(np.float32),
        "some.int.param": np.arange(7, dtype=np.int32),
        "half.param": rng.randn(4, 4).astype(np.float16),
    }
    p = str(tmp_path / "test.ckpt")
    save_ms_checkpoint(p, params)
    restored = load_ms_checkpoint(p)
    assert set(restored) == set(params)
    for k in params:
        np.testing.assert_allclose(restored[k], params[k].astype(np.float32),
                                   rtol=1e-3)
        assert restored[k].shape == params[k].shape


def test_name_adapter():
    ms = {
        "first_stage_model.encoder.norm_out.gamma": np.zeros(4, np.float32),
        "first_stage_model.encoder.norm_out.beta": np.zeros(4, np.float32),
        "cond_stage_model.transformer.embedding_table": np.zeros((10, 4), np.float32),
        "cond_stage_model.transformer.positional_embedding": np.zeros((7, 4), np.float32),
        "cond_stage_model.transformer.transformer_layer.resblocks.0.attn.attn.in_proj.weight":
            np.zeros((12, 4), np.float32),
        "cond_stage_model.transformer.transformer_layer.resblocks.0.attn.attn.out_proj.bias":
            np.zeros(4, np.float32),
        "cond_stage_model.transformer.transformer_layer.resblocks.0.ln_1.gamma":
            np.zeros(4, np.float32),
        "cond_stage_model.transformer.transformer_layer.resblocks.0.c_fc.weight":
            np.zeros((16, 4), np.float32),
        "cond_stage_model.transformer.ln_final.gamma": np.zeros(4, np.float32),
    }
    ldm = ms_to_ldm_names(ms)
    expected = {
        "first_stage_model.encoder.norm_out.weight",
        "first_stage_model.encoder.norm_out.bias",
        "cond_stage_model.model.token_embedding.weight",
        "cond_stage_model.model.positional_embedding",
        "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight",
        "cond_stage_model.model.transformer.resblocks.0.attn.out_proj.bias",
        "cond_stage_model.model.transformer.resblocks.0.ln_1.weight",
        "cond_stage_model.model.transformer.resblocks.0.mlp.c_fc.weight",
        "cond_stage_model.model.ln_final.weight",
    }
    assert set(ldm) == expected


def test_ms_ckpt_to_flax_end_to_end(tmp_path):
    """Full path: write an MS-format ckpt with MS naming -> parse -> adapt
    names -> convert to flax params (UNet+VAE at the small test config)."""
    import jax
    import jax.numpy as jnp

    from minddiffusion_tpu.io import sd_weights
    from tests.test_sd_weights import small_sd, make_fake_state_dict
    from minddiffusion_tpu.models.unet import UNetModel
    from minddiffusion_tpu.models.vae import AutoencoderKL
    from minddiffusion_tpu.models.clip import CLIPTextEncoder

    unet_cfg, vae_cfg, text_cfg = small_sd()
    rng = jax.random.PRNGKey(0)
    abstract = {
        "unet": jax.eval_shape(lambda: UNetModel(unet_cfg).init(
            rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, 24)))),
        "vae": jax.eval_shape(lambda: AutoencoderKL(vae_cfg).init(
            rng, jnp.zeros((1, 16, 16, 3)))),
        "text": jax.eval_shape(lambda: CLIPTextEncoder(text_cfg).init(
            rng, jnp.zeros((1, 8), jnp.int32))),
    }
    ldm_sd, expected = make_fake_state_dict(abstract, unet_cfg)

    # re-express the LDM dict in MindSpore naming, save, reload, adapt
    def ldm_to_ms(name):
        if name.startswith("cond_stage_model.model."):
            name = name.replace("cond_stage_model.model.",
                                "cond_stage_model.transformer.")
            name = name.replace(".transformer.resblocks.",
                                ".transformer_layer.resblocks.")
            name = name.replace(".token_embedding.weight", ".embedding_table")
            name = name.replace(".attn.in_proj_weight", ".attn.attn.in_proj.weight")
            name = name.replace(".attn.in_proj_bias", ".attn.attn.in_proj.bias")
            name = name.replace(".attn.out_proj.", ".attn.attn.out_proj.")
            name = name.replace(".mlp.c_fc.", ".c_fc.")
            name = name.replace(".mlp.c_proj.", ".c_proj.")
        # norms: LDM .weight/.bias on norms are gamma/beta in MS. Identify by
        # the LDM name referring to norm layers.
        for marker in ("norm", "ln_", "ln_final", "in_layers.0", "out_layers.0",
                       "out.0"):
            if marker in name:
                name = name.replace(".weight", ".gamma").replace(".bias", ".beta")
                break
        return name

    from minddiffusion_tpu.io.ms_checkpoint import (
        load_ms_checkpoint, ms_to_ldm_names, save_ms_checkpoint)

    ms_sd = {ldm_to_ms(k): v for k, v in ldm_sd.items()}
    p = str(tmp_path / "ref.ckpt")
    save_ms_checkpoint(p, ms_sd)
    back = ms_to_ldm_names(load_ms_checkpoint(p))
    params, report = sd_weights.convert_sd_checkpoint(back, abstract, unet_cfg)
    not_loaded = [r for r in report if r.startswith("not loaded")]
    assert not not_loaded, not_loaded[:8]
    import numpy as np
    flat = sd_weights._flatten_our_tree(params["unet"])
    for path, leaf in list(flat.items())[:5]:
        np.testing.assert_array_equal(np.asarray(leaf), expected[("unet",) + path])
