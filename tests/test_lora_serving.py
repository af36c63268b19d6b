"""LoRA merge/extract/apply + multi-chip serving tests."""
import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.models.lora import (
    apply_lora_params,
    extract_lora_params,
    merge_lora_params,
)
from minddiffusion_tpu.models.unet import UNetConfig, UNetModel
from minddiffusion_tpu.parallel import mesh as mesh_lib
from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline
from minddiffusion_tpu.models.vae import VAEConfig
from minddiffusion_tpu.models.clip import CLIPTextConfig


def lora_cfg(**kw):
    return UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                      num_res_blocks=1, attention_resolutions=(2,),
                      channel_mult=(1, 2), num_heads=4, context_dim=32,
                      enable_lora=True, lora_rank=4, lora_alpha=4.0, **kw)


def test_lora_merge_matches_adapter_forward():
    cfg = lora_cfg()
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx)
    # give the adapters real values (b is zero-init)
    params = jax.tree_util.tree_map_with_path(
        lambda p, l: jax.random.normal(jax.random.PRNGKey(5), l.shape) * 0.02
        if "lora_b" in jax.tree_util.keystr(p) else l, params)
    out_lora = model.apply(params, x, t, ctx)

    merged = merge_lora_params(params, rank=4, alpha=4.0)
    plain = UNetModel(cfg.replace(enable_lora=False))
    out_merged = plain.apply(merged, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_merged),
                               atol=1e-5)


def test_lora_extract_apply_roundtrip():
    cfg = lora_cfg()
    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, 4)); t = jnp.array([0]); ctx = jnp.zeros((1, 8, 32))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    params = jax.tree_util.tree_map_with_path(
        lambda p, l: jnp.full(l.shape, 0.3)
        if "lora_a" in jax.tree_util.keystr(p) else l, params)
    adapters = extract_lora_params(params)
    n_adapter = sum(x_.size for x_ in jax.tree.leaves(adapters))
    n_total = sum(x_.size for x_ in jax.tree.leaves(params))
    assert 0 < n_adapter < 0.1 * n_total  # small-ckpt property

    fresh = model.init(jax.random.PRNGKey(9), x, t, ctx)
    restored = apply_lora_params(fresh, adapters)
    leaves = jax.tree_util.tree_leaves_with_path(restored)
    a_leaves = [l for p, l in leaves if "lora_a" in jax.tree_util.keystr(p)]
    assert all(abs(float(l[0, 0]) - 0.3) < 1e-6 for l in a_leaves)


def test_txt2img_sharded_serving_on_mesh():
    models = SDModels.create(
        family="wukong", dtype=jnp.float32,
        unet_config=UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                               num_res_blocks=1, attention_resolutions=(2,),
                               channel_mult=(1, 2), num_heads=4, context_dim=32),
        vae_config=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
        text_config=CLIPTextConfig(vocab_size=64, width=32, layers=1, heads=4,
                                   context_length=8))
    params = models.init_params(jax.random.PRNGKey(0), height=32, width=32,
                                context_length=8)
    mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=-1, fsdp=1, tp=1))
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=32, width=32, num_steps=3, sampler="ddim",
                            batch_size=8, mesh=mesh)
    toks = jnp.ones((8, 8), jnp.int32)
    img = fn(params, toks, jnp.zeros_like(toks), jax.random.PRNGKey(1))
    assert img.shape == (8, 32, 32, 3)
    # output really is sharded over the mesh
    assert len(img.sharding.device_set) == 8
    # and matches the single-device program
    fn1 = pipe.build_txt2img(height=32, width=32, num_steps=3, sampler="ddim",
                             batch_size=8)
    img1 = fn1(params, toks, jnp.zeros_like(toks), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(img).astype(np.int32),
                               np.asarray(img1).astype(np.int32), atol=1)


def test_lora_grads_flow_once_zero_modules_are_live():
    """The r5 soak lesson: every adapter sits BEHIND a reference-zero_module
    layer (SpatialTransformer proj_out), so at random init the loss gradient
    w.r.t. all LoRA params is identically zero — and silently stays zero
    (measured on-chip as bit-identical loss across a 10x LR change). With
    those kernels nonzero (any pretrained base), lora_b grads are live and
    lora_a correctly stays zero until b moves off its zero init."""
    import jax.tree_util as jtu

    cfg = lora_cfg()
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx)
    target = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss(p):
        return jnp.mean((model.apply(p, x, t, ctx).astype(jnp.float32) - target) ** 2)

    def sum_abs(tree, key):
        return sum(float(jnp.abs(l).sum())
                   for pth, l in jtu.tree_leaves_with_path(tree)
                   if key in jax.tree_util.keystr(pth))

    g0 = jax.grad(loss)(params)
    assert sum_abs(g0, "lora_a") == 0.0 and sum_abs(g0, "lora_b") == 0.0

    def liven(path, leaf):
        name = jax.tree_util.keystr(path)
        if "lora_" in name or leaf.ndim < 2 or float(jnp.abs(leaf).sum()) != 0:
            return leaf
        return 0.02 * jax.random.normal(jax.random.PRNGKey(9), leaf.shape, leaf.dtype)

    live = jtu.tree_map_with_path(liven, params)
    g1 = jax.grad(loss)(live)
    assert sum_abs(g1, "lora_b") > 0.0          # adapters now reach the loss
    assert sum_abs(g1, "lora_a") == 0.0         # zero until lora_b moves
