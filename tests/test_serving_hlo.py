"""HLO-level evidence for the multi-chip serving claim (VERDICT r3 weak-3).

ROADMAP's v5e-4 stretch row ("dp4 mesh serves 4x b8 at ~single-chip x4
aggregate") rests on the sampling program being collective-free under pure
data-parallel sharding: each chip denoises its own batch shard with
replicated params, so throughput scales linearly over ICI-free work. This
test compiles the REAL `build_txt2img(mesh=...)` program on the 8-device
virtual CPU mesh with a pure-dp MeshConfig and asserts the optimized HLO
contains no cross-device collectives anywhere (a fortiori none in the
sampler scan body). Reference claim being substantiated: per-chip capacity
scaling, wukong README_EN.md:59.
"""
import re

import jax
import jax.numpy as jnp
import pytest

COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter"
    r"|collective-broadcast)\b")


@pytest.mark.parametrize("n_dp", [8])
def test_txt2img_pure_dp_scan_is_collective_free(n_dp):
    from minddiffusion_tpu.models.clip import CLIPTextConfig
    from minddiffusion_tpu.models.unet import UNetConfig
    from minddiffusion_tpu.models.vae import VAEConfig
    from minddiffusion_tpu.parallel import mesh as mesh_lib
    from minddiffusion_tpu.pipelines.stable_diffusion import (
        SDModels, StableDiffusionPipeline)

    if len(jax.devices()) < n_dp:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    mesh = mesh_lib.make_mesh(
        mesh_lib.MeshConfig(dp=n_dp, fsdp=1, tp=1),
        devices=jax.devices()[:n_dp])

    models = SDModels.create(
        family="sd2", dtype=jnp.float32,
        unet_config=UNetConfig(
            in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_head_channels=16, context_dim=32,
            use_linear_in_transformer=True),
        vae_config=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
        text_config=CLIPTextConfig(vocab_size=64, width=32, layers=1,
                                   heads=4, context_length=8),
    )
    params = models.init_params(jax.random.PRNGKey(0), height=32, width=32,
                                context_length=8)
    pipe = StableDiffusionPipeline(models)
    b = n_dp  # one image per dp shard — the stretch row's layout
    fn = pipe.build_txt2img(height=32, width=32, num_steps=3, batch_size=b,
                            mesh=mesh)
    toks = jnp.full((b, 8), 3, jnp.int32)
    lowered = fn.lower(params, toks, jnp.zeros_like(toks),
                       jax.random.PRNGKey(1))
    hlo = lowered.compile().as_text()

    # the whole optimized program — sampler scan body included — must carry
    # zero cross-device collectives under pure-dp serving sharding
    hits = sorted({m.group(0) for m in COLLECTIVES.finditer(hlo)})
    assert not hits, (
        f"pure-dp txt2img program contains collectives {hits}; the linear "
        f"aggregate-throughput claim (ROADMAP v5e-4 row) no longer holds")
    # sanity: the program really is partitioned over 8 devices, not a
    # single-device fallback
    assert f'num_partitions={n_dp}' in hlo or f"num_partitions = {n_dp}" in hlo
