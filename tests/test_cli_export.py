"""CLI-level test for cli/export_weights: tiny model, safetensors in ->
safetensors out, bitwise-identical tensor set.

Exercises the arg plumbing the io-layer tests in test_sd_weights.py can't:
load_params checkpoint-type dispatch, the --debug_tiny model build, and the
export report printing.
"""
import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.cli.common import build_sd, load_params
from minddiffusion_tpu.cli.export_weights import main as export_main
from minddiffusion_tpu.io import sd_weights


def test_export_cli_roundtrip(tmp_path, capsys):
    models = build_sd("sd2", "fp32", tiny=True)
    params = load_params(models, None, 64, 64, seed=3)

    src = str(tmp_path / "in.safetensors")
    sd, report = sd_weights.export_sd_checkpoint(params, models.unet.config)
    assert not report, report[:5]
    sd_weights.save_safetensors(sd, src, metadata={"format": "pt"})

    out = str(tmp_path / "out.safetensors")
    export_main(["--family", "sd2", "--ckpt", src, "--out", out,
                 "--debug_tiny", "--height", "64", "--width", "64"])
    assert "wrote" in capsys.readouterr().out

    a, b = sd_weights.load_safetensors(src), sd_weights.load_safetensors(out)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
