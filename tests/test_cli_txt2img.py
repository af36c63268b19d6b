"""txt2img CLI smoke: the full user entry (parse -> build -> tokenize ->
jitted pipeline -> PNG writes -> per-batch timing print, the reference's
only perf hook, txt2img.py:280-281) on the --debug_tiny model."""
import os

from minddiffusion_tpu.cli.txt2img import main as txt2img_main


def test_txt2img_cli_end_to_end(tmp_path, capsys):
    outdir = str(tmp_path / "samples")
    paths = txt2img_main([
        "--prompt", "a photo of an astronaut riding a horse",
        "--negative_prompt", "blurry",
        "--debug_tiny", "--H", "64", "--W", "64",
        "--sampling_steps", "3", "--sampler", "ddim",
        "--n_samples", "2", "--n_iter", "2",
        "--outdir", outdir,
    ])
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    assert all(p.endswith(".png") for p in paths)
    out = capsys.readouterr().out
    # reference parity: the per-batch wall-clock print
    assert out.count("the infer time of a batch is") == 2
