"""utils/flags: the centralized MDT_* surface (VERDICT r3 weak-4 contract).

Pins the structural guarantees of the r4/r5 flag hygiene:
  * every surviving env flag goes through utils/flags (snapshot rebuilt only
    when env changes), and the surface stays <= 9 variables (r5: the
    measured-negative MDT_GN_STATS / MDT_SD_TAIL / MDT_GLIDE_TUNE=tail
    kernels retired to benchmarks/research/, MDT_ATTN_BQ folded into the
    block_q call-site hint);
  * no `os.environ` reads exist anywhere under models/ (model forward paths
    read the resolved snapshot instead).
"""
import os
import pathlib

from minddiffusion_tpu.utils import flags as flags_mod
from minddiffusion_tpu.utils.flags import flags


def test_flag_surface_bounded():
    assert len(flags_mod._KEYS) <= 9, (
        "MDT_* surface grew past the 9-flag hygiene budget; consolidate "
        f"before adding: {flags_mod._KEYS}")


def test_no_environ_reads_in_models():
    root = pathlib.Path(flags_mod.__file__).resolve().parents[1] / "models"
    offenders = [p.name for p in root.glob("*.py")
                 if "os.environ" in p.read_text()]
    assert not offenders, (
        f"os.environ read inside models/ {offenders} — route it through "
        "utils/flags (resolved-once snapshot)")


def test_snapshot_rebuilds_on_env_change(monkeypatch):
    monkeypatch.delenv("MDT_WINO", raising=False)
    assert flags().wino is True
    monkeypatch.setenv("MDT_WINO", "0")
    assert flags().wino is False
    f1 = flags()
    assert flags() is f1  # unchanged env -> cached object
    monkeypatch.setenv("MDT_WINO", "1")
    assert flags().wino is True


def test_defaults_are_shipped_config(monkeypatch):
    for k in flags_mod._KEYS:
        monkeypatch.delenv(k, raising=False)
    f = flags()
    # the shipped defaults (measured winners stay on, measured losses off)
    assert f.wino and f.split_concat and f.merge_aligned and f.fused_up
    assert f.cfg_dedup and f.hoist and f.srgan_s2d
    assert f.glide_skip_join == "concat"
    assert f.wino_hmax is None


def test_retired_flags_stay_retired():
    # r5 retirement: the measured-negative kernel flags must not creep back
    # (their kernels live in benchmarks/research/ with STATUS records)
    for retired in ("MDT_GN_STATS", "MDT_SD_TAIL", "MDT_ATTN_BQ"):
        assert retired not in flags_mod._KEYS, (
            f"{retired} was retired in r5 (measured-negative at every "
            "scope); see benchmarks/research/ before re-adding")


def test_bad_values_raise(monkeypatch):
    import pytest

    monkeypatch.setenv("MDT_GLIDE_TUNE", "tail=1")  # retired key
    with pytest.raises(ValueError, match="MDT_GLIDE_TUNE"):
        flags()
    monkeypatch.setenv("MDT_GLIDE_TUNE", "")
    monkeypatch.setenv("MDT_WINO_TUNE", "bogus_key=1")
    with pytest.raises(ValueError):
        flags()
