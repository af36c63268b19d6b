"""Data pipeline + config/logger unit tests (synthetic images on disk)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from minddiffusion_tpu.data import load_data
from minddiffusion_tpu.data.dataset_db import DreamBoothDataset
from minddiffusion_tpu.utils.config import parse_with_config, instantiate_from_config
from minddiffusion_tpu.utils.logger import KVLogger


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(10):
        name = f"im_{i}.png"
        Image.fromarray(rng.randint(0, 255, (200, 180, 3), np.uint8)).save(d / name)
        rows.append(f"{name},caption {i}")
    Image.fromarray(rng.randint(0, 255, (50, 50, 3), np.uint8)).save(d / "tiny.png")
    rows.append("tiny.png,too small")
    (d / "anno.csv").write_text("dir,text\n" + "\n".join(rows) + "\n")
    return str(d)


def fake_tokenize(texts):
    return np.ones((len(texts), 8), np.int32)


def test_load_data_filters_shards_batches(data_dir):
    ds = load_data(data_dir, batch_size=4, tokenize=fake_tokenize,
                   image_size=64, image_filter_size=128,
                   shard_index=0, shard_count=1, seed=1)
    assert len(ds.images) == 10  # tiny.png filtered
    batches = list(ds.epoch(0))
    assert len(batches) == 2  # drop remainder
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["image"].dtype == np.float32
    assert -1.0 <= b["image"].min() and b["image"].max() <= 1.0
    assert b["tokens"].shape == (4, 8)
    # epoch shuffling is deterministic per (seed, epoch)
    again = list(load_data(data_dir, batch_size=4, tokenize=fake_tokenize,
                           image_size=64, image_filter_size=128,
                           shard_index=0, shard_count=1, seed=1).epoch(0))
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])


def test_sharding_partitions_data(data_dir):
    ds0 = load_data(data_dir, batch_size=1, tokenize=fake_tokenize,
                    image_size=64, image_filter_size=128,
                    shard_index=0, shard_count=2)
    ds1 = load_data(data_dir, batch_size=1, tokenize=fake_tokenize,
                    image_size=64, image_filter_size=128,
                    shard_index=1, shard_count=2)
    assert len(ds0.images) == 5 and len(ds1.images) == 5
    assert set(ds0.images).isdisjoint(ds1.images)


def test_dreambooth_dataset(data_dir):
    ds = DreamBoothDataset(data_dir, data_dir, token="sks", class_word="dog",
                           tokenize=lambda t: np.full((len(t), 8), 7, np.int32),
                           batch_size=2, image_size=32, train_data_repeats=2)
    batch = next(ds.epoch(0))
    assert set(batch) == {"image", "tokens", "reg_image", "reg_tokens"}
    assert batch["image"].shape == (2, 32, 32, 3)


def test_parse_with_config_overlay(tmp_path):
    import argparse

    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"lr": 0.5, "steps": 9}))
    p = argparse.ArgumentParser()
    p.add_argument("--config")
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=1)
    # explicit CLI flag wins over JSON; unset flag takes JSON value
    args = parse_with_config(p, ["--config", str(cfg), "--lr", "0.9"])
    assert args.lr == 0.9
    assert args.steps == 9


def test_instantiate_from_config():
    obj = instantiate_from_config(
        {"target": "collections.OrderedDict", "params": {}})
    from collections import OrderedDict

    assert isinstance(obj, OrderedDict)


def test_kv_logger_mean_and_dump(tmp_path):
    lg = KVLogger(str(tmp_path), formats=("json",))
    lg.logkv("step", 5)
    lg.logkv_mean("loss", 1.0)
    lg.logkv_mean("loss", 3.0)
    out = lg.dumpkvs()
    assert out["loss"] == 2.0 and out["step"] == 5
    logged = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert logged[0]["loss"] == 2.0
    # state cleared
    assert lg.dumpkvs() == {}


def test_inpaint_cli_aug_selection():
    """cli/inpaint._aug_func mirrors the reference's crop/resize/resizecrop
    preprocessing (wukong-huahua/inpaint.py:161-184): crop centres an HxW
    window on the mask (clipped inside the image); resizecrop sizes the
    window so the mask spans mask_ratio of it, then scales to HxW."""
    import argparse

    from minddiffusion_tpu.cli.inpaint import _aug_func

    img = Image.fromarray(np.zeros((300, 400, 3), np.uint8))
    mask_arr = np.zeros((300, 400, 3), np.uint8)
    mask_arr[100:140, 200:260] = 255  # mask centred at (x=230, y=120)
    mask = Image.fromarray(mask_arr)

    ns = lambda aug: argparse.Namespace(aug=aug, H=128, W=128, mask_ratio=0.75)
    assert _aug_func(ns("resize"), img, mask)(img).size == (128, 128)
    assert _aug_func(ns("none"), img, mask)(img).size == (400, 300)

    cropped_mask = _aug_func(ns("crop"), img, mask)(mask)
    assert cropped_mask.size == (128, 128)
    # the 128x128 window centred at (230, 120) covers the whole mask blob
    assert (np.asarray(cropped_mask)[:, :, 0] > 127).sum() == 40 * 60

    rc = _aug_func(ns("resizecrop"), img, mask)
    out = rc(mask)
    assert out.size == (128, 128)
    # window = ceil(mask_range / ratio) = ceil(59/0.75) = 79px, then scaled
    # up to 128 — the mask fills a larger fraction than in the plain crop
    frac = (np.asarray(out)[:, :, 0] > 127).mean()
    assert 0.25 < frac < 0.65

    empty = Image.fromarray(np.zeros((300, 400, 3), np.uint8))
    with pytest.raises(SystemExit):
        _aug_func(ns("crop"), img, empty)


def test_kv_logger_tensorboard_writer(tmp_path):
    """The from-scratch TensorBoard events writer must produce files TF's own
    parser accepts: TFRecord framing with masked CRC32C + Event/Summary
    protos (reference logger.py:160-198 uses TF's EventsWriter; ours encodes
    the same format with zero TF dependency)."""
    import glob
    import struct

    lg = KVLogger(str(tmp_path), formats=("tensorboard",))
    lg.logkv("step", 3)
    lg.logkv("loss", 0.5)
    lg.logkv("note", "non-numeric, must be skipped")
    lg.dumpkvs()
    lg.logkv("loss", 0.25)
    lg.dumpkvs()

    (path,) = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))

    # independent framing check (mirrors the TFRecord spec, not our code)
    from minddiffusion_tpu.utils.logger import _masked_crc

    records = []
    raw = open(path, "rb").read()
    off = 0
    while off < len(raw):
        (n,) = struct.unpack("<Q", raw[off:off + 8])
        (lc,) = struct.unpack("<I", raw[off + 8:off + 12])
        assert lc == _masked_crc(raw[off:off + 8])
        payload = raw[off + 12:off + 12 + n]
        (dc,) = struct.unpack("<I", raw[off + 12 + n:off + 16 + n])
        assert dc == _masked_crc(payload)
        records.append(payload)
        off += 16 + n
    assert len(records) == 3  # file-version header + 2 dumps

    # TF's own proto parser must accept every record
    event_pb2 = pytest.importorskip("tensorboard.compat.proto.event_pb2")
    ev0 = event_pb2.Event.FromString(records[0])
    assert ev0.file_version == "brain.Event:2"
    ev1 = event_pb2.Event.FromString(records[1])
    kvs = {v.tag: v.simple_value for v in ev1.summary.value}
    assert kvs["loss"] == 0.5 and kvs["step"] == 3.0
    assert "note" not in kvs and ev1.step == 3
    ev2 = event_pb2.Event.FromString(records[2])
    assert {v.tag: v.simple_value for v in ev2.summary.value}["loss"] == 0.25
    assert ev2.step == 4  # auto-increment when no step kv


def test_yaml_model_configs_instantiate():
    """Every shipped YAML config's model target must build (tiny dtype check
    only, no params initialized)."""
    import glob

    from minddiffusion_tpu.utils.config import instantiate_from_config, load_yaml

    for path in glob.glob("configs/*.yaml"):
        cfg = load_yaml(path)
        obj = instantiate_from_config(cfg["model"])
        assert obj is not None, path
