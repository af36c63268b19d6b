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


def test_yaml_model_configs_instantiate():
    """Every shipped YAML config's model target must build (tiny dtype check
    only, no params initialized)."""
    import glob

    from minddiffusion_tpu.utils.config import instantiate_from_config, load_yaml

    for path in glob.glob("configs/*.yaml"):
        cfg = load_yaml(path)
        obj = instantiate_from_config(cfg["model"])
        assert obj is not None, path
