"""Config/flag system unifying the reference's three mechanisms (SURVEY.md §5.6):

1. argparse CLI flags (every entry point),
2. JSON train-config overlay where a JSON value fills any flag the user did
   not pass explicitly on the command line (parse_with_config semantics,
   stablediffusionv2/ldm/modules/train/tools.py:38-49),
3. YAML model configs with `target:` dotted class paths instantiated
   reflectively (ldm/util.py:37-52), via PyYAML instead of OmegaConf.
"""
from __future__ import annotations

import argparse
import importlib
import json
import random
import sys
from typing import Any

import numpy as np
import yaml


def parse_with_config(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """Parse args; if --config points at a JSON file, use its values for every
    flag NOT explicitly present on the command line."""
    args = parser.parse_args(argv)
    config_path = getattr(args, "config", None)
    if config_path:
        with open(config_path) as f:
            data = json.load(f)
        argv = sys.argv[1:] if argv is None else argv
        given = {a.split("=")[0].lstrip("-").replace("-", "_")
                 for a in argv if a.startswith("-")}
        for k, v in data.items():
            if k not in given and hasattr(args, k):
                setattr(args, k, v)
    return args


def get_obj_from_str(path: str) -> Any:
    module, cls = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def instantiate_from_config(config: dict) -> Any:
    """{"target": "pkg.mod.Class", "params": {...}} -> Class(**params)."""
    if "target" not in config:
        raise KeyError(f"config has no target: {config}")
    return get_obj_from_str(config["target"])(**config.get("params", {}))


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def set_random_seed(seed: int) -> None:
    """Host-side RNG seeding (device RNG is explicit jax.random keys)."""
    random.seed(seed)
    np.random.seed(seed)
