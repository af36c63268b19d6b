from minddiffusion_tpu.utils.config import (
    instantiate_from_config,
    parse_with_config,
    set_random_seed,
)
from minddiffusion_tpu.utils.logger import KVLogger, profile_kv

__all__ = [
    "instantiate_from_config",
    "parse_with_config",
    "set_random_seed",
    "KVLogger",
    "profile_kv",
]
