"""GLIDE training data: TSV manifest-of-manifests -> (image, tokens, mask, t, w[, low_res]).

Reference behavior (Taichu-GLIDE model/glide_text2im/train/image_datasets.py):
  * `image_caption_path_file` is a text file listing TSV manifests; each TSV
    row holds an image path and caption (:166-208),
  * center/random crop to image_size (:400-434),
  * text dropout p=0.2 -> empty tokens, training the CFG uncond branch
    (:287-289),
  * per-sample timestep + importance weight drawn in the loader (:293-294),
  * the super-res variant also yields a downsampled low_res conditioning
    image and resamples unreadable files (:352-396).
"""
from __future__ import annotations

import os
import random
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from minddiffusion_tpu.data import transforms
from minddiffusion_tpu.train.resample import UniformSampler


def read_manifests(image_caption_path_file: str) -> List[Tuple[str, str]]:
    """-> list of (image_path, caption)."""
    with open(image_caption_path_file) as f:
        manifest_paths = [l.strip() for l in f if l.strip()]
    pairs: List[Tuple[str, str]] = []
    for mp in manifest_paths:
        base = os.path.dirname(mp)
        with open(mp) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2:
                    continue
                img, caption = parts[0], parts[1]
                pairs.append((os.path.join(base, img), caption))
    return pairs


class GlideTextImageDataset:
    """Base-model training stream."""

    def __init__(
        self,
        pairs: List[Tuple[str, str]],
        encode_and_pad: Callable[[str], Tuple[np.ndarray, np.ndarray]],
        batch_size: int,
        image_size: int = 64,
        num_timesteps: int = 1000,
        text_drop_p: float = 0.2,
        empty_tokens: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        random_crop: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        super_res_size: Optional[int] = None,
    ):
        self.pairs = pairs[shard_index::shard_count]
        self.encode_and_pad = encode_and_pad
        self.batch_size = batch_size
        self.image_size = image_size
        self.text_drop_p = text_drop_p
        self.empty = empty_tokens or encode_and_pad("")
        self.random_crop = random_crop
        self.seed = seed
        self.sampler = UniformSampler(num_timesteps)
        self.super_res_size = super_res_size

    def __len__(self) -> int:
        return len(self.pairs) // self.batch_size

    def epoch(self, epoch_index: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = random.Random(self.seed + epoch_index)
        nprng = np.random.RandomState(self.seed + epoch_index)
        order = list(range(len(self.pairs)))
        rng.shuffle(order)
        imgs, toks, masks, lows = [], [], [], []
        for idx in order:
            path, caption = self.pairs[idx]
            try:
                img = transforms.preprocess_image(
                    path, self.image_size, self.random_crop, flip_p=0.0, rng=rng)
            except OSError:
                continue  # resample (image_datasets.py:353-358)
            if rng.random() < self.text_drop_p:
                tok, mask = self.empty
            else:
                tok, mask = self.encode_and_pad(caption)
            imgs.append(img)
            toks.append(np.asarray(tok, np.int32))
            masks.append(np.asarray(mask, np.int32))
            if self.super_res_size is not None:
                # low-res conditioning: box-downsample the crop
                f = self.image_size // self.super_res_size
                low = img.reshape(self.super_res_size, f, self.super_res_size, f, 3)
                lows.append(low.mean(axis=(1, 3)))
            if len(imgs) == self.batch_size:
                t, w = self.sampler.sample_np(nprng, self.batch_size)
                batch = {
                    "image": np.stack(imgs),
                    "tokens": np.stack(toks),
                    "mask": np.stack(masks),
                    "t": t,
                    "weights": w,
                }
                if lows:
                    batch["low_res"] = np.stack(lows).astype(np.float32)
                yield batch
                imgs, toks, masks, lows = [], [], [], []
