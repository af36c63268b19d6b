"""Text-image training data: CSV manifests -> prefetched numpy batches.

Reference contract (wukong-huahua/ldm/data/dataset.py:31-120): `data_path`
holds images plus `*.csv` manifests with `dir` (relative image path) and
`text` (caption) columns; small images are filtered by `image_filter_size`;
each sample is (image fp32 [-1,1], tokens int32 77).

TPU-first inversions vs the reference's hand-rolled BatchSampler/DataLoader/
MetaLoader stack (dataset.py:209-340):
  * deterministic per-host sharding by (jax.process_index, process_count)
    instead of RANK_ID env parsing,
  * a background-thread prefetch queue keeps the host ahead of the device,
  * batches are plain numpy dicts ready for jax.device_put with a
    NamedSharding — no framework dataset object in between.
"""
from __future__ import annotations

import os
import queue
import random
import threading
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

from minddiffusion_tpu.data import transforms


def list_image_files_captions(data_path: str) -> Tuple[List[str], List[str]]:
    csvs = sorted(
        os.path.join(data_path, f) for f in os.listdir(data_path) if f.endswith(".csv")
    )
    if not csvs:
        raise ValueError(f"no .csv manifests under {data_path}")
    images, captions = [], []
    for path in csvs:
        df = pd.read_csv(path)
        images.extend(os.path.join(data_path, str(p)) for p in df["dir"])
        captions.extend(str(t) for t in df["text"])
    return images, captions


def filter_small_images(images: List[str], captions: List[str], min_size: int,
                        workers: int = 32, cache_dir: Optional[str] = None,
                        ) -> Tuple[List[str], List[str]]:
    """Drop images whose short side is < min_size.

    Header-only dimension reads are IO-bound, so they run on a thread pool
    (the reference stat-opens serially: wukong ldm/data/dataset.py:48-64 —
    painful at multi-million-row manifests). The keep-mask is memoized to a
    sidecar file keyed on (min_size, row count) so warm restarts skip the
    sweep entirely.
    """
    cache_path = None
    if cache_dir is not None:
        cache_path = os.path.join(
            cache_dir, f".filter_cache_{min_size}_{len(images)}.npy")
        if os.path.exists(cache_path):
            keep = np.load(cache_path)
            if keep.shape[0] == len(images):
                return ([im for im, k in zip(images, keep) if k],
                        [c for c, k in zip(captions, keep) if k])

    def check(img: str) -> bool:
        try:
            w, h = transforms.image_dims(img)
        except OSError:
            return False
        return min(w, h) >= min_size

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as pool:
        keep = list(pool.map(check, images, chunksize=256))

    if cache_path is not None:
        try:
            np.save(cache_path, np.asarray(keep, bool))
        except OSError:
            pass
    return ([im for im, k in zip(images, keep) if k],
            [c for c, k in zip(captions, keep) if k])


class TextImageDataset:
    """Iterable over epochs of {image, tokens} batches, host-sharded."""

    def __init__(
        self,
        images: List[str],
        captions: List[str],
        tokenize: Callable[[List[str]], np.ndarray],
        batch_size: int,
        image_size: int = 512,
        random_crop: bool = False,
        flip_p: float = 0.5,
        seed: int = 0,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
        prefetch: int = 2,
    ):
        if shard_index is None or shard_count is None:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        # deterministic contiguous-stride shard (replaces DataLoader's
        # RANK_ID slicing, dataset.py:259-261)
        self.images = images[shard_index::shard_count]
        self.captions = captions[shard_index::shard_count]
        self.tokenize = tokenize
        self.batch_size = batch_size
        self.image_size = image_size
        self.random_crop = random_crop
        self.flip_p = flip_p
        self.seed = seed
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.images) // self.batch_size

    def _load_one(self, idx: int, rng: random.Random) -> Optional[np.ndarray]:
        try:
            return transforms.preprocess_image(
                self.images[idx], self.image_size, self.random_crop,
                self.flip_p, rng)
        except OSError:
            return None  # unreadable image: resample (GLIDE behavior,
            # image_datasets.py:353-358)

    def epoch(self, epoch_index: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = random.Random(self.seed + epoch_index)
        order = list(range(len(self.images)))
        rng.shuffle(order)

        def produce(out_q: queue.Queue):
            batch_imgs, batch_caps = [], []
            for idx in order:
                img = self._load_one(idx, rng)
                if img is None:
                    continue
                batch_imgs.append(img)
                batch_caps.append(self.captions[idx])
                if len(batch_imgs) == self.batch_size:
                    out_q.put({
                        "image": np.stack(batch_imgs),
                        "tokens": np.asarray(self.tokenize(batch_caps), np.int32),
                    })
                    batch_imgs, batch_caps = [], []
            out_q.put(None)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def load_data(
    data_path: str,
    batch_size: int,
    tokenize: Callable,
    image_size: int = 512,
    image_filter_size: int = 256,
    random_crop: bool = False,
    filter_small_size: bool = True,
    seed: int = 0,
    **kw,
) -> TextImageDataset:
    """Reference load_data surface (dataset.py:31-74)."""
    images, captions = list_image_files_captions(data_path)
    if filter_small_size:
        images, captions = filter_small_images(
            images, captions, image_filter_size, cache_dir=data_path)
    if not images:
        raise ValueError("no usable images after filtering")
    return TextImageDataset(
        images, captions, tokenize, batch_size, image_size=image_size,
        random_crop=random_crop, seed=seed, **kw)
