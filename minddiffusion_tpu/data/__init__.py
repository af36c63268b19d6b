from minddiffusion_tpu.data.dataset import TextImageDataset, load_data
from minddiffusion_tpu.data.dataset_db import DreamBoothDataset

__all__ = ["TextImageDataset", "load_data", "DreamBoothDataset"]
