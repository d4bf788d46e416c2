"""Style image datasets.

Rebuild of ``/root/reference/data/style_dataset.py:12-78``:

  * ``SingleImage`` — one style image resized to the train frames' longer edge,
    cycled forever.
  * ``WikiartDataset`` — multi-style corpus with random resized crops; the
    reference declares this but gates it behind NotImplementedError
    (trainers/style.py:56-62).  Fully implemented here.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..core.types import DatasetSplit
from .. import utils


class SingleImage:
    def __init__(self, image_path: Path, longer_edge: Optional[int] = None):
        self.image_name = Path(image_path).name
        self.style_image = utils.parse_rgb(image_path, size=longer_edge)  # [3, H, W]

    def __getitem__(self, _):
        return self.style_image

    def __len__(self):
        return 1

    def __str__(self) -> str:
        return f'single style image "{self.image_name}"'


class WikiartDataset:
    """Multi-style training corpus: random square crops of ~half the image,
    resized to ``crop_size`` (style_dataset.py:51-55 uses RandomResizedCrop
    (256, scale=(0.4, 0.6), ratio=(1, 1)))."""

    def __init__(
        self,
        root_path: str,
        split: DatasetSplit,
        max_images: Optional[int] = 100,
        fix_id: Optional[int] = None,
        crop_size: int = 256,
        seed: int = 0,
    ):
        self.root_dir = Path(root_path)
        self.split = split
        img_dir = self.root_dir / split.name.lower()
        self.paths = sorted(img_dir.glob("*.jpg"))
        if max_images is not None:
            self.paths = self.paths[:max_images]
        self.fix_id = fix_id
        self.crop_size = crop_size
        self._rng = np.random.default_rng(seed)

    def __getitem__(self, index: int) -> np.ndarray:
        from PIL import Image

        if self.fix_id is not None:
            index = self.fix_id
        img = Image.open(self.paths[index]).convert("RGB")
        w, h = img.size
        # Random square crop covering 40-60% of the area, then resize.
        scale = self._rng.uniform(0.4, 0.6)
        side = int(round((scale * w * h) ** 0.5))
        side = min(side, w, h)
        x0 = int(self._rng.integers(0, max(1, w - side + 1)))
        y0 = int(self._rng.integers(0, max(1, h - side + 1)))
        img = img.crop((x0, y0, x0 + side, y0 + side)).resize(
            (self.crop_size, self.crop_size)
        )
        arr = np.asarray(img, np.float32) / 255.0
        return np.moveaxis(arr, -1, 0)

    def __len__(self):
        if self.fix_id is not None:
            return 1
        return len(self.paths)

    def __str__(self) -> str:
        split_str = ["train", "validation", "test"][self.split.value]
        return f"WikiartDataset {split_str} split with {len(self)} entries"
