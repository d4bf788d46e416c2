"""LLFF dataset (torch-ngp preprocessed transforms_*.json layout).

Rebuild of ``/root/reference/data/llff_dataset.py:12-53``: poses + intrinsics
from ``transforms_{split}.json``; the test split ships poses only (no GT);
segmentation group maps load from ``<root>/<seg_name>/<fn>_seg.npz``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..config import DatasetConfig
from ..core.types import DatasetSplit, Intrinsics
from .base import BaseDataset


class LLFFDataset(BaseDataset):
    def __init__(
        self,
        cfg: DatasetConfig,
        split: DatasetSplit,
        max_count: Optional[int] = None,
    ):
        self.root = Path(cfg.root_path)
        split_path = self.root / f"transforms_{split.name.lower()}.json"
        with open(split_path, "r") as f:
            self.split_json = json.load(f)
        super().__init__(cfg, split, max_count)

    def _get_image_paths(self) -> Optional[List[Path]]:
        if self.split == DatasetSplit.TEST:
            return None  # test split has poses only (llff_dataset.py:28-30)
        return [self.root / f["file_path"] for f in self.split_json["frames"]]

    def _get_seg_groups(self) -> Optional[np.ndarray]:
        seg_paths = [
            self.root / self.cfg.seg_name / f"{fn}_seg.npz" for fn in self.fns
        ]
        if not all(p.exists() for p in seg_paths):
            return None
        segs = np.stack([np.load(p)["seg_map"] for p in seg_paths])
        return segs.astype(np.float32)

    def _get_poses(self) -> np.ndarray:
        poses = [f["transform_matrix"] for f in self.split_json["frames"]]
        return np.array(poses, dtype=np.float32)

    def _get_intr(self) -> Intrinsics:
        j = self.split_json
        return Intrinsics(
            h=int(j["h"]), w=int(j["w"]),
            fx=j["fl_x"], fy=j["fl_y"], cx=j["cx"], cy=j["cy"],
        )
