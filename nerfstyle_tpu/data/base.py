"""Dataset base class (template method pattern).

Rebuild of ``/root/reference/data/base_dataset.py:15-159``.  Host-side numpy
only; the trainer moves batches to device.  No torch DataLoader: iteration is a
plain shuffled index generator (the reference uses batch_size=None loaders with
zero workers anyway, trainers/base.py:129-134).
"""

from __future__ import annotations

from abc import ABC
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..config import DatasetConfig
from ..core.types import BBox, DatasetSplit, Intrinsics
from .. import utils


class BaseDataset(ABC):
    fns: List[str]
    images: Optional[np.ndarray]  # [N, 3, H, W] float32
    poses: np.ndarray  # [N, 4, 4] float32
    bbox: BBox
    intr: Intrinsics
    seg_groups: Optional[np.ndarray]  # [N, H, W] float32 (train split only)
    num_classes: int
    has_gt: bool

    def __init__(
        self,
        cfg: DatasetConfig,
        split: DatasetSplit,
        max_count: Optional[int] = None,
    ):
        self.cfg = cfg
        self.split = split
        self.max_count = max_count

        assert Path(cfg.root_path).exists(), f'Root path "{cfg.root_path}" does not exist'

        # Poses, scaled (base_dataset.py:61-64)
        self.poses = self._get_poses().astype(np.float32)
        assert self.poses.ndim == 3 and self.poses.shape[1:] == (4, 4)
        self.poses[:, :3, 3] *= cfg.scale

        # Images with alpha-to-white (base_dataset.py:67-79)
        image_paths = self._get_image_paths()
        self.has_gt = image_paths is not None
        if self.has_gt:
            self.fns = [Path(p).stem for p in image_paths]
            if len(set(self.fns)) != len(self.fns):
                self.fns = [Path(p).parent.stem + "_" + Path(p).stem for p in image_paths]
            self.images = np.stack([utils.parse_rgb(p) for p in image_paths])
            if self.images.shape[1] == 4:
                rgb, alpha = self.images[:, :3], self.images[:, 3:]
                self.images = rgb * alpha + (1 - alpha)
            assert len(self.images) == len(self.poses)
        else:
            self.images = None
            w = len(str(len(self)))
            self.fns = ["frame_{:0{w}d}".format(i, w=w) for i in range(len(self))]

        # Segment groups: train split only, class ids must be contiguous
        # (base_dataset.py:86-95)
        self.seg_groups, self.num_classes = None, 0
        if split == DatasetSplit.TRAIN:
            self.seg_groups = self._get_seg_groups()
            if self.seg_groups is not None:
                unique = np.unique(self.seg_groups)
                if unique[0] < 0:
                    unique = unique[1:]
                self.num_classes = len(unique)
                assert self.seg_groups.shape[-2:] == self.images.shape[-2:]
                assert np.all(unique == np.arange(self.num_classes)), (
                    "segment group ids must be contiguous starting at 0"
                )

        # Color transfer (base_dataset.py:98-105)
        if cfg.ct_image is not None and self.images is not None:
            style = utils.parse_rgb(cfg.ct_image)
            transferred, _ = utils.match_colors_for_image_set(
                np.moveaxis(self.images, 1, -1), np.moveaxis(style, 0, -1)
            )
            self.images = np.moveaxis(transferred, -1, 1)

        # Uniform frame subsampling (base_dataset.py:107-120)
        if self.max_count is not None and self.max_count < len(self):
            assert self.max_count > 0, 'Invalid value for "max_count"'
            ids = np.round(np.linspace(0, len(self), self.max_count + 1)[:-1]).astype(int)
            self.fns = [self.fns[i] for i in ids]
            self.poses = self.poses[ids]
            if self.has_gt:
                self.images = self.images[ids]
            if self.seg_groups is not None:
                self.seg_groups = self.seg_groups[ids]

        self.intr = self._get_intr()
        self.bbox = BBox.from_radius(cfg.bound)

    # Template hooks (base_dataset.py:128-138)
    def _get_image_paths(self) -> Optional[List[Path]]:
        raise NotImplementedError

    def _get_poses(self) -> np.ndarray:
        raise NotImplementedError

    def _get_seg_groups(self) -> Optional[np.ndarray]:
        return None

    def _get_intr(self) -> Intrinsics:
        raise NotImplementedError

    def __getitem__(self, index: int):
        """Returns (image [C(+1), H, W] or None, pose [4, 4]); the seg map rides
        as a 4th channel (base_dataset.py:140-148)."""
        if self.seg_groups is not None:
            seg = self.seg_groups[index].astype(np.float32)
            image = np.concatenate([self.images[index], seg[None]], axis=0)
            return image, self.poses[index]
        if self.has_gt:
            return self.images[index], self.poses[index]
        return None, self.poses[index]

    def __len__(self):
        return len(self.poses)

    def iter_shuffled(self, seed: int = 0):
        """Infinite shuffled iteration (replaces DataLoader(shuffle=True) +
        utils.cycle, trainers/base.py:129)."""
        for _i, item in self.iter_shuffled_indexed(seed):
            yield item

    def iter_shuffled_indexed(self, seed: int = 0):
        """:meth:`iter_shuffled`, yielding ``(dataset_index, item)`` — the
        index keys per-pose host caches (e.g. the style stage's per-window
        marching demand, which is constant per pose while density is
        frozen)."""
        rng = np.random.default_rng(seed)
        while True:
            for i in rng.permutation(len(self)):
                yield int(i), self[int(i)]

    def __str__(self) -> str:
        split_str = ["train", "validation", "test"][self.split.value]
        return (
            f'{type(self).__name__} "{Path(self.cfg.root_path).stem}" '
            f"{split_str} split with {len(self)} entries"
        )
