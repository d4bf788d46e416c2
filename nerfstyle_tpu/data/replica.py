"""Replica indoor-scene dataset.

The reference defines a ``ReplicaConfig`` schema (``/root/reference/config.py:260-275``)
but ships no ``data/replica_dataset.py`` — BASELINE.json lists Replica as a
stretch config.  This implementation is written from that schema plus the
coordinate helpers (``utils/matrix.py``), targeting the common Semantic-NeRF
style Replica render layout:

    <root>/<replica_cfg.name>/Sequence_<traj_id>/rgb/rgb_<i>.png
    <root>/<replica_cfg.name>/Sequence_<traj_id>/traj_w_c.txt   (N x 16 floats)
    <root>/<seg_name>/<fn>_seg.npz                              (optional)

Config semantics honored: ``focal_ratio`` (focal = side length * ratio),
``traj_ids`` (trajectories composing the scene), ``black2white`` (map pure
black pixels to white).  Train/test split follows utils.train_test_split with
every-8th frame held out.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from ..config import DatasetConfig
from ..core.types import DatasetSplit, Intrinsics
from ..core.poses import convert_poses
from ..utils import train_test_split
from .base import BaseDataset

_SPLIT_EVERY = 8


class ReplicaDataset(BaseDataset):
    def __init__(
        self,
        cfg: DatasetConfig,
        split: DatasetSplit,
        max_count: Optional[int] = None,
    ):
        assert cfg.replica_cfg is not None, "Replica dataset needs replica_cfg"
        self.rcfg = cfg.replica_cfg
        self.scene_dir = Path(cfg.root_path) / self.rcfg.name

        paths: List[Path] = []
        poses: List[np.ndarray] = []
        for traj in self.rcfg.traj_ids:
            seq_dir = self.scene_dir / f"Sequence_{traj}"
            traj_file = seq_dir / "traj_w_c.txt"
            mats = np.loadtxt(traj_file).reshape(-1, 4, 4).astype(np.float32)
            rgb_paths = sorted((seq_dir / "rgb").glob("rgb_*.png"),
                               key=lambda p: int(p.stem.split("_")[-1]))
            assert len(rgb_paths) == len(mats), (
                f"pose/image count mismatch in {seq_dir}"
            )
            paths += rgb_paths
            poses.append(mats)
        all_poses = np.concatenate(poses)

        ids = train_test_split(len(paths), _SPLIT_EVERY, split == DatasetSplit.TRAIN)
        self._image_paths = [paths[i] for i in ids]
        # Replica trajectories are RDF-camera in an RFU world.
        self._poses = convert_poses(all_poses[ids], w_coord="rfu", c_coord="rdf")

        super().__init__(cfg, split, max_count)

        if self.rcfg.black2white and self.images is not None:
            black = np.all(self.images < 1e-3, axis=1, keepdims=True)
            self.images = np.where(black, 1.0, self.images)

    def _get_image_paths(self) -> Optional[List[Path]]:
        return self._image_paths

    def _get_poses(self) -> np.ndarray:
        return self._poses

    def _get_seg_groups(self) -> Optional[np.ndarray]:
        seg_paths = [
            Path(self.cfg.root_path) / self.cfg.seg_name / f"{fn}_seg.npz"
            for fn in self.fns
        ]
        if not all(p.exists() for p in seg_paths):
            return None
        return np.stack([np.load(p)["seg_map"] for p in seg_paths]).astype(np.float32)

    def _get_intr(self) -> Intrinsics:
        from PIL import Image

        with Image.open(self._image_paths[0]) as im:
            w, h = im.size
        focal = max(w, h) * self.rcfg.focal_ratio
        return Intrinsics(h=h, w=w, fx=focal, fy=focal, cx=w / 2.0, cy=h / 2.0)
