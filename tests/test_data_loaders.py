"""Data-layer loaders against synthesized on-disk layouts.

LLFF mirrors the torch-ngp transforms_*.json layout the reference consumes
(/root/reference/data/llff_dataset.py:12-53); Replica follows the
Semantic-NeRF render layout data/replica.py documents; Wikiart is a directory
of jpgs.  Also sanity-checks the legacy stratified sampling oracle
(nerf_lib.py:144-219 rebuild).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from nerfstyle_tpu import utils
from nerfstyle_tpu.config import DatasetConfig, ReplicaConfig
from nerfstyle_tpu.core.types import DatasetSplit
from nerfstyle_tpu.data import get_dataset


def _write_png(path: Path, h: int, w: int, seed: int):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32)
    path.parent.mkdir(parents=True, exist_ok=True)
    utils.save_image(img, path)
    return img


class TestLLFF:
    @pytest.fixture()
    def llff_root(self, tmp_path):
        root = tmp_path / "room"
        h, w = 12, 16
        frames = []
        for i in range(4):
            fn = f"images_8/image{i:03d}.png"
            _write_png(root / fn, h, w, i)
            pose = np.eye(4)
            pose[2, 3] = 2.0 + 0.1 * i
            frames.append({"file_path": fn, "transform_matrix": pose.tolist()})
        meta = {"h": h, "w": w, "fl_x": 20.0, "fl_y": 20.0, "cx": 8.0, "cy": 6.0,
                "frames": frames}
        (root / "transforms_train.json").write_text(json.dumps(meta))
        test_meta = {**meta, "frames": frames[:2]}
        (root / "transforms_test.json").write_text(json.dumps(test_meta))
        # seg maps for the train split
        seg_dir = root / "seg"
        seg_dir.mkdir()
        for i in range(4):
            seg = np.zeros((h, w), np.int64)
            seg[:, : w // 2] = 1
            np.savez(seg_dir / f"image{i:03d}_seg.npz", seg_map=seg)
        return root

    def test_train_split_loads_images_and_segs(self, llff_root):
        cfg = DatasetConfig(type="LLFF", root_path=llff_root, seg_name="seg",
                            bound=2.0, scale=1.0)
        ds = get_dataset(cfg, split=DatasetSplit.TRAIN)
        assert len(ds) == 4
        assert ds.num_classes == 2
        img, pose = ds[0]
        assert img.shape == (4, 12, 16)  # rgb + seg channel
        assert pose.shape == (4, 4)
        assert ds.intr.w == 16 and ds.intr.h == 12

    def test_test_split_has_poses_only(self, llff_root):
        cfg = DatasetConfig(type="LLFF", root_path=llff_root, seg_name="seg",
                            bound=2.0, scale=1.0)
        ds = get_dataset(cfg, split=DatasetSplit.TEST)
        assert len(ds) == 2
        assert not ds.has_gt
        img, pose = ds[0]
        assert img is None and pose.shape == (4, 4)


class TestReplica:
    @pytest.fixture()
    def replica_root(self, tmp_path):
        root = tmp_path / "replica"
        scene = root / "office_0" / "Sequence_1"
        n = 10
        mats = []
        for i in range(n):
            _write_png(scene / "rgb" / f"rgb_{i}.png", 8, 10, i)
            m = np.eye(4)
            m[0, 3] = 0.1 * i
            mats.append(m.reshape(-1))
        np.savetxt(scene / "traj_w_c.txt", np.stack(mats))
        return root

    def test_split_and_intrinsics(self, replica_root):
        cfg = DatasetConfig(
            type="Replica", root_path=replica_root, bound=2.0, scale=1.0,
            replica_cfg=ReplicaConfig(name="office_0", focal_ratio=0.5,
                                      traj_ids=[1]),
        )
        train = get_dataset(cfg, split=DatasetSplit.TRAIN)
        test = get_dataset(cfg, split=DatasetSplit.TEST)
        # every 8th frame held out
        assert len(train) + len(test) == 10
        assert len(test) == 2  # frames 0 and 8
        img, pose = train[0]
        assert img.shape[0] == 3  # no segs supplied
        assert train.intr.fx == pytest.approx(10 * 0.5)

    def test_black2white(self, replica_root):
        # overwrite one image with pure black
        p = replica_root / "office_0" / "Sequence_1" / "rgb" / "rgb_1.png"
        utils.save_image(np.zeros((8, 10, 3), np.float32), p)
        cfg = DatasetConfig(
            type="Replica", root_path=replica_root, bound=2.0, scale=1.0,
            replica_cfg=ReplicaConfig(name="office_0", focal_ratio=1.0,
                                      traj_ids=[1], black2white=True),
        )
        train = get_dataset(cfg, split=DatasetSplit.TRAIN)
        img, _ = train[0]  # frame 1 is the first train frame
        assert float(np.asarray(img).min()) == pytest.approx(1.0)


class TestWikiart:
    def test_crops_are_fixed_size(self, tmp_path):
        from nerfstyle_tpu.data.style import WikiartDataset
        from PIL import Image

        d = tmp_path / "wikiart" / "train"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(3):
            arr = (rng.uniform(0, 255, size=(40, 50, 3))).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.jpg")

        ds = WikiartDataset(tmp_path / "wikiart", DatasetSplit.TRAIN, crop_size=32)
        assert len(ds) == 3
        for i in range(3):
            crop = ds[i]
            assert crop.shape == (3, 32, 32)
            assert 0.0 <= crop.min() and crop.max() <= 1.0

    def test_fix_id(self, tmp_path):
        from nerfstyle_tpu.data.style import WikiartDataset
        from PIL import Image

        d = tmp_path / "wikiart" / "train"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(np.full((40, 40, 3), i * 200, np.uint8)).save(
                d / f"img{i}.jpg"
            )
        ds = WikiartDataset(tmp_path / "wikiart", DatasetSplit.TRAIN,
                            fix_id=1, crop_size=16)
        assert len(ds) == 1
        assert ds[0].mean() > 0.5  # always the bright image


class TestStratifiedOracle:
    def test_integrates_constant_density_analytically(self):
        """Constant sigma over [near, far]: weights_sum = 1 - exp(-sigma*L)."""
        import jax
        import jax.numpy as jnp

        from nerfstyle_tpu.core.types import make_rays
        from nerfstyle_tpu.ops.stratified import integrate_points, sample_points

        rays = make_rays(jnp.zeros((4, 3)), jnp.asarray([[0.0, 0.0, 1.0]] * 4))
        near, far, k = 1.0, 3.0, 256
        pts, dists = sample_points(rays, near, far, k, jax.random.PRNGKey(0))
        assert pts.shape == (4, k, 3)
        sigma = 0.7
        sigmas = jnp.full((4, k), sigma)
        rgbs = jnp.ones((4, k, 3)) * 0.5
        # Two chunks must compose exactly (the chunk-resumable carry).
        half = k // 2
        rgb1, acc1, tr1 = integrate_points(
            dists[:, :half], rgbs[:, :half], sigmas[:, :half],
            jnp.zeros((4, 3)), jnp.zeros((4, 1)), jnp.ones((4, 1)),
        )
        rgb_map, acc, _tr = integrate_points(
            dists[:, half:], rgbs[:, half:], sigmas[:, half:], rgb1, acc1, tr1
        )
        # Final dist is 1e10 (nerf_lib law) so the last sample absorbs all
        # remaining transmittance: acc ~= 1 and rgb -> 0.5.
        np.testing.assert_allclose(np.asarray(acc), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb_map), 0.5, rtol=1e-5)

        # Without the catch-all last sample: analytic constant-density law.
        rgb_i, acc_i, _ = integrate_points(
            dists[:, :-1], rgbs[:, :-1], sigmas[:, :-1],
            jnp.zeros((4, 3)), jnp.zeros((4, 1)), jnp.ones((4, 1)),
        )
        expected = 1.0 - np.exp(-sigma * (far - near))
        np.testing.assert_allclose(np.asarray(acc_i), expected, rtol=5e-2)


class TestSyntheticRoom:
    """Enclosed-room variant of the procedural scene (bench default).

    Every ray must terminate on geometry — the property that makes the
    benchmark representative of the reference's headline scene (LLFF room:
    enclosed, early termination engages on every pixel)."""

    def test_room_fully_covered_and_inside_bound(self, tmp_path):
        from nerfstyle_tpu.data.synthetic import (
            _ROOM_EXT, _trace, generate_scene,
        )

        root = tmp_path / "room"
        generate_scene(root, num_train=3, num_test=1, h=32, w=40, room=True)
        data = np.load(root / "train_images.npz")
        imgs, segs = data["images"], data["segs"]
        # No white-background pixel anywhere: walls/spheres cover everything.
        assert not np.any(np.all(imgs == 1.0, axis=-1))
        assert set(np.unique(segs)) == {0.0, 1.0, 2.0, 3.0}
        # Cameras are inside the room; the walls COINCIDE with the bound-2
        # AABB (any exterior margin would be permanently-unobservable volume
        # that keeps its init density and never prunes — see synthetic.py).
        meta = np.load(root / "meta.npz")
        eyes = meta["train_poses"][:, :3, 3]
        assert np.all(np.abs(eyes) < _ROOM_EXT[None])
        assert np.all(_ROOM_EXT == 2.0)
        from nerfstyle_tpu.data.synthetic import SCENE_FORMAT_VERSION

        assert int(meta["scene_version"]) == SCENE_FORMAT_VERSION

        # Direct tracer check from a point between sphere and wall: the -x
        # ray hits the central sphere, the +x ray the wall (seg 0).
        dirs = np.array([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
        rgb, seg = _trace(np.array([1.2, 0.0, 0.0], np.float32), dirs, room=True)
        assert seg[0] == 1.0 and seg[1] == 0.0
        assert rgb.shape == (2, 3)

    def test_stale_cache_regenerates(self, tmp_path):
        """A cached scene with an old (or missing) scene_version must be
        regenerated in place, not silently reused."""
        from nerfstyle_tpu.data.synthetic import generate_scene

        root = tmp_path / "scene"
        generate_scene(root, num_train=2, num_test=1, h=16, w=20, room=True)
        meta = dict(np.load(root / "meta.npz"))
        meta.pop("scene_version")
        meta["h"] = np.asarray(7)  # sentinel: would survive a silent reuse
        np.savez_compressed(root / "meta.npz", **meta)
        generate_scene(root, num_train=2, num_test=1, h=16, w=20, room=True)
        assert int(np.load(root / "meta.npz")["h"]) == 16

    def test_open_scene_unchanged(self, tmp_path):
        from nerfstyle_tpu.data.synthetic import _trace

        # Default (open) scene still has the white background.
        dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
        rgb, seg = _trace(np.array([0.0, 0.0, 3.0], np.float32), dirs)
        assert np.all(rgb == 1.0) and seg[0] == 0.0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
