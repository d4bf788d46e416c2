"""Ray generation parity tests against a numpy transcription of the reference
generator (nerf_lib.py:68-142)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.core.cameras import camera_dir_grid, generate_rays
from nerfstyle_tpu.core.types import Box2D, Intrinsics


def _ref_dirs(intr, camera_flip=0, precrop=1.0, patch=None):
    """Literal numpy reference for the camera-frame direction grid."""
    fw, fh = intr.w, intr.h
    x = np.linspace(0, fw, num=2 * fw + 1, dtype=np.float32)[1::2]
    y = np.linspace(0, fh, num=2 * fh + 1, dtype=np.float32)[1::2]
    if precrop < 1.0:
        w, h = int(fw * precrop), int(fh * precrop)
        dx, dy = (fw - w) // 2, (fh - h) // 2
        x, y = x[dx : dx + w], y[dy : dy + h]
    if patch is not None:
        x = x[patch.wrange()]
        y = y[patch.hrange()]
    i, j = np.meshgrid(x, y, indexing="xy")
    dirs = np.stack([(i - intr.cx) / intr.fx, (j - intr.cy) / intr.fy, np.ones_like(i)], -1)
    flip = np.where([(camera_flip >> b) & 1 for b in [2, 1, 0]], -1, 1)
    return dirs * flip


INTR = Intrinsics(h=12, w=16, fx=10.0, fy=11.0, cx=8.0, cy=6.0)


class TestDirGrid:
    def test_matches_reference(self):
        got, ys, xs = camera_dir_grid(INTR)
        want = _ref_dirs(INTR)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        np.testing.assert_array_equal(ys, np.arange(12))

    @pytest.mark.parametrize("flip", [0, 1, 2, 3, 7])
    def test_flip_bits(self, flip):
        got, _, _ = camera_dir_grid(INTR, camera_flip=flip)
        want = _ref_dirs(INTR, camera_flip=flip)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_precrop_window(self):
        got, ys, xs = camera_dir_grid(INTR, precrop=0.5)
        want = _ref_dirs(INTR, precrop=0.5)
        assert got.shape == (6, 8, 3)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # window is centered
        assert xs[0] == 4 and ys[0] == 3

    def test_patch(self):
        p = Box2D(x=2, y=3, w=5, h=4)
        got, ys, xs = camera_dir_grid(INTR, patch=p)
        want = _ref_dirs(INTR, patch=p)
        assert got.shape == (4, 5, 3)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert xs[0] == 2 and ys[0] == 3


class TestGenerateRays:
    def _pose(self):
        # simple rotation + translation
        theta = 0.3
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.array(
            [[np.cos(theta), 0, np.sin(theta)], [0, 1, 0], [-np.sin(theta), 0, np.cos(theta)]]
        )
        pose[:3, 3] = [1.0, 2.0, 3.0]
        return jnp.asarray(pose)

    def test_full_grid(self):
        rays, target = generate_rays(self._pose(), INTR)
        assert rays.dirs.shape == (12 * 16, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays.dirs), axis=-1), 1.0, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(rays.origins[0]), [1, 2, 3], rtol=1e-6)
        assert target is None

    def test_target_gather_full(self):
        img = jnp.arange(3 * 12 * 16, dtype=jnp.float32).reshape(3, 12, 16)
        _, target = generate_rays(self._pose(), INTR, img)
        # row-major pixel order: target[k] = img[:, k//16, k%16]
        np.testing.assert_allclose(np.asarray(target[17]), np.asarray(img[:, 1, 1]))

    def test_subsample_no_replacement(self):
        img = jnp.zeros((4, 12, 16))
        rays, target = generate_rays(
            self._pose(), INTR, img, num_rays=64, key=jax.random.PRNGKey(0)
        )
        assert rays.dirs.shape == (64, 3)
        assert target.shape == (64, 4)

    def test_patch_target_alignment(self):
        """Rays from a patch must pair with the patch's pixels of the image."""
        img = jnp.arange(12 * 16, dtype=jnp.float32).reshape(1, 12, 16)
        p = Box2D(x=5, y=2, w=3, h=2)
        rays, target = generate_rays(self._pose(), INTR, img, patch=p)
        want = np.asarray(img[0, 2:4, 5:8]).reshape(-1)
        np.testing.assert_allclose(np.asarray(target[:, 0]), want)

    def test_world_rotation(self):
        pose = self._pose()
        rays, _ = generate_rays(pose, INTR)
        cam_dirs, _, _ = camera_dir_grid(INTR)
        want = cam_dirs.reshape(-1, 3) @ np.asarray(pose[:3, :3]).T
        want /= np.linalg.norm(want, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(rays.dirs), want, rtol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
