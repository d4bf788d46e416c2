"""Camera ray generation.

JAX rebuild of the reference ray generator (``/root/reference/nerf_lib.py:68-142``).
Design notes (TPU-first):

  * The camera-frame direction grid depends only on *static* data (intrinsics,
    precrop fraction, patch box, flip bits), so it is computed once on host with
    numpy and cached; only the pose rotation, pixel subsampling, and target
    gather are traced — the whole generator then lives inside the jitted train
    step (the reference crosses numpy<->GPU every iteration,
    nerf_lib.py:118,134).
  * Random pixel subsampling uses the JAX PRNG (``jax.random.choice`` without
    replacement, mirroring ``np.random.choice(replace=False)`` at
    nerf_lib.py:134).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import Box2D, Intrinsics, RayBundle, make_rays


@functools.lru_cache(maxsize=32)
def camera_dir_grid(
    intr: Intrinsics,
    camera_flip: int = 0,
    precrop: float = 1.0,
    patch: Optional[Box2D] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static camera-frame direction grid and pixel coordinate maps.

    Returns ``(dirs [h', w', 3], ys [h'], xs [w'])`` where ys/xs are integer
    pixel rows/cols of each grid entry in the *full* frame (used to gather
    target pixels).  Mirrors the symmetric pixel-center sampling, precrop window
    and patch slicing of the reference (nerf_lib.py:96-122).
    """
    assert 0.0 <= precrop <= 1.0
    assert precrop >= 1.0 or patch is None, "precrop and patch are mutually exclusive"

    fw, fh = intr.size()
    # Symmetric pixel centers: [0.5, 1.5, ...] (nerf_lib.py:98-99)
    x_coords = np.linspace(0, fw, num=2 * fw + 1, dtype=np.float32)[1::2]
    y_coords = np.linspace(0, fh, num=2 * fh + 1, dtype=np.float32)[1::2]
    xs = np.arange(fw, dtype=np.int32)
    ys = np.arange(fh, dtype=np.int32)

    if precrop < 1.0:
        w, h = int(fw * precrop), int(fh * precrop)
        dx, dy = (fw - w) // 2, (fh - h) // 2
        x_coords, y_coords = x_coords[dx : dx + w], y_coords[dy : dy + h]
        xs, ys = xs[dx : dx + w], ys[dy : dy + h]

    if patch is not None:
        x_coords = x_coords[patch.wrange()]
        y_coords = y_coords[patch.hrange()]
        xs, ys = xs[patch.wrange()], ys[patch.hrange()]

    i, j = np.meshgrid(x_coords, y_coords, indexing="xy")
    k = np.ones_like(i)
    dirs = np.stack(
        [(i - intr.cx) / intr.fx, (j - intr.cy) / intr.fy, k], axis=-1
    ).astype(np.float32)

    # Axis flips from the bitmask: bit 2 -> X, bit 1 -> Y, bit 0 -> Z
    # (nerf_lib.py:121-122; LLFF uses flip_camera=3, i.e. flip Y and Z).
    flip = np.where([(camera_flip >> b) & 1 for b in [2, 1, 0]], -1.0, 1.0).astype(np.float32)
    dirs = dirs * flip

    return dirs, ys, xs


def generate_rays(
    pose: jnp.ndarray,
    intr: Intrinsics,
    img: Optional[jnp.ndarray] = None,
    patch: Optional[Box2D] = None,
    precrop: float = 1.0,
    num_rays: Optional[int] = None,
    camera_flip: int = 0,
    key: Optional[jax.Array] = None,
) -> Tuple[RayBundle, Optional[jnp.ndarray]]:
    """Generate world-space rays for a camera pose; optionally subsample pixels.

    Args:
        pose: [4, 4] camera-to-world matrix.
        img:  optional target image, channels-first [C, H, W] (C = 3 or 4 with a
              segmentation channel, matching the reference data layout).
        num_rays: if given, sample this many pixels uniformly without
              replacement (requires ``key``); otherwise all grid pixels
              row-major.

    Returns:
        (rays, target) with target [K, C] or None.  (nerf_lib.py:127-142)
    """
    cam_dirs_np, ys_np, xs_np = camera_dir_grid(intr, camera_flip, precrop, patch)
    h, w = cam_dirs_np.shape[:2]
    cam_dirs = jnp.asarray(cam_dirs_np)

    pose_r, pose_t = pose[:3, :3], pose[:3, 3]
    rays_d = jnp.einsum("ij,hwj->hwi", pose_r, cam_dirs)

    target = None
    if num_rays is None:
        rays_d = rays_d.reshape(-1, 3)
        if img is not None:
            target = img[:, jnp.asarray(ys_np)][:, :, jnp.asarray(xs_np)]
            target = target.reshape(img.shape[0], h * w).T  # [h*w, C]
    else:
        assert key is not None, "num_rays sampling requires a PRNG key"
        idx = jax.random.choice(key, w * h, shape=(num_rays,), replace=False)
        gy, gx = idx // w, idx % w
        rays_d = rays_d.reshape(-1, 3)[idx]
        if img is not None:
            py = jnp.asarray(ys_np)[gy]
            px = jnp.asarray(xs_np)[gx]
            target = img[:, py, px].T  # [K, C]

    rays = make_rays(pose_t, rays_d)
    return rays, target
