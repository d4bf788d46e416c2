"""Legacy dense stratified sampling + chunked volume integration.

Rebuild of the reference's pre-occupancy-grid render math
(``/root/reference/nerf_lib.py:144-219``): ``sample_points`` (stratified
jittered samples in [near, far]) and ``integrate_points`` (chunk-resumable
cumprod volume rendering).  The occupancy marcher replaced these in the
reference's current renderer (SURVEY.md section 2.1, "both unused by the
current Renderer"), but they remain the correctness oracle for compositing and
are useful for dense ablation renders.

Also hosts ``global_to_local`` (nerf_lib.py:221-235).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import RayBundle
from ..utils import density2alpha


def sample_points(
    rays: RayBundle,
    near: float,
    far: float,
    num_samples: int,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified samples per ray (nerf_lib.py:144-176).

    Returns (pts [N, K, 3], dists [N, K]); the final dist is 1e10.
    """
    n = len(rays)
    z_edges = jnp.linspace(near, far, num_samples + 1)
    lower = jnp.broadcast_to(z_edges[:-1], (n, num_samples))
    upper = jnp.broadcast_to(z_edges[1:], (n, num_samples))
    t_rand = jax.random.uniform(key, (n, num_samples))
    z_vals = lower + (upper - lower) * t_rand
    pts = rays.lerp(z_vals)

    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, jnp.full((n, 1), 1e10)], axis=-1)
    return pts, dists


def integrate_points(
    dists: jnp.ndarray,
    rgbs: jnp.ndarray,
    densities: jnp.ndarray,
    prev_rgb: jnp.ndarray,
    prev_acc: jnp.ndarray,
    prev_trans: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chunk-resumable volume rendering (nerf_lib.py:178-219).

    Carries (rgb, acc, trans) so K-sample chunks compose exactly:
        alpha_i = 1 - exp(-relu(sigma_i) * dist_i)
        T_i = prev_trans * prod_{j<i}(1 - alpha_j)
    """
    alpha = density2alpha(densities, dists)  # [N, K]
    alpha_tmp = jnp.concatenate([prev_trans, 1.0 - alpha[:, :-1]], axis=-1)
    trans = jnp.cumprod(alpha_tmp, axis=-1)  # [N, K]

    weights = alpha * trans
    rgb_map = prev_rgb + jnp.sum(weights[..., None] * rgbs, axis=1)
    acc_map = prev_acc + jnp.sum(weights, axis=1, keepdims=True)
    trans_map = (trans[:, -1] * (1.0 - alpha[:, -1]))[:, None]
    return rgb_map, acc_map, trans_map


def global_to_local(
    points: jnp.ndarray,
    mid_points: jnp.ndarray,
    voxel_size: float,
    batch_sizes,
) -> jnp.ndarray:
    """Shift point blocks to per-voxel local frames (nerf_lib.py:221-235)."""
    out = []
    ptr = 0
    for mid, bsize in zip(mid_points, batch_sizes):
        out.append(points[ptr : ptr + bsize] - mid)
        ptr += bsize
    return jnp.concatenate(out) / (voxel_size / 2)
