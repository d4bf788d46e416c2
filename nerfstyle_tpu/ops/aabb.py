"""Ray/AABB intersection (slab test), fully vectorized.

TPU-native equivalent of the reference CUDA kernel
``kernel_near_far_from_aabb`` (``/root/reference/raymarching/src/raymarching.cu:190-244``).
Pure elementwise math — jits and shards trivially over the ray axis.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

FLT_MAX = jnp.float32(3.402823466e38)


def near_far_from_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    min_near: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray entry/exit distances for an axis-aligned box.

    Args:
        rays_o: [N, 3] origins.
        rays_d: [N, 3] unit directions.
        aabb: [6] array (xmin, ymin, zmin, xmax, ymax, zmax).
        min_near: near distance floor (raymarching.cu:240).

    Returns:
        (nears, fars): [N] each.  Misses get FLT_MAX in both (raymarching.cu:221,233).
    """
    rd = 1.0 / rays_d  # inf on zero components mirrors the CUDA 1/0 behavior
    t0 = (aabb[None, :3] - rays_o) * rd
    t1 = (aabb[None, 3:] - rays_o) * rd
    per_axis_near = jnp.minimum(t0, t1)  # [N, 3]
    per_axis_far = jnp.maximum(t0, t1)

    near = jnp.max(per_axis_near, axis=-1)
    far = jnp.min(per_axis_far, axis=-1)

    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, FLT_MAX, near)
    far = jnp.where(miss, FLT_MAX, far)
    return near, far
