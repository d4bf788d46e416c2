"""Occupancy-guided ray marching with static-shape compaction.

TPU-native rebuild of the reference CUDA ``kernel_march_rays_train``
(``/root/reference/raymarching/src/raymarching.cu:411-589``) and the inference
marcher (``raymarching.cu:1005-1120``).

Key insight enabling a fully-vectorized design: the reference always marches
with ``dt_gamma = 0`` (renderer.py:219-222) and perturb force-disabled
(raymarching.py:247), so the step size is the **constant** ``dt = 2*sqrt(3) /
max_steps`` and every sample — whether reached by stepping or by empty-space
voxel skipping (which advances ``t += dt`` until the next voxel boundary,
raymarching.cu:497-499) — lies exactly on the uniform lattice ``t_k = near +
k*dt``.  A lattice point is emitted iff its cell is occupied.  The whole march
is therefore:

    1. evaluate occupancy for all [N, T] lattice points (one big gather —
       MXU-free, HBM-bandwidth bound, perfectly shaped for TPU);
    2. mask by ``t < far`` and the per-ray ``max_steps`` cap on *kept* samples
       (a cumsum along the lattice axis);
    3. compact the surviving points into a static-size buffer with
       ``jnp.flatnonzero(size=...)`` (cumsum + scatter under jit), preserving
       ray-major order so compositing can use segment scans.

This replaces the CUDA two-pass atomicAdd compaction (raymarching.cu:506-514)
with a deterministic prefix-sum — ray/point ordering is reproducible, unlike
the reference (see SURVEY.md section 5, race notes).

The same function serves training and inference; the reference's separate
alive-ray inference loop (renderer.py:237-293) is an in-place memory
optimization with identical math (same lattice, same T-threshold early stop), which
the renderer reproduces by chunking rays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

from ..core.types import RayBundle
from .occupancy import cell_linear_index

SQRT3 = 1.7320508075688772


@dataclass(frozen=True)
class MarchPlan:
    """Static marching geometry, derived from RendererConfig + scene bound.

    ``budget`` is the compacted-sample capacity M (static for XLA); the
    renderer picks it from the running mean point count, mirroring the
    reference's ``mean_count`` buffer sizing (raymarching.py:230-236).
    """

    bound: float
    cascade: int  # 1 + ceil(log2(bound))  (renderer.py:61)
    grid_size: int
    max_steps: int  # per-ray cap on kept samples (cfg.max_steps)
    num_rays: int
    budget: int
    min_near: float = 0.2

    @property
    def dt(self) -> float:
        """Constant step: dt_min of the reference with dt_gamma=0
        (raymarching.cu:446)."""
        return 2.0 * SQRT3 / self.max_steps

    @property
    def t_lattice(self) -> int:
        """Static lattice length: worst-case AABB traversal is the cube diagonal
        2*bound*sqrt(3), i.e. bound*max_steps lattice steps."""
        return int(math.ceil(self.bound * self.max_steps)) + 1

    @property
    def mip_dt_level(self) -> int:
        """Constant mip_from_dt term (raymarching.cu:49-54): frexp exponent of
        dt*H/2, clamped to [0, cascade-1]."""
        e = math.frexp(self.dt * self.grid_size * 0.5)[1]
        return min(self.cascade - 1, max(0, e))

    @property
    def aabb(self) -> jnp.ndarray:
        b = self.bound
        return jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)


class SampleBatch(NamedTuple):
    """Compacted ray samples, ray-major sorted (pytree)."""

    xyz: jnp.ndarray  # [M, 3] world positions (clamped to bound)
    dirs: jnp.ndarray  # [M, 3] unit ray dirs
    tau: jnp.ndarray  # [M] depth integrand: t + dt - near  (see compositing)
    ray_id: jnp.ndarray  # [M] i32, == num_rays for padding slots
    valid: jnp.ndarray  # [M] bool
    num_kept: jnp.ndarray  # i32 scalar: samples that survived masking (pre-truncation)


def occupancy_lookup(
    xyz: jnp.ndarray,
    bitfield: jnp.ndarray,
    *,
    bound: float,
    cascade: int,
    grid_size: int,
    mip_dt_level: int = 0,
) -> jnp.ndarray:
    """Occupancy of world points in the cascaded grid.

    Mirrors mip_from_pos + grid addressing (raymarching.cu:42-47,469-480) with
    linear instead of Morton cell layout.
    """
    h = grid_size
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    _, e = jnp.frexp(mx)  # mx = m * 2^e, m in [0.5, 1)
    level = jnp.clip(jnp.maximum(e, mip_dt_level), 0, cascade - 1)
    mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), bound)
    coords = (0.5 * (xyz / mip_bound[..., None] + 1.0) * h).astype(jnp.int32)
    coords = jnp.clip(coords, 0, h - 1)
    idx = level * (h * h * h) + cell_linear_index(coords, h)
    return bitfield[idx]


def march_rays(
    plan: MarchPlan,
    bitfield: jnp.ndarray,
    rays: RayBundle,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
) -> SampleBatch:
    """March N rays over the occupancy grid; emit compacted samples.

    Args:
        plan: static geometry (N, T, M are compile-time shapes).
        bitfield: [cascade * grid_size**3] bool occupancy.
        rays: RayBundle of exactly ``plan.num_rays`` rays.
        nears/fars: [N] from :func:`near_far_from_aabb`.
    """
    n, t_lat, dt = plan.num_rays, plan.t_lattice, plan.dt
    assert rays.dirs.shape[0] == n

    # Lattice times t_k = near + k*dt  (noise = 0: raymarching.py:247-251).
    k = jnp.arange(t_lat, dtype=jnp.float32)
    t = nears[:, None] + k[None, :] * dt  # [N, T]

    xyz = rays.origins[:, None, :] + rays.dirs[:, None, :] * t[..., None]
    xyz = jnp.clip(xyz, -plan.bound, plan.bound)

    occ = occupancy_lookup(
        xyz,
        bitfield,
        bound=plan.bound,
        cascade=plan.cascade,
        grid_size=plan.grid_size,
        mip_dt_level=plan.mip_dt_level,
    )

    kept = occ & (t < fars[:, None])
    # Per-ray cap on kept samples (max_steps counts only occupied steps,
    # raymarching.cu:460,485-487).
    kept &= jnp.cumsum(kept, axis=1) <= plan.max_steps
    num_kept = jnp.sum(kept, dtype=jnp.int32)

    # Static-size compaction, ray-major order preserved.
    flat = kept.reshape(-1)
    idx = jnp.flatnonzero(flat, size=plan.budget, fill_value=n * t_lat)
    valid = idx < n * t_lat

    rid = jnp.minimum(idx // t_lat, n - 1).astype(jnp.int32)
    kk = (idx % t_lat).astype(jnp.float32)
    t_sel = nears[rid] + kk * dt
    xyz_sel = rays.origins[rid] + rays.dirs[rid] * t_sel[:, None]
    xyz_sel = jnp.clip(xyz_sel, -plan.bound, plan.bound)
    # Depth integrand: running sum of deltas[1] at sample i is t_i + dt - near
    # (derived from raymarching.cu:562-565; composited as d += w * tau).
    tau = t_sel + dt - nears[rid]

    ray_id = jnp.where(valid, rid, n).astype(jnp.int32)
    return SampleBatch(
        xyz=xyz_sel,
        dirs=rays.dirs[rid],
        tau=tau,
        ray_id=ray_id,
        valid=valid,
        num_kept=num_kept,
    )
