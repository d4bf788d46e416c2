"""Shared primitive types.

Functional JAX equivalents of the reference's ``common.py`` (reference:
``/root/reference/common.py:14-295``).  Everything here is either a frozen
dataclass of static (Python) values or a registered pytree of arrays, so the
types can flow through ``jax.jit`` without tracing surprises:

  * static camera/geometry metadata  -> plain frozen dataclasses (hashable, used
    as jit static args or closed over);
  * per-batch array data (rays, bbox) -> NamedTuples of ``jnp`` arrays (pytrees).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from enum import Enum
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class DatasetSplit(Enum):
    """Reference: common.py:14-17."""

    TRAIN = 0
    VAL = 1
    TEST = 2


class DatasetCoordSystem(Enum):
    """Reference: common.py:20-22."""

    RFU = 0  # X = right, Y = front, Z = up
    RDF = 1  # X = right, Y = down, Z = front


@dataclass(frozen=True)
class Box2D:
    """2D patch box in pixel coordinates (reference: common.py:25-38)."""

    x: int
    y: int
    w: int
    h: int

    def wrange(self) -> slice:
        return slice(self.x, self.x + self.w)

    def hrange(self) -> slice:
        return slice(self.y, self.y + self.h)


@dataclass(frozen=True)
class Intrinsics:
    """Pinhole camera intrinsics (reference: common.py:41-114).

    Static metadata: stays on host, closed over by jitted ray generators.
    """

    h: int
    w: int
    fx: float
    fy: float
    cx: float
    cy: float

    def __post_init__(self):
        object.__setattr__(self, "h", int(self.h))
        object.__setattr__(self, "w", int(self.w))
        object.__setattr__(self, "fx", float(self.fx))
        object.__setattr__(self, "fy", float(self.fy))
        object.__setattr__(self, "cx", float(self.cx))
        object.__setattr__(self, "cy", float(self.cy))

    @classmethod
    def from_np(cls, intr_np: np.ndarray, dims: Optional[Tuple[int, int]] = None) -> "Intrinsics":
        assert intr_np.shape == (4, 4)
        cx, cy = intr_np[0, 2], intr_np[1, 2]
        fx, fy = intr_np[0, 0], intr_np[1, 1]
        h, w = int(cy * 2), int(cx * 2)
        if dims is not None:
            h, w = dims
        return cls(h, w, fx, fy, cx, cy)

    def size(self) -> Tuple[int, int]:
        return self.w, self.h

    @property
    def num_pixels(self) -> int:
        return self.h * self.w

    def scale(self, w: int, h: int) -> "Intrinsics":
        """Rescale to new dims; focal rescaled by the shorter-edge ratio
        (reference: common.py:92-114)."""
        cx, cy = w / 2.0, h / 2.0
        old_ar = self.w / self.h
        new_ar = w / h
        ratio = h / self.h if new_ar >= old_ar else w / self.w
        return Intrinsics(h, w, self.fx * ratio, self.fy * ratio, cx, cy)

    def asdict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class LossValue:
    """A named loss record (reference: common.py:117-125)."""

    print_name: str
    log_name: str
    value: object  # scalar jnp array or float


class RayBundle(NamedTuple):
    """A batch of N rays: pytree of arrays (reference RayBatch, common.py:129-204).

    ``dirs`` are unit-normalized on construction via :func:`make_rays`.
    """

    origins: jnp.ndarray  # [N, 3]
    dirs: jnp.ndarray  # [N, 3], unit norm

    def __len__(self):
        return self.dirs.shape[0]

    def lerp(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Points at parameter ``coeffs`` along each ray: [N] -> [N, 3],
        [N, K] -> [N, K, 3] (reference: common.py:156-173)."""
        if coeffs.ndim == 1:
            return self.origins + self.dirs * coeffs[:, None]
        return self.origins[:, None, :] + self.dirs[:, None, :] * coeffs[..., None]


def make_rays(origins: jnp.ndarray, dirs: jnp.ndarray) -> RayBundle:
    """Build a RayBundle, tiling a single origin and unit-normalizing dirs
    (reference RayBatch.__post_init__, common.py:139-147)."""
    if origins.ndim == 1:
        origins = jnp.broadcast_to(origins, dirs.shape)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(origins, dirs)


def warp_ndc(rays: RayBundle, near: float, intr: Intrinsics) -> RayBundle:
    """Warp rays to NDC coordinates (reference: common.py:175-204).

    Plumbed for parity; the reference's main path never enables NDC (all call
    sites commented out, renderer.py:56-58, 202-204).
    """
    t = -(near + rays.origins[:, 2]) / rays.dirs[:, 2]
    ndc_o = rays.origins + t[:, None] * rays.dirs

    w_tmp = -1.0 / (intr.w / (2.0 * intr.fx))
    h_tmp = -1.0 / (intr.h / (2.0 * intr.fy))

    new_origins = jnp.stack(
        [
            w_tmp * ndc_o[:, 0] / ndc_o[:, 2],
            h_tmp * ndc_o[:, 1] / ndc_o[:, 2],
            1.0 + 2.0 * near / ndc_o[:, 2],
        ],
        axis=-1,
    )
    new_dirs = jnp.stack(
        [
            w_tmp * (rays.dirs[:, 0] / rays.dirs[:, 2] - ndc_o[:, 0] / ndc_o[:, 2]),
            h_tmp * (rays.dirs[:, 1] / rays.dirs[:, 2] - ndc_o[:, 1] / ndc_o[:, 2]),
            -2.0 * near / ndc_o[:, 2],
        ],
        axis=-1,
    )
    return make_rays(new_origins, new_dirs)


class RotatedBBox(NamedTuple):
    """8-corner oriented bounding box with face-normal containment test
    (reference: common.py:298-345; unused in the reference's main path, kept
    for capability parity).

    Corner convention: top face clockwise v0-v3, bottom face clockwise v4-v7,
    v3 above v4.
    """

    pts: jnp.ndarray  # [8, 3]
    face_origins: jnp.ndarray  # [6, 3]
    face_normals: jnp.ndarray  # [6, 3]

    @classmethod
    def from_corners(cls, pts: np.ndarray) -> "RotatedBBox":
        assert pts.shape == (8, 3)
        faces = np.array(
            [[0, 1, 2], [4, 3, 2], [5, 2, 1], [6, 1, 0], [7, 0, 3], [4, 5, 6]]
        )
        p0, p1, p2 = pts[faces[:, 0]], pts[faces[:, 1]], pts[faces[:, 2]]
        normals = np.cross(p1 - p0, p2 - p0)
        return cls(
            pts=jnp.asarray(pts, jnp.float32),
            face_origins=jnp.asarray(p0, jnp.float32),
            face_normals=jnp.asarray(normals, jnp.float32),
        )

    @property
    def min_pt(self) -> jnp.ndarray:
        return jnp.min(self.pts, axis=0)

    @property
    def max_pt(self) -> jnp.ndarray:
        return jnp.max(self.pts, axis=0)

    def contains(self, pts: jnp.ndarray, outside: bool = False) -> jnp.ndarray:
        """A point is inside iff every reference face faces it (common.py:334-345)."""
        vecs = pts[:, None, :] - self.face_origins[None]  # [N, 6, 3]
        dots = jnp.einsum("nfc,fc->nf", vecs, self.face_normals)
        if outside:
            return jnp.any(dots <= 0, axis=-1)
        return jnp.all(dots > 0, axis=-1)


class VoxelOccupancyMap(NamedTuple):
    """Standalone boolean voxel-map lookup (reference OccupancyGrid,
    common.py:348-396; unused in the main path — the Renderer keeps its own
    cascaded grid — provided for capability parity, e.g. externally supplied
    occupancy volumes)."""

    grid_flat: jnp.ndarray  # [res0*res1*res2 + 1] bool; last entry = False
    global_min_pt: jnp.ndarray  # [3]
    global_max_pt: jnp.ndarray  # [3]
    res: jnp.ndarray  # [3] float

    @classmethod
    def from_dense(cls, grid: np.ndarray, min_pt, max_pt) -> "VoxelOccupancyMap":
        flat = np.append(grid.reshape(-1).astype(bool), False)
        return cls(
            grid_flat=jnp.asarray(flat),
            global_min_pt=jnp.asarray(min_pt, jnp.float32),
            global_max_pt=jnp.asarray(max_pt, jnp.float32),
            res=jnp.asarray(grid.shape, jnp.float32),
        )

    @classmethod
    def load(cls, path) -> "VoxelOccupancyMap":
        data = np.load(path)
        return cls.from_dense(data["map"], data["global_min_pt"], data["global_max_pt"])

    @property
    def voxel_size(self) -> jnp.ndarray:
        return (self.global_max_pt - self.global_min_pt) / self.res

    def pts_to_indices(self, pts: jnp.ndarray) -> jnp.ndarray:
        return jnp.floor((pts - self.global_min_pt) / self.voxel_size).astype(jnp.int32)

    def query(self, pts: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
        invalid = jnp.any(
            (pts >= self.global_max_pt - epsilon) | (pts < self.global_min_pt + epsilon),
            axis=-1,
        )
        idx3 = self.pts_to_indices(pts)
        basis = jnp.asarray(
            [self.res[2] * self.res[1], self.res[2], 1.0], jnp.float32
        ).astype(jnp.int32)
        lin = jnp.sum(idx3 * basis, axis=-1)
        lin = jnp.where(invalid, self.grid_flat.shape[0] - 1, lin)
        return self.grid_flat[lin]


class BBox(NamedTuple):
    """Axis-aligned scene bounding box as a pytree (reference: common.py:243-295)."""

    min_pt: jnp.ndarray  # [3]
    max_pt: jnp.ndarray  # [3]

    @classmethod
    def from_radius(cls, radius: float) -> "BBox":
        r = jnp.asarray([radius, radius, radius], dtype=jnp.float32)
        return cls(-r, r)

    @property
    def size(self) -> jnp.ndarray:
        return self.max_pt - self.min_pt

    @property
    def mid_pt(self) -> jnp.ndarray:
        return (self.max_pt + self.min_pt) / 2

    def scaled(self, factor: float) -> "BBox":
        mid = self.mid_pt
        return BBox((self.min_pt - mid) * factor + mid, (self.max_pt - mid) * factor + mid)

    def normalize(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Map coordinates so min_pt -> 0 and max_pt -> 1 (common.py:276-288)."""
        return (pts - self.min_pt) / self.size
