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
