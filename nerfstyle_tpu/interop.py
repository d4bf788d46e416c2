"""Reference-checkpoint interop: convert the reference's occupancy-grid
layout to this framework's.

The reference Renderer persists its occupancy state Morton-ordered
(``/root/reference/renderer.py:61-66,78-91``): ``density_grid`` is
``[cascade, H^3]`` f32 indexed by Morton (Z-order) code
(``renderer.py:142-161`` sweeps cells in Morton order via
``raymarching.morton3D``) and ``density_bitfield`` is the packed uint8 form
(8 cells/byte, bit = cell % 8, ``raymarching.cu:367-399``).  This framework
stores both linearly (x-major; ops/occupancy.py layout note) with a bool
bitfield.

These converters let a reference ``iter_*.pth`` checkpoint's grid state be
consumed without re-sweeping the scene.  (The reference's tcnn
FullyFusedMLP parameter blobs are packed layouts internal to tiny-cuda-nn
and are NOT convertible here — grids can be imported, MLP heads must be
retrained or exported layer-wise from the reference side.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ops.morton import morton3d
from .ops.occupancy import unpackbits


def morton_grid_to_linear(grid_morton: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """[..., H^3] Morton-indexed cell values -> linear (x-major) indexing.

    ``linear[..., lin(x,y,z)] = morton[..., morton3d(x,y,z)]``.
    """
    h = grid_size
    r = np.arange(h, dtype=np.int32)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    coords = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 3))
    codes = morton3d(coords)  # Morton code of each linear-position cell
    return jnp.take(grid_morton, codes, axis=-1)


def linear_grid_to_morton(grid_linear: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """Inverse of :func:`morton_grid_to_linear` (for exporting)."""
    h = grid_size
    r = np.arange(h, dtype=np.int32)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    coords = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 3))
    codes = np.asarray(morton3d(coords))
    inv = np.empty_like(codes)
    inv[codes] = np.arange(codes.shape[0], dtype=codes.dtype)
    return jnp.take(grid_linear, jnp.asarray(inv), axis=-1)


def reference_bitfield_to_linear(
    packed_morton: jnp.ndarray, grid_size: int, cascade: int
) -> jnp.ndarray:
    """Reference packed bitfield (uint8 [cascade * H^3 / 8], Morton cell
    order, bit index = cell % 8) -> this framework's bool [cascade * H^3]
    linear field."""
    bits = unpackbits(packed_morton.reshape(-1))  # Morton-ordered bools
    per = grid_size**3
    out = []
    for c in range(cascade):
        out.append(morton_grid_to_linear(bits[c * per : (c + 1) * per], grid_size))
    return jnp.concatenate(out)


def import_reference_grid_state(
    density_grid_morton: np.ndarray,
    bitfield_packed: np.ndarray,
    grid_size: int,
):
    """Convert the reference checkpoint's (density_grid, density_bitfield)
    pair to (density_grid_linear [cascade, H^3], bitfield_linear bool
    [cascade * H^3]) ready for ``OccupancyState`` (ops/occupancy.py)."""
    grid = jnp.asarray(np.asarray(density_grid_morton, np.float32))
    if grid.ndim == 1:
        grid = grid[None]
    cascade = grid.shape[0]
    grid_lin = morton_grid_to_linear(grid, grid_size)
    bits_lin = reference_bitfield_to_linear(
        jnp.asarray(np.asarray(bitfield_packed, np.uint8)), grid_size, cascade
    )
    return grid_lin, bits_lin
