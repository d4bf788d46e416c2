"""3D Morton (Z-order) curve encode/decode as vectorized JAX int ops.

TPU-native equivalent of the reference CUDA bit-trick kernels
(``/root/reference/raymarching/src/raymarching.cu:56-81`` and the morton3D /
morton3D_invert wrappers, ``raymarching/raymarching.py:89-136``).

The new framework's occupancy grid uses a plain linear (x, y, z) layout — the
Morton order in the reference is a GPU cache-locality choice, not semantics —
but the ops are provided for API parity and for checkpoint interop tooling.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each lane: bit i -> bit 3i (raymarching.cu:56-63)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] int coords -> [N] Morton codes (raymarching.cu:65-71)."""
    xx = _expand_bits(coords[..., 0])
    yy = _expand_bits(coords[..., 1])
    zz = _expand_bits(coords[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """[N] Morton codes -> [N, 3] int coords (raymarching.cu:73-81)."""
    codes = codes.astype(jnp.uint32)
    x = _compact_bits(codes)
    y = _compact_bits(codes >> 1)
    z = _compact_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
