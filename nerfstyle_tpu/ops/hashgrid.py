"""Multiresolution hash-grid encoding (instant-ngp style).

TPU-native rebuild of the reference CUDA grid encoder
(``/root/reference/gridencoder/src/gridencoder.cu:36-235`` forward,
239-328 backward; Python wrapper ``gridencoder/grid.py:19-191``).

Semantics replicated exactly:

  * per-level kernel resolution ``floor(2^(l*log2(s)) * H)`` in fp32
    (gridencoder.cu:137), with ``align_corners=True`` scale ``= resolution``
    (the reference constructs GridEncoder with align_corners=True,
    networks/tcnn_nerf.py:26-35);
  * table sizing uses the *ceil* resolution law ``min(2^log2_size,
    ceil(H*s^l)^3)`` rounded up to a multiple of 8 (grid.py:129-139) — note the
    reference's floor/ceil mismatch is intentional here for parity;
  * index law replicates the progressive-stride dense/tiled check and the
    spatial-prime XOR ``fast_hash`` with a style slot (gridencoder.cu:36-80).
    With the default configs every level takes the hash path (the dense stride
    check includes a *512 style-capacity factor that always overflows the
    table), but the dense path is implemented for exactness at tiny sizes;
  * out-of-[0,1] inputs produce zero features (gridencoder.cu:109-132).

TPU-first design: all L levels are evaluated as one batched gather
``[B, L, 8] -> [B, L, 8, C]`` from a single flat parameter table, followed by a
trilinear weighted reduction — XLA fuses the index arithmetic and the
reduction around a single gather HLO.  Gradients (embedding scatter-add *and*
the input Jacobian) come from JAX autodiff: the forward is written as pure
gather/mul/sum, whose transpose is exactly the scatter-add the CUDA backward
hand-implements (gridencoder.cu:239-328) — and deterministic, unlike the
atomicAdd original.  A Pallas kernel can later replace the gather if profiling
demands; the function signature is the contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429)  # gridencoder.cu:42 (D=3 + style)
_MAX_STYLES = 512  # gridencoder.cu:59


@dataclass(frozen=True)
class HashGridSpec:
    """Static hash-grid geometry."""

    num_levels: int
    level_dim: int
    base_resolution: int
    per_level_scale: float
    log2_hashmap_size: int
    resolutions: Tuple[int, ...]  # kernel (floor) law per level
    table_sizes: Tuple[int, ...]
    offsets: Tuple[int, ...]  # len L+1, in table rows

    @property
    def total_params(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def hashgrid_spec(
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    per_level_scale: float = 2.0,
    log2_hashmap_size: int = 19,
    desired_resolution: float = None,
) -> HashGridSpec:
    """Build the static spec (mirrors GridEncoder.__init__, grid.py:104-148)."""
    if desired_resolution is not None:
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
        )

    max_params = 2**log2_hashmap_size
    offsets = [0]
    table_sizes = []
    resolutions = []
    s_log2 = np.float32(np.log2(per_level_scale))
    for lvl in range(num_levels):
        # Sizing law (ceil; grid.py:133-136, align_corners=True branch).
        res_ceil = int(np.ceil(base_resolution * per_level_scale**lvl))
        params = min(max_params, res_ceil**3)
        params = int(np.ceil(params / 8) * 8)
        table_sizes.append(params)
        offsets.append(offsets[-1] + params)
        # Kernel law (fp32 floor; gridencoder.cu:137).
        res_kernel = int(
            np.floor(np.exp2(np.float32(lvl) * s_log2) * np.float32(base_resolution))
        )
        resolutions.append(res_kernel)

    return HashGridSpec(
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_resolution,
        per_level_scale=float(per_level_scale),
        log2_hashmap_size=log2_hashmap_size,
        resolutions=tuple(resolutions),
        table_sizes=tuple(table_sizes),
        offsets=tuple(offsets),
    )


def hashgrid_init(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) table init (grid.py:150-152)."""
    return jax.random.uniform(
        key, (spec.total_params, spec.level_dim), dtype, -1e-4, 1e-4
    )


# Corner bit patterns for trilinear interpolation, [8, 3].
_CORNERS = np.array(
    [[(c >> d) & 1 for d in range(3)] for c in range(8)], dtype=np.int32
)


def _level_indices(
    pos_grid: jnp.ndarray, resolution: int, table_size: int, style: int
) -> jnp.ndarray:
    """Table row index for integer corner coords [B, 8, 3] at one level.

    Replicates get_grid_index (gridencoder.cu:56-80); all stride decisions are
    static Python, only the coordinate arithmetic is traced.
    """
    pg = pos_grid.astype(jnp.uint32)
    index = jnp.zeros(pos_grid.shape[:-1], jnp.uint32)
    stride = 1
    dense_ok = True
    for d in range(3):
        if stride <= table_size:
            index = index + pg[..., d] * jnp.uint32(stride)
            stride *= resolution + 1
        else:
            dense_ok = False
    if stride <= table_size:
        index = index + jnp.uint32(style * stride)
        stride *= _MAX_STYLES
    use_hash = stride > table_size  # static
    if use_hash:
        index = (
            pg[..., 0] * jnp.uint32(_PRIMES[0])
            ^ pg[..., 1] * jnp.uint32(_PRIMES[1])
            ^ pg[..., 2] * jnp.uint32(_PRIMES[2])
            ^ jnp.uint32((style * _PRIMES[3]) & 0xFFFFFFFF)
        )
    del dense_ok
    return (index % jnp.uint32(table_size)).astype(jnp.int32)


def hashgrid_encode(
    spec: HashGridSpec,
    embeddings: jnp.ndarray,
    x: jnp.ndarray,
    style: int = 0,
) -> jnp.ndarray:
    """Encode points through all levels.

    Args:
        spec: static geometry.
        embeddings: [total_params, level_dim] table.
        x: [B, 3] coordinates in [0, 1] (out-of-range rows produce zeros).
        style: static style slot (0 in the reference's entire active path;
            multi-style tables are dormant, style_nerf.py:100-116).

    Returns:
        [B, num_levels * level_dim] features, level-major like the reference
        (grid.py:57-58 permutes [L, B, C] -> [B, L*C]).
    """
    b = x.shape[0]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [B]
    corners = jnp.asarray(_CORNERS)  # [8, 3]

    all_idx = []
    all_w = []
    for lvl in range(spec.num_levels):
        res = spec.resolutions[lvl]
        scale = jnp.float32(res)  # align_corners=True: scale = resolution (cu:138)
        pos = x * scale  # + 0.0 offset (align_corners)
        pos_grid = jnp.clip(jnp.floor(pos), 0.0, res - 1)  # cu:147 (fminf floor)
        frac = pos - pos_grid  # [B, 3]

        corner_coords = pos_grid[:, None, :].astype(jnp.int32) + corners[None]  # [B, 8, 3]
        idx = _level_indices(corner_coords, res, spec.table_sizes[lvl], style)
        all_idx.append(idx + spec.offsets[lvl])

        w = jnp.where(corners[None].astype(jnp.float32) == 1.0, frac[:, None, :], 1.0 - frac[:, None, :])
        all_w.append(jnp.prod(w, axis=-1))  # [B, 8]

    flat_idx = jnp.stack(all_idx, axis=1)  # [B, L, 8]
    weights = jnp.stack(all_w, axis=1)  # [B, L, 8]

    feats = embeddings[flat_idx]  # [B, L, 8, C] — the one gather
    out = jnp.sum(weights[..., None] * feats, axis=2)  # [B, L, C]
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(b, spec.output_dim)
