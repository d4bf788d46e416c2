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

TPU-first design: all L levels are evaluated as one batched *element* gather
``[B, 8*L*C]`` from the flattened parameter table in a corner-major flat
domain (see the layout note above ``_flat_plan``), followed by eight
contiguous slice-adds for the trilinear reduction — XLA fuses the index
arithmetic and the reduction around a single gather HLO, and no materialized
tensor carries a sub-128 minor dimension.  Gradients (embedding scatter-add *and*
the input Jacobian) come from JAX autodiff: the forward is written as pure
gather/mul/sum, whose transpose is exactly the scatter-add the CUDA backward
hand-implements (gridencoder.cu:239-328) — and deterministic, unlike the
atomicAdd original.  A Pallas kernel can later replace the gather if profiling
demands; the function signature is the contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compact import compact_indices

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
    # First level interpolated on the Freudenthal SIMPLEX (4 tetra vertices)
    # instead of the trilinear cube (8 corners); -1 disables (all trilinear,
    # reference parity).  Levels >= simplex_from gather HALF the random table
    # rows per sample — the dominant cost on TPU, where a row gather costs
    # ~13-21 ns regardless of row width (docs/PERFORMANCE.md) — while the
    # field stays C0 (the Kuhn/Freudenthal triangulation is globally
    # consistent across cube faces).  Coarse levels keep trilinear so the
    # ray-coherent corner dedup (which amortizes their 8 rows across runs and
    # beats the 4-row simplex while run rates are low) still applies; dedup
    # plans never cover simplex levels (see dedup_plan).
    simplex_from: int = -1

    @property
    def total_params(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def simplex_start(self) -> int:
        """First simplex level (== num_levels when disabled)."""
        if self.simplex_from < 0:
            return self.num_levels
        return min(self.simplex_from, self.num_levels)


def hashgrid_spec(
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    per_level_scale: float = 2.0,
    log2_hashmap_size: int = 19,
    desired_resolution: float = None,
    simplex_from: int = -1,
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
        simplex_from=simplex_from,
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


# ---------------------------------------------------------------------------
# Freudenthal-simplex interpolation (the 4-vertex alternative to trilinear)
#
# The containing tetrahedron of a point with cell fractions f is the Kuhn
# simplex of the permutation that sorts f descending: vertices v0 = floor,
# v_k = v_{k-1} + e_{axis with k-th largest fraction}, v3 = floor + 1, with
# barycentric weights (1 - s1, s1 - s2, s2 - s3, s3) for sorted fractions
# s1 >= s2 >= s3.  This triangulation is globally consistent (C0 across cell
# AND cube faces: the weight of any vertex not shared by the adjacent simplex
# vanishes on the shared face), and costs 4 random table rows per sample
# instead of 8 — the dominant TPU cost (see HashGridSpec.simplex_from).
# ---------------------------------------------------------------------------


def _simplex_ranks(fx, fy, fz):
    """Strict descending rank (0 = largest) of each axis fraction; ties break
    x before y before z so ranks are always a permutation of {0, 1, 2}."""
    rx = (fy > fx).astype(jnp.float32) + (fz > fx).astype(jnp.float32)
    ry = (fx >= fy).astype(jnp.float32) + (fz > fy).astype(jnp.float32)
    rz = (fx >= fz).astype(jnp.float32) + (fy >= fz).astype(jnp.float32)
    return rx, ry, rz


def _simplex_sorted(fx, fy, fz):
    """Fractions sorted descending (s1 >= s2 >= s3), elementwise."""
    s1 = jnp.maximum(fx, jnp.maximum(fy, fz))
    s3 = jnp.minimum(fx, jnp.minimum(fy, fz))
    return s1, fx + fy + fz - s1 - s3, s3


def _simplex_weights8(spec: "HashGridSpec", x: jnp.ndarray, lv0: int):
    """Simplex weights on the 8-corner slot layout for levels >= lv0.

    Corner with bits b carries barycentric weight w_m (m = popcount(b)) iff
    its bit pattern selects exactly the top-m ranked axes — i.e. it is one of
    the 4 tetra vertices — else 0.  Lets the slow/reference path
    (:func:`corner_indices_weights` + ``_encode_from_indices``) evaluate the
    simplex function with unchanged indices; only weights differ.  Rank-4
    intermediates are fine here — this path never runs hot."""
    res = np.array(spec.resolutions[lv0:], np.float32)
    scale = jnp.asarray(res)
    pos = x[:, None, :] * scale[None, :, None]  # [B, L', 3]
    pg = jnp.clip(jnp.floor(pos), 0.0, jnp.asarray(res - 1.0)[None, :, None])
    frac = pos - pg
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    ranks = jnp.stack(_simplex_ranks(fx, fy, fz), axis=-1)  # [B, L', 3]
    s1, s2, s3 = _simplex_sorted(fx, fy, fz)
    wm = jnp.stack([1.0 - s1, s1 - s2, s2 - s3, s3], axis=-1)  # [B, L', 4]
    m = _CORNERS.sum(axis=1)  # [8] static popcounts
    incl = ranks[:, :, None, :] < jnp.asarray(m.astype(np.float32))[
        None, None, :, None
    ]  # [B, L', 8, 3]
    bits_on = jnp.asarray(_CORNERS[None, None] == 1)
    match = jnp.all(incl == bits_on, axis=-1)  # [B, L', 8]
    return jnp.where(match, wm[:, :, m], 0.0)


def _all_levels_hashed(spec: HashGridSpec, style: int) -> bool:
    """Static check: does every level take the fast_hash path?  True for all
    practical configs (the dense path needs (res+1)^3 * 512 <= table, see
    module docstring); tiny test grids may differ."""
    for lvl in range(spec.num_levels):
        res, table = spec.resolutions[lvl], spec.table_sizes[lvl]
        stride = 1
        for _d in range(3):
            if stride <= table:
                stride *= res + 1
        if stride <= table:
            stride *= _MAX_STYLES
        if not stride > table:
            return False
    return True


def corner_indices_weights(spec: HashGridSpec, x: jnp.ndarray, style: int = 0):
    """All-level corner table indices and interpolation weights.

    Returns (flat_idx [B, L, 8] i32 into the flat table, weights [B, L, 8],
    oob [B] bool).  Weights are TRILINEAR on levels < ``spec.simplex_start``
    and SIMPLEX-BARYCENTRIC (4 nonzero of the 8 slots, via ``_apply_simplex8``)
    on levels >= it — callers doing analytic d/dx or occupancy math must not
    assume trilinear structure on the simplex suffix.  Pure int/elementwise math — cheap to recompute in the
    backward pass instead of saving 134 MB of indices as residuals.

    When every level takes the hash path (all practical configs), the level
    loop is fully vectorized into one [B, L, 8, 3] tensor expression — a ~16x
    smaller HLO graph than the per-level unroll, which matters for both
    compile time (the remote TPU compiler) and kernel fusion.
    """
    corners = jnp.asarray(_CORNERS)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)

    if _all_levels_hashed(spec, style):
        scales = jnp.asarray(np.array(spec.resolutions, np.float32))  # [L]
        res_i = jnp.asarray(np.array(spec.resolutions, np.int32))
        tables = jnp.asarray(np.array(spec.table_sizes, np.uint32))
        offsets = jnp.asarray(np.array(spec.offsets[:-1], np.int32))

        pos = x[:, None, :] * scales[None, :, None]  # [B, L, 3]
        pos_grid = jnp.clip(
            jnp.floor(pos), 0.0, (res_i - 1)[None, :, None].astype(jnp.float32)
        )
        frac = pos - pos_grid

        cc = pos_grid[:, :, None, :].astype(jnp.uint32) + corners[None, None].astype(
            jnp.uint32
        )  # [B, L, 8, 3]
        h = (
            cc[..., 0] * jnp.uint32(_PRIMES[0])
            ^ cc[..., 1] * jnp.uint32(_PRIMES[1])
            ^ cc[..., 2] * jnp.uint32(_PRIMES[2])
            ^ jnp.uint32((style * _PRIMES[3]) & 0xFFFFFFFF)
        )
        flat_idx = (h % tables[None, :, None]).astype(jnp.int32) + offsets[None, :, None]

        w = jnp.where(
            corners[None, None].astype(jnp.float32) == 1.0,
            frac[:, :, None, :],
            1.0 - frac[:, :, None, :],
        )
        weights = jnp.prod(w, axis=-1)  # [B, L, 8]
        return flat_idx, _apply_simplex8(spec, x, weights), oob

    all_idx, all_w = [], []
    for lvl in range(spec.num_levels):
        res = spec.resolutions[lvl]
        scale = jnp.float32(res)  # align_corners=True: scale = resolution (cu:138)
        pos = x * scale
        pos_grid = jnp.clip(jnp.floor(pos), 0.0, res - 1)  # cu:147
        frac = pos - pos_grid

        corner_coords = pos_grid[:, None, :].astype(jnp.int32) + corners[None]
        idx = _level_indices(corner_coords, res, spec.table_sizes[lvl], style)
        all_idx.append(idx + spec.offsets[lvl])

        w = jnp.where(
            corners[None].astype(jnp.float32) == 1.0,
            frac[:, None, :],
            1.0 - frac[:, None, :],
        )
        all_w.append(jnp.prod(w, axis=-1))

    flat_idx = jnp.stack(all_idx, axis=1)
    weights = jnp.stack(all_w, axis=1)
    return flat_idx, _apply_simplex8(spec, x, weights), oob


def _apply_simplex8(spec: HashGridSpec, x: jnp.ndarray, weights: jnp.ndarray):
    """Replace trilinear weights with simplex weights on simplex levels
    ([B, L, 8] slot layout; indices are interpolation-agnostic)."""
    lv0 = spec.simplex_start
    if lv0 >= spec.num_levels:
        return weights
    return jnp.concatenate(
        [weights[:, :lv0], _simplex_weights8(spec, x, lv0)], axis=1
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


def _encode_from_indices(embeddings, flat_idx, weights, oob, b, out_dim):
    """Dense/tiny-grid fallback gather (rank-4 intermediates — fine at the
    tiny sizes where the non-hash path can occur, never on the hot path)."""
    feats = embeddings[flat_idx]  # [B, L, 8, C]
    out = jnp.sum(weights[..., None] * feats, axis=2)  # [B, L, C]
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(b, out_dim)


def grid_initialize(
    spec: HashGridSpec,
    ref_spec: HashGridSpec,
    ref_embeddings: jnp.ndarray,
    num_styles: int = 64,
    chunk: int = 1 << 20,
) -> jnp.ndarray:
    """Multi-style table init: copy a trained (style-0) grid's features into
    every style slot of a fresh table.

    TPU-native rebuild of the reference ``grid_initialize`` CUDA kernel
    (``gridencoder/src/gridencoder.cu:495-571``; Python caller
    ``gridencoder/grid.py:154-164``): for each level, for every integer grid
    corner ``pos`` in ``[0, res]^3``, read the reference table's style-0 value
    at that corner and write it into the target table at the index law of
    every style ``s < num_styles``.  Hash collisions make the surviving value
    per row arbitrary — exactly like the CUDA kernel's unordered writes; when
    the index map is injective (tiled levels) the copy is exact.

    The feature is dormant in the reference (the ``StyleTCNerf.init_style``
    caller is commented out, ``networks/style_nerf.py:100-116``); provided for
    inventory completeness and future multi-style training.

    Returns a new ``[spec.total_params, C]`` table (chunked host loop — this
    is a one-time initialization, not a hot path; coarse levels are exact,
    levels beyond ~2^8 resolution saturate their hashmap identically to the
    reference).
    """
    c = ref_embeddings.shape[1]
    out = jnp.zeros((spec.total_params, c), ref_embeddings.dtype)
    for lvl in range(spec.num_levels):
        res = spec.resolutions[lvl]
        n_corners = (res + 1) ** 3
        for start in range(0, n_corners, chunk):
            ids = np.arange(start, min(start + chunk, n_corners), dtype=np.int64)
            side = res + 1
            pos = np.stack(
                [ids // (side * side), (ids // side) % side, ids % side], axis=-1
            ).astype(np.int32)
            pos_j = jnp.asarray(pos)
            ref_idx = (
                _level_indices(pos_j, res, ref_spec.table_sizes[lvl], style=0)
                + ref_spec.offsets[lvl]
            )
            vals = jnp.take(ref_embeddings, ref_idx, axis=0)
            for s in range(num_styles):
                idx_s = (
                    _level_indices(pos_j, res, spec.table_sizes[lvl], style=s)
                    + spec.offsets[lvl]
                )
                out = out.at[idx_s].set(vals)
    return out


# ---------------------------------------------------------------------------
# Flat-domain hashed encoding
#
# TPU layout note: materialized tensors are tiled (8, 128) on their two minor
# dims, so any tensor shaped [..., 8, C] or [..., C] with C=2 pads its lanes
# to 128 — observed as a 1 GB gather intermediate padding to 16 GB and OOMing
# the chip.  The hot path therefore never builds a rank>2 tensor: every
# quantity lives in a flat [B, N] domain with N = 8*L*C (2048 for the default
# L=16, C=2 — exactly 16 lanes x 128), where column j decomposes as
#
#   corner = j // (L*C)   (corner-major so the trilerp reduction is 8
#   l      = (j % (L*C)) // C            contiguous slice-adds)
#   ch     = j % C
#
# and all per-column level constants (scale, table size, offset, corner bits)
# are compile-time numpy vectors baked into the graph.  The output column
# order (l*C + ch) is exactly the reference's level-major [B, L*C] layout.
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _flat_plan(spec: HashGridSpec, style: int, lv0: int, lv1: int, k: int):
    """Per-column constants for levels [lv0, lv1) with k corner columns per
    level (8 trilinear / 4 simplex); column j = (level lv0 + j // k, slot
    j % k), so slice [s::k] is one corner/vertex slot across the levels."""
    lvls = np.arange(lv0, lv1)
    n = k * len(lvls)
    j = np.arange(n)
    lvl = lvls[j // k]
    plan = {
        "n": n,
        "scale": np.array(spec.resolutions, np.float32)[lvl],  # [N]
        "resm1": (np.array(spec.resolutions, np.float32) - 1.0)[lvl],
        "table": np.array(spec.table_sizes, np.uint32)[lvl],
        "offset": np.array(spec.offsets[:-1], np.int64)[lvl],
        "style_xor": np.uint32((style * _PRIMES[3]) & 0xFFFFFFFF),
    }
    if k == 8:
        bits = _CORNERS[j % 8]  # [N, 3]
        plan["bits"] = [bits[:, d].astype(np.float32) for d in range(3)]
    else:
        plan["vert"] = (j % 4).astype(np.float32)  # [N] vertex number 0..3
    return plan


def _flat_block_tri(spec: HashGridSpec, style: int, x, lv0: int, lv1: int):
    """Flat-domain trilinear corner ROW indices + weights for levels
    [lv0, lv1): (rows [B, 8*L'] i32, w [B, 8*L'] f32).  Pure elementwise math
    from constant vectors — cheap to recompute in the backward instead of
    saving residuals.

    Gather-granularity note (measured on v5e): XLA's TPU gather costs ~13 ns
    per gathered ROW regardless of row width, but ~60 ns per scalar ELEMENT.
    The encoder therefore always gathers whole [C]-channel rows from the
    [T, C] table and never expands to the per-element domain.
    """
    p = _flat_plan(spec, style, lv0, lv1, 8)
    h = jnp.zeros((x.shape[0], p["n"]), jnp.uint32)
    w = jnp.ones((x.shape[0], p["n"]), jnp.float32)
    scale = jnp.asarray(p["scale"])
    resm1 = jnp.asarray(p["resm1"])
    for d in range(3):
        pos = x[:, d : d + 1] * scale[None]  # [B, N]
        pg = jnp.clip(jnp.floor(pos), 0.0, resm1[None])
        frac = pos - pg
        bit = jnp.asarray(p["bits"][d])[None]
        w = w * (bit * frac + (1.0 - bit) * (1.0 - frac))
        cc = pg.astype(jnp.uint32) + jnp.asarray(p["bits"][d], np.uint32)[None]
        h = h ^ (cc * jnp.uint32(_PRIMES[d]))
    h = h ^ p["style_xor"]
    rows = (h % jnp.asarray(p["table"])[None]).astype(jnp.int32) + jnp.asarray(
        p["offset"], jnp.int32
    )[None]
    return rows, w


def _flat_block_simplex(spec: HashGridSpec, style: int, x, lv0: int, lv1: int):
    """Flat-domain simplex VERTEX row indices + barycentric weights for
    levels [lv0, lv1): (rows [B, 4*L'] i32, w [B, 4*L'] f32).  Vertex v of
    a level includes axis d iff rank_d < v (top-v ranked axes); hashes are
    identical to the trilinear corner with the same integer coords, so slow
    and fast paths agree exactly."""
    p = _flat_plan(spec, style, lv0, lv1, 4)
    scale = jnp.asarray(p["scale"])
    resm1 = jnp.asarray(p["resm1"])
    pgs, fr = [], []
    for d in range(3):
        pos = x[:, d : d + 1] * scale[None]  # [B, N]
        pg = jnp.clip(jnp.floor(pos), 0.0, resm1[None])
        pgs.append(pg)
        fr.append(pos - pg)
    ranks = _simplex_ranks(*fr)
    s1, s2, s3 = _simplex_sorted(*fr)
    vert = p["vert"]  # static numpy [N]
    w = jnp.where(
        jnp.asarray(vert == 0.0)[None], 1.0 - s1,
        jnp.where(
            jnp.asarray(vert == 1.0)[None], s1 - s2,
            jnp.where(jnp.asarray(vert == 2.0)[None], s2 - s3, s3),
        ),
    )
    h = jnp.full((x.shape[0], p["n"]), p["style_xor"], jnp.uint32)
    vert_j = jnp.asarray(vert)[None]
    for d in range(3):
        cc = pgs[d].astype(jnp.uint32) + (ranks[d] < vert_j).astype(jnp.uint32)
        h = h ^ (cc * jnp.uint32(_PRIMES[d]))
    rows = (h % jnp.asarray(p["table"])[None]).astype(jnp.int32) + jnp.asarray(
        p["offset"], jnp.int32
    )[None]
    return rows, w


def _flat_corners(spec: HashGridSpec, style: int, x):
    """Mixed flat-domain row indices + interpolation weights.

    Returns (rows8 [B, 8*Lc], w8, rows4 [B, 4*(L-Lc)], w4, oob [B]) where
    Lc = spec.simplex_start: trilinear 8-corner columns for the coarse level
    prefix, simplex 4-vertex columns for the fine suffix.  Either block may
    be empty ([B, 0])."""
    b = x.shape[0]
    l = spec.num_levels
    lc = spec.simplex_start
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    if lc > 0:
        rows8, w8 = _flat_block_tri(spec, style, x, 0, lc)
    else:
        rows8 = jnp.zeros((b, 0), jnp.int32)
        w8 = jnp.zeros((b, 0), jnp.float32)
    if lc < l:
        rows4, w4 = _flat_block_simplex(spec, style, x, lc, l)
    else:
        rows4 = jnp.zeros((b, 0), jnp.int32)
        w4 = jnp.zeros((b, 0), jnp.float32)
    return rows8, w8, rows4, w4, oob


def _block_encode(embeddings, rows, w, k: int):
    """Accumulate k per-slot row gathers -> [B*L', C] features (order (b, l));
    the k slot index streams are lane-strided column slices that fuse into
    the gather's index computation."""
    out = None
    for s in range(k):
        idx_c = rows[:, s::k].reshape(-1)  # [B*L'] ordered (b, l)
        term = jnp.take(embeddings, idx_c, axis=0) * w[:, s::k].reshape(-1)[:, None]
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# Ray-coherent corner dedup
#
# The encoder's cost is random table ROWS gathered per sample (~12.4 ns/row
# measured on v5e regardless of row width): naively 8 corners x L levels =
# 8L rows/sample.  But marched sample streams are ray-major and t-ordered, so
# at COARSE levels consecutive samples usually lie in the SAME grid cell
# (cells span dozens of dt steps) and their 8 corner rows are identical.
#
# The dedup path detects cell-change boundaries ("runs") per level with pure
# int compares, gathers the 8 corner rows ONLY at run starts (compacted into
# a static-cap buffer), and gives every sample its run's corner block back
# with ONE wide-row gather per (sample, level) — 8/runlen + 1 rows per sample
# per dedup level instead of 8.  The result is BITWISE-identical to the naive
# forward: reuse requires only "same integer base corner at this level", which
# the run flags test exactly (no reliance on ray ids or hash injectivity).
#
# The static cap is an estimate; if a batch's true run-start count exceeds it
# (pathological streams: dense-occupancy transients, heavy gaps), a
# ``lax.cond`` falls back to the naive path — slower, never wrong.  The CUDA
# reference has no analog (its L2 serves random 16 B reads at ~1-2 ns, so it
# just gathers all 8L rows; gridencoder.cu:84-235).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DedupPlan:
    """Static corner-dedup geometry.

    ``groups`` partitions a contiguous level PREFIX (0..k-1) into equal-size
    groups of consecutive levels (pairs by default).  Levels in a group share
    one run structure (a run breaks when ANY member level's cell changes) and
    one fill row — measured on v5e, a fill-gather row costs ~18 ns REGARDLESS
    of width (16-64 f32), so a [group_size*8*C]-wide fill row amortizes the
    dominant per-sample fill cost over the whole group, while run-start
    gathers stay proportional to the group's (union) cell-change rate.

    ``cap_fracs`` are per-group union new-cell-fraction estimates used to
    size the static run-start buffer (margin applied on top).
    """

    groups: Tuple[Tuple[int, ...], ...]
    cap_fracs: Tuple[float, ...]
    margin: float = 1.5

    def __post_init__(self):
        sizes = {len(g) for g in self.groups}
        assert len(sizes) == 1, "dedup groups must be uniform-size"
        flat = tuple(l for g in self.groups for l in g)
        assert flat == tuple(range(len(flat))), "groups must cover a level prefix"

    @property
    def levels(self) -> Tuple[int, ...]:
        return tuple(l for g in self.groups for l in g)

    @property
    def group_size(self) -> int:
        return len(self.groups[0])

    def cap(self, batch: int) -> int:
        raw = int(batch * sum(self.cap_fracs) * self.margin) + 8 * len(self.groups) + 8
        raw = -(-raw // 256) * 256
        return min(raw, len(self.groups) * batch)


def _plan_from_fracs(nf: "list[float]", max_newfrac: float, margin: float):
    """Pair consecutive qualifying levels into groups (see DedupPlan).

    A level qualifies while its estimated new-cell fraction stays below
    ``max_newfrac`` (beyond it, run-start gathers at the group's union rate
    cost more than the naive 8 rows).  An odd trailing level stays naive —
    a half-empty fill row would pay full fill cost for one level.
    """
    k = 0
    while k < len(nf) and nf[k] < max_newfrac:
        k += 1
    k -= k % 2  # pairs only
    if k == 0:
        return None
    groups = tuple((2 * g, 2 * g + 1) for g in range(k // 2))
    fracs = tuple(min(1.0, nf[a] + nf[b]) for a, b in groups)
    return DedupPlan(groups=groups, cap_fracs=fracs, margin=margin)


def dedup_plan(
    spec: HashGridSpec,
    dt_world: float,
    scene_size,
    *,
    max_newfrac: float = 0.6,
    margin: float = 1.5,
) -> Optional[DedupPlan]:
    """Plan corner dedup for marched sample streams.

    Args:
        spec: grid geometry.
        dt_world: world-space step between consecutive lattice samples
            (MarchPlan.dt).
        scene_size: per-axis world size of the scene bbox (host floats) —
            the encoder sees bbox-normalized coords squeezed by the
            reference's extra (x+1)/2 (models/fields.py), so one world unit
            is 1/(2*size_a) encoder units on axis a.
        max_newfrac: dedup a level only while its estimated new-cell
            fraction stays below this.
        margin: run-start capacity headroom over the estimate.

    Returns a DedupPlan, or None when no level qualifies.
    """
    size = np.asarray(scene_size, np.float64).reshape(-1)
    # expected |dir| component ~ 0.577 for unit vectors; crossings add per axis
    rate_unit = float(dt_world * 0.577 * np.sum(1.0 / (2.0 * size)))
    # dedup never covers simplex levels: their 4-row cost already undercuts
    # the run-start amortization at the fractions where dedup stops winning
    nf = [min(1.0, res * rate_unit) for res in spec.resolutions[: spec.simplex_start]]
    return _plan_from_fracs(nf, max_newfrac, margin)


def dedup_plan_for_grid_probes(
    spec: HashGridSpec,
    grid_size: int,
    *,
    max_newfrac: float = 0.6,
    margin: float = 1.8,
) -> Optional[DedupPlan]:
    """Dedup plan for occupancy-sweep probe streams.

    Probes are one-per-occupancy-cell in linear (minor-axis-fastest) order
    (ops/occupancy.py), jittered within their cell, so at hash level R the
    new-cell fraction is ~R/H plus jitter hopping at boundaries (margin
    covers it; the cond fallback covers the rest).
    """
    nf = [
        min(1.0, res / grid_size) for res in spec.resolutions[: spec.simplex_start]
    ]
    return _plan_from_fracs(nf, max_newfrac, margin)


def _dedup_structure(spec: HashGridSpec, plan: DedupPlan, x):
    """Run-boundary structure shared by the dedup forward and backward.

    Returns (fill_slot [G*B] i32, starts [cap] i32 positions into the
    group-major domain, ok scalar bool).  The group-major domain orders
    positions as p = g * B + b so each group's runs are contiguous; a run
    breaks when ANY member level's cell changes (exact reuse condition),
    and the first position of every group segment is forced a run start.
    """
    ng = len(plan.groups)
    b = x.shape[0]
    dom = ng * b
    cap = plan.cap(b)

    dl = plan.levels
    scale = jnp.asarray(np.array([spec.resolutions[l] for l in dl], np.float32))
    resm1 = scale - 1.0
    changed = jnp.zeros((b, len(dl)), bool)
    for d in range(3):
        # identical quantization law to _flat_corners (same fp32 ops)
        pos = x[:, d : d + 1] * scale[None]
        pg = jnp.clip(jnp.floor(pos), 0.0, resm1[None]).astype(jnp.int32)
        changed = changed | jnp.concatenate(
            [jnp.ones((1, len(dl)), bool), pg[1:] != pg[:-1]], axis=0
        )
    # group flag = OR over member levels
    flags_gm = jnp.concatenate(
        [
            jnp.any(jnp.stack([changed[:, l] for l in grp], axis=1), axis=1)
            for grp in plan.groups
        ]
    )  # [G*B]
    fill_slot = jnp.cumsum(flags_gm.astype(jnp.int32)) - 1
    n_rs = fill_slot[-1] + 1
    starts = compact_indices(flags_gm, cap, dom)
    return fill_slot, starts, n_rs <= cap


def _dedup_streams(plan: DedupPlan, arr):
    """Group-major [G*B] streams of ``arr``'s (level, corner) columns.

    Returns a list of ``group_size * 8`` streams: stream j holds, for every
    group-major position (g, b), column ``(groups[g][j // 8]) * 8 + (j % 8)``
    of ``arr`` — i.e. corner j%8 of the group's (j//8)-th member level.
    """
    s = plan.group_size
    out = []
    for j in range(s * 8):
        member, cnr = j // 8, j % 8
        out.append(
            jnp.concatenate([arr[:, grp[member] * 8 + cnr] for grp in plan.groups])
        )
    return out


def _encode_flat_dedup(spec: HashGridSpec, style: int, plan: DedupPlan, embeddings, x):
    """Dedup'd forward; identical gathers and weights to :func:`_encode_flat`
    (equal up to XLA's FMA reassociation; tested).

    Falls back to the naive gather via ``lax.cond`` when the batch's run-start
    count exceeds the static cap (rare; slower, never wrong).
    """
    b = x.shape[0]
    c = embeddings.shape[1]
    l = spec.num_levels
    lc = spec.simplex_start
    ld = len(plan.levels)  # dedup prefix; plan builders clamp ld <= lc
    # Fail loudly on a plan built against a different spec: a dedup prefix
    # reaching into the simplex suffix would silently index rows8 columns
    # that belong to other levels (cheap static check, ADVICE r4).
    assert ld <= lc, (
        f"DedupPlan covers {ld} levels but spec's trilinear prefix is {lc}"
    )
    s = plan.group_size
    ng = len(plan.groups)
    dom = ng * b
    cap = plan.cap(b)

    rows8, w8, rows4, w4, oob = _flat_corners(spec, style, x)
    fill_slot, starts, ok = _dedup_structure(spec, plan, x)

    def _suffix(emb):
        """Non-dedup'd levels: trilinear [ld, lc) + simplex [lc, L)."""
        outs = []
        if lc > ld:
            outs.append(
                _block_encode(emb, rows8[:, 8 * ld :], w8[:, 8 * ld :], 8).reshape(
                    b, -1
                )
            )
        if l > lc:
            outs.append(_block_encode(emb, rows4, w4, 4).reshape(b, -1))
        return outs

    def dedup_branch(emb):
        rows_gm = _dedup_streams(plan, rows8)
        w_gm = _dedup_streams(plan, w8)
        p_safe = jnp.minimum(starts, dom - 1)
        compact = jnp.concatenate(
            [jnp.take(emb, jnp.take(r, p_safe), axis=0) for r in rows_gm], axis=1
        )  # [cap, S*8*C]
        filled = jnp.take(compact, fill_slot, axis=0)  # [G*B, S*8*C]
        # per member level: trilerp reduction over its 8 corner blocks
        accs = []
        for member in range(s):
            acc = None
            for cnr in range(8):
                j = member * 8 + cnr
                term = filled[:, j * c : (j + 1) * c] * w_gm[j][:, None]
                acc = term if acc is None else acc + term
            accs.append(acc)  # [G*B, C]
        # assemble level-major output columns: level grp[g][m] block = accs[m][gB:(g+1)B]
        out_d = jnp.concatenate(
            [accs[m][g * b : (g + 1) * b] for g in range(ng) for m in range(s)],
            axis=1,
        )  # [B, Ld*C]
        return jnp.concatenate([out_d] + _suffix(emb), axis=1)

    def naive_branch(emb):
        outs = [_block_encode(emb, rows8[:, : 8 * ld], w8[:, : 8 * ld], 8).reshape(b, -1)]
        return jnp.concatenate(outs + _suffix(emb), axis=1)

    out = jax.lax.cond(ok, dedup_branch, naive_branch, embeddings)
    return jnp.where(oob[:, None], 0.0, out)


def _encode_flat(spec: HashGridSpec, style: int, embeddings, x):
    """All-hashed-levels forward via per-slot row gathers -> [B, L*C]:
    8 gathers for the trilinear level prefix, 4 for the simplex suffix.

    Layout discipline (each alternative was measured to force a padded
    relayout copy of the [K, 4] gather output — 16 GB at style-eval sizes):
    NO transposes, NO rank-3 intermediates, NO strided row slices.  Each
    slot's [B*L] index stream is a lane-strided column slice of the clean
    [B, kL] plan (fuses into the gather's index computation); each gather
    output [B*L, C] feeds a fused multiply-add accumulation.
    """
    b = x.shape[0]
    rows8, w8, rows4, w4, oob = _flat_corners(spec, style, x)
    outs = []
    if rows8.shape[1]:
        outs.append(_block_encode(embeddings, rows8, w8, 8).reshape(b, -1))
    if rows4.shape[1]:
        outs.append(_block_encode(embeddings, rows4, w4, 4).reshape(b, -1))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return jnp.where(oob[:, None], 0.0, out)


def hashgrid_encode(
    spec: HashGridSpec,
    embeddings: jnp.ndarray,
    x: jnp.ndarray,
    style: int = 0,
    fast_vjp: bool = True,
    bwd_pack: bool = False,
    dedup: Optional[DedupPlan] = None,
) -> jnp.ndarray:
    """Encode points through all levels.

    Args:
        spec: static geometry.
        embeddings: [total_params, C] table; C may exceed ``spec.level_dim``
            (the StyleNerf field concatenates its density+color tables into one
            [T, 4] operand so both encoders share a single gather — the corner
            indices are identical).
        x: [B, 3] coordinates in [0, 1] (out-of-range rows produce zeros).
        style: static style slot (0 in the reference's entire active path;
            multi-style tables are dormant, style_nerf.py:100-116).
        fast_vjp: use the TPU-optimized custom backward (sort-compact-scatter,
            see ``_encode_bwd``).  The fast path returns ZERO input-position
            gradients — positions are never differentiated in this framework
            (they come from the non-differentiable marcher, like the
            reference's detached march outputs); set False to get full
            autodiff including d/dx.
        bwd_pack: ride the backward's per-contribution values through the
            row sort as bf16 pairs packed into u32 (3 sort operands instead
            of 1 + C; measured 118 -> 89 ms at 16.8 M contributions on v5e).
            Contributions round to bf16 BEFORE the exact fp32 run
            accumulation — precision comparable to the reference's fp16
            atomicAdd scatter (gridencoder.cu:313-326).  Enabled by the
            models layer under bf16 (AMP) compute.
        dedup: optional ray-coherent corner-dedup plan (see
            :func:`dedup_plan`) — bitwise-identical outputs, fewer gathered
            rows on coarse levels for ray-marched (t-ordered) sample streams.

    Returns:
        [B, num_levels * C] features, level-major like the reference
        (grid.py:57-58 permutes [L, B, C] -> [B, L*C]).
    """
    c = embeddings.shape[1]
    if fast_vjp:
        import os

        # Debug switches: force exact fp32 sort payloads regardless of AMP
        # (bisecting precision-sensitive behavior) / disable corner dedup.
        if os.environ.get("NERFSTYLE_NO_BWD_PACK"):
            bwd_pack = False
        if os.environ.get("NERFSTYLE_NO_DEDUP"):
            dedup = None
        if dedup is not None and not dedup.levels:
            dedup = None
        return _encode_fast(spec, style, bwd_pack and c % 2 == 0, dedup, embeddings, x)
    flat_idx, weights, oob = corner_indices_weights(spec, x, style)
    return _encode_from_indices(
        embeddings, flat_idx, weights, oob, x.shape[0], spec.num_levels * c
    )


# ---------------------------------------------------------------------------
# TPU-optimized custom VJP
#
# The naive autodiff backward is an XLA scatter-add of B*L*8 (~33M) rows,
# which the TPU backend serializes at ~12-46 ns/row (measured) — seconds per
# step.  The custom backward instead:
#
#   1. sorts the (row, w*g[c0..cN]) contribution stream by table row, channel
#      values riding as extra 1-D sort operands (XLA TPU sort: ~5 ns/elem
#      measured on v5e);
#   2. collapses duplicate rows with per-channel cumsum + run-boundary
#      differences (pure vector math);
#   3. compacts the run ends with a second key-only sort;
#   4. performs ONE row scatter of at most `unique_cap` unique rows.
#
# This trades the 33M-row serialized scatter for two sorts + a table-sized
# scatter; the only remaining serialized op is proportional to the number of
# *touched table rows*, not contributions.
# Numerical note: the run-difference uses a global fp32 cumsum whose error is
# O(sqrt(K) * eps) relative — far tighter than the reference's fp16 atomicAdd
# accumulation (gridencoder.cu:313-326).
# ---------------------------------------------------------------------------

from functools import partial


def _pack_bf16_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 streams -> one u32 stream of (bf16(a) << 16) | bf16(b)."""
    hi = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    lo = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    return (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)


def _unpack_bf16_pair(ab: jnp.ndarray):
    hi = jax.lax.bitcast_convert_type((ab >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type((ab & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _encode_fast(
    spec: HashGridSpec, style: int, bwd_pack: bool, dedup: Optional[DedupPlan],
    embeddings, x,
):
    if _all_levels_hashed(spec, style):
        if dedup is not None:
            return _encode_flat_dedup(spec, style, dedup, embeddings, x)
        return _encode_flat(spec, style, embeddings, x)
    flat_idx, weights, oob = corner_indices_weights(spec, x, style)
    return _encode_from_indices(
        embeddings, flat_idx, weights, oob, x.shape[0], spec.num_levels * embeddings.shape[1]
    )


def _encode_fast_fwd(spec, style, bwd_pack, dedup, embeddings, x):
    out = _encode_fast(spec, style, bwd_pack, dedup, embeddings, x)
    return out, (jnp.zeros((0,), embeddings.dtype), x)


def _encode_fast_bwd(spec, style, bwd_pack, dedup, res, g):
    (emb_proto, x) = res
    emb_dtype = emb_proto.dtype
    b = x.shape[0]
    l = spec.num_levels
    c = g.shape[-1] // l
    t = spec.total_params

    if _all_levels_hashed(spec, style):
        lc = spec.simplex_start
        rows8, w8, rows4, w4, oob = _flat_corners(spec, style, x)
        g3 = jnp.where(oob[:, None, None], 0.0, g.reshape(b, l, c))
        if dedup is not None:
            d_emb = _dedup_bwd(
                spec, style, bwd_pack, dedup, x, rows8, w8, rows4, w4, g3
            )
            return d_emb.astype(emb_dtype), jnp.zeros_like(x)
        # Per-ROW contribution stream, ordered (slot, b, l) per block: pure
        # 1-D concatenations — no transposes, no rank-3, no sub-128 minors.
        per_slot_rows, per_slot_wg = [], [[] for _ in range(c)]
        for block_rows, block_w, k, g_blk in (
            (rows8, w8, 8, g3[:, :lc]),
            (rows4, w4, 4, g3[:, lc:]),
        ):
            if not block_rows.shape[1]:
                continue
            g_flat = [g_blk[..., j].reshape(-1) for j in range(c)]  # [B*L']
            for slot in range(k):
                per_slot_rows.append(block_rows[:, slot::k].reshape(-1))
                w_s = block_w[:, slot::k].reshape(-1)
                for j in range(c):
                    per_slot_wg[j].append((w_s * g_flat[j]).astype(jnp.float32))
        rows_k = jnp.concatenate(per_slot_rows)
        vals = [jnp.concatenate(v) for v in per_slot_wg]
    else:
        flat_idx, weights, oob = corner_indices_weights(spec, x, style)  # [B, L, 8]
        g3 = jnp.where(oob[:, None, None], 0.0, g.reshape(b, l, c))
        per_corner_rows = [flat_idx[:, :, cnr].reshape(-1) for cnr in range(8)]
        per_corner_w = [weights[:, :, cnr].reshape(-1) for cnr in range(8)]
        rows_k = jnp.concatenate(per_corner_rows)
        w_k = jnp.concatenate(per_corner_w)
        vals = []
        for j in range(c):
            gj = jnp.tile(g3[..., j].reshape(-1), 8)  # [(corner, b, l)]
            vals.append((w_k * gj).astype(jnp.float32))

    d_emb = _sort_scatter(rows_k, vals, t, bwd_pack and c % 2 == 0)
    return d_emb.astype(emb_dtype), jnp.zeros_like(x)


def _dedup_bwd(spec, style, bwd_pack, dedup, x, rows8, w8, rows4, w4, g3):
    """Table cotangent with the dedup-reduced contribution stream.

    Dedup-level cotangents are segment-summed over runs (contiguous by
    construction: cumsum + diff at run ends) so each run contributes ONE
    weighted row per corner to the sort pipeline instead of runlen rows.
    Falls back to the naive stream via ``lax.cond`` on cap overflow, exactly
    mirroring the forward's branch (same predicate, recomputed).
    """
    b = x.shape[0]
    l = spec.num_levels
    lc = spec.simplex_start
    c = g3.shape[-1]
    t = spec.total_params
    ld = len(dedup.levels)
    assert ld <= lc, (  # mismatched plan guard, mirrors _encode_flat_dedup
        f"DedupPlan covers {ld} levels but spec's trilinear prefix is {lc}"
    )
    s = dedup.group_size
    ng = len(dedup.groups)
    dom = ng * b
    cap = dedup.cap(b)
    pack = bwd_pack and c % 2 == 0

    fill_slot, starts, ok = _dedup_structure(spec, dedup, x)

    def _suffix_streams(stream_rows, stream_vals, g3):
        """Append non-dedup'd levels: trilinear [ld, lc) + simplex [lc, L)."""
        for block_rows, block_w, k, g_blk in (
            (rows8[:, 8 * ld :], w8[:, 8 * ld :], 8, g3[:, ld:lc]),
            (rows4, w4, 4, g3[:, lc:]),
        ):
            if not block_rows.shape[1]:
                continue
            g_flat = [g_blk[..., ch].reshape(-1) for ch in range(c)]
            for slot in range(k):
                stream_rows.append(block_rows[:, slot::k].reshape(-1))
                w_s = block_w[:, slot::k].reshape(-1)
                for ch in range(c):
                    stream_vals[ch].append((w_s * g_flat[ch]).astype(jnp.float32))

    def dedup_branch(g3):
        rows_gm = _dedup_streams(dedup, rows8)
        w_gm = _dedup_streams(dedup, w8)
        # weighted cotangent per (position, member-corner, channel): [G*B, S*8*C]
        g_members = [
            jnp.concatenate([g3[:, grp[m], :] for grp in dedup.groups], axis=0)
            for m in range(s)
        ]  # each [G*B, C]
        g_filled = jnp.concatenate(
            [
                g_members[j // 8] * w_gm[j][:, None]
                for j in range(s * 8)
            ],
            axis=1,
        )
        cums = jnp.cumsum(g_filled.astype(jnp.float32), axis=0)
        ends = jnp.clip(
            jnp.concatenate([starts[1:], jnp.full((1,), dom, starts.dtype)]) - 1,
            0, dom - 1,
        )
        c_end = jnp.take(cums, ends, axis=0)  # [cap, S*8*C]
        g_compact = c_end - jnp.concatenate(
            [jnp.zeros((1, s * 8 * c), jnp.float32), c_end[:-1]], axis=0
        )
        p_safe = jnp.minimum(starts, dom - 1)
        stream_rows = [jnp.take(r, p_safe) for r in rows_gm]  # S*8 x [cap]
        stream_vals = [
            [g_compact[:, j * c + ch] for j in range(s * 8)] for ch in range(c)
        ]
        _suffix_streams(stream_rows, stream_vals, g3)
        rows_k = jnp.concatenate(stream_rows)
        vals = [jnp.concatenate(v) for v in stream_vals]
        return _sort_scatter(rows_k, vals, t, pack)

    def naive_branch(g3):
        stream_rows, stream_vals = [], [[] for _ in range(c)]
        g_d = [g3[:, :ld, ch].reshape(-1) for ch in range(c)]
        for cnr in range(8):
            stream_rows.append(rows8[:, : 8 * ld][:, cnr::8].reshape(-1))
            w_c = w8[:, : 8 * ld][:, cnr::8].reshape(-1)
            for ch in range(c):
                stream_vals[ch].append((w_c * g_d[ch]).astype(jnp.float32))
        _suffix_streams(stream_rows, stream_vals, g3)
        rows_k = jnp.concatenate(stream_rows)
        vals = [jnp.concatenate(v) for v in stream_vals]
        return _sort_scatter(rows_k, vals, t, pack)

    return jax.lax.cond(ok, dedup_branch, naive_branch, g3)


def _sort_scatter(rows_k, vals, t, bwd_pack):
    """Contribution stream -> dense [T, C] table gradient.

    The shared tail of the custom backward: sort by table row, collapse runs
    with cumsum differences, compact run ends with a second sort, scatter
    unique rows (see the pipeline note above).
    """
    k = rows_k.shape[0]
    c = len(vals)
    # 1. one sort of the row stream, channels riding along — packed as bf16
    #    pairs when allowed (1 + C/2 operands instead of 1 + C; the exact
    #    fp32 accumulation below is unchanged, only per-contribution values
    #    round — see hashgrid_encode(bwd_pack=...)).
    if bwd_pack and c % 2 == 0:
        packed = [
            _pack_bf16_pair(vals[j], vals[j + 1]) for j in range(0, c, 2)
        ]
        sorted_ops = jax.lax.sort((rows_k, *packed), num_keys=1)
        idx_s = sorted_ops[0]
        vals_s = []
        for ab in sorted_ops[1:]:
            hi, lo = _unpack_bf16_pair(ab)
            vals_s.extend((hi, lo))
    else:
        sorted_ops = jax.lax.sort((rows_k, *vals), num_keys=1)
        idx_s, vals_s = sorted_ops[0], sorted_ops[1:]

    # 2. run totals at run ends via cumsum differences computed IN PLACE:
    #    total[i] = cums[i] - cums[prev_end]; prev_end's cumsum rides to
    #    position i by masking non-end cumsums to 0 and taking a shifted
    #    running max of (position-tagged) end cumsums... simpler: delta at
    #    every position, then a second sort compacts ends (no gathers — the
    #    v5e element-gather rate of ~60 ns/elem makes gather-based compaction
    #    the bottleneck, while sort is ~5 ns/elem).
    is_end = jnp.concatenate([idx_s[1:] != idx_s[:-1], jnp.ones((1,), bool)])
    cums = [jnp.cumsum(v) for v in vals_s]

    # 3. second sort moves run-end rows to the front, ordered by table row;
    #    everything else carries sentinel key t and sorts to the back.
    unique_cap = min(k, t)
    key2 = jnp.where(is_end, idx_s, jnp.int32(t))
    # carried: end-cumsums (zeroed elsewhere so prev-diff works after slice)
    carried = [jnp.where(is_end, cu, 0.0) for cu in cums]
    sorted2 = jax.lax.sort((key2, *carried), num_keys=1)
    run_idx = sorted2[0][:unique_cap]
    valid = run_idx < t
    # NOTE: within equal keys XLA sort is stable, and run-end cumsums are
    # strictly ordered by their original position per key (one end per key),
    # so after the slice, ends of distinct rows appear in row order and the
    # exclusive-prefix diff below is exact.
    d_flat = []
    for j, ec in enumerate(sorted2[1:]):
        ec = ec[:unique_cap]
        prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), ec[:-1]])
        tot = jnp.where(valid, ec - prev, 0.0)
        # 4. per-channel 1-D scatter of unique rows (a [U, C] row scatter
        #    measured 7x slower than C 1-D scatters on v5e)
        d_flat.append(
            jnp.zeros((t,), jnp.float32).at[jnp.where(valid, run_idx, t)].add(
                tot, mode="drop", unique_indices=True, indices_are_sorted=True
            )
        )
    return jnp.stack(d_flat, axis=-1)


_encode_fast.defvjp(_encode_fast_fwd, _encode_fast_bwd)
