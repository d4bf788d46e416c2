"""Multi-resolution (cascaded) occupancy grid state and maintenance.

TPU-native rebuild of the occupancy grid owned by the reference Renderer
(``/root/reference/renderer.py:61-66,120-194``) plus the ``packbits`` CUDA
kernel (``raymarching/src/raymarching.cu:367-399``).

Design differences (deliberate, layout-only):

  * Cells are addressed **linearly** (x*H*H + y*H + z) instead of Morton order.
    Morton addressing in the reference is a GPU cache trick; on TPU the grid is
    consulted via one big gather, where layout is irrelevant.  Morton ops are
    still available in ``ops/morton.py`` for interop.
  * The bitfield is kept as a ``bool`` array (one byte per cell on device)
    rather than packed bits: a gather of bools vectorizes better than
    byte-probe + bit-shift, and 4 MB (128^3 x 2 cascades) is immaterial next
    to HBM capacity.  ``packbits``/``unpackbits`` convert to the packed uint8
    format for compact checkpoints and reference interop.
  * Updates are jitted pure functions of an :class:`OccupancyState` pytree; the
    occupied-cell resampling draws via inverse-CDF (cumsum + searchsorted) over
    the >0 mask instead of host-side ``nonzero`` (renderer.py:171-175), keeping
    the whole update on device with O(n) memory.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyState(NamedTuple):
    """Pytree of occupancy-grid arrays (reference fields: renderer.py:61-69).

    ``skipdist`` is a TPU-native addition with no reference counterpart: the
    per-cell L-inf distance (in cells, capped at SKIP_DMAX) to the nearest
    occupied cell of the same cascade.  The adaptive marcher uses it for
    empty-space skipping — the CUDA marcher gets the same effect from
    per-thread DDA mip traversal (raymarching.cu:497-499), which has no
    vectorizable analog.
    """

    density_grid: jnp.ndarray  # [cascade, H**3] f32, -1 marks never-sampled? (ref keeps >=0)
    bitfield: jnp.ndarray  # [cascade * H**3] bool, True = occupied
    skipdist: jnp.ndarray  # [cascade * H**3] uint8, 0 = occupied
    mean_density: jnp.ndarray  # f32 scalar
    mean_count: jnp.ndarray  # i32 scalar: running mean of points per batch
    local_step: jnp.ndarray  # i32 scalar: number of training marches done


SKIP_DMAX = 15  # cap on stored skip distance (cells)


class PersistedOccupancy(NamedTuple):
    """Checkpoint form of OccupancyState: exactly the reference's persisted
    fields (renderer.py:78-91) in the original leaf order — ``skipdist`` is
    derived data and is rebuilt on load, keeping checkpoints stable across
    marching-implementation changes."""

    density_grid: jnp.ndarray
    bitfield: jnp.ndarray
    mean_density: jnp.ndarray
    mean_count: jnp.ndarray
    local_step: jnp.ndarray


def occupancy_persistable(s: "OccupancyState") -> PersistedOccupancy:
    return PersistedOccupancy(
        s.density_grid, s.bitfield, s.mean_density, s.mean_count, s.local_step
    )


def occupancy_restore(p: PersistedOccupancy, grid_size: int) -> "OccupancyState":
    return OccupancyState(
        density_grid=p.density_grid,
        bitfield=p.bitfield,
        skipdist=skipdist_from_bitfield(p.bitfield, grid_size),
        mean_density=p.mean_density,
        mean_count=p.mean_count,
        local_step=p.local_step,
    )


def _dilate3(occ: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 binary dilation of [cascade, H, H, H], non-wrapping."""
    for ax in (1, 2, 3):
        pad = [(0, 0)] * 4
        pad[ax] = (1, 1)
        a = jnp.pad(occ, pad)
        lo = [slice(None)] * 4
        mid = [slice(None)] * 4
        hi = [slice(None)] * 4
        lo[ax], mid[ax], hi[ax] = slice(0, -2), slice(1, -1), slice(2, None)
        occ = a[tuple(lo)] | a[tuple(mid)] | a[tuple(hi)]
    return occ


def skipdist_from_bitfield(bitfield: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """L-inf distance transform (capped at SKIP_DMAX) via iterated dilation.

    dist[c] = 0 iff occupied; else min L-inf cell distance to an occupied
    cell; SKIP_DMAX means "at least SKIP_DMAX".  Cost: SKIP_DMAX * 6 shifted
    ORs over the grid — trivial next to the density probes that precede it.
    """
    h = grid_size
    occ = bitfield.reshape(-1, h, h, h)
    dist = jnp.full(occ.shape, SKIP_DMAX, jnp.uint8)
    for k in range(SKIP_DMAX):
        dist = jnp.where(occ & (dist == SKIP_DMAX), jnp.uint8(k), dist)
        if k < SKIP_DMAX - 1:
            occ = _dilate3(occ)
    return dist.reshape(-1)


def occupancy_init(cascade: int, grid_size: int) -> OccupancyState:
    n = grid_size**3
    return OccupancyState(
        density_grid=jnp.zeros((cascade, n), jnp.float32),
        bitfield=jnp.zeros((cascade * n,), jnp.bool_),
        skipdist=jnp.full((cascade * n,), SKIP_DMAX, jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        mean_count=jnp.zeros((), jnp.int32),
        local_step=jnp.zeros((), jnp.int32),
    )


def cell_linear_index(coords: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """[..., 3] int cell coords -> [...] linear index (x-major)."""
    return (coords[..., 0] * grid_size + coords[..., 1]) * grid_size + coords[..., 2]


def all_cell_coords(grid_size: int) -> np.ndarray:
    """Static [H**3, 3] list of all cell coords in linear-index order."""
    r = np.arange(grid_size, dtype=np.int32)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)


def cells_to_cascade_points(
    coords: jnp.ndarray,
    cas: int,
    grid_size: int,
    bound: float,
    key: jax.Array,
) -> jnp.ndarray:
    """Jittered world-space sample points for cells at cascade level ``cas``
    (reference _compute_occ_sigmas, renderer.py:120-133)."""
    cas_bound = min(2.0**cas, bound)
    half = cas_bound / grid_size
    xyz = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0  # [-1, 1]
    pts = xyz * (cas_bound - half)
    jitter = jax.random.uniform(key, pts.shape, jnp.float32, -1.0, 1.0) * half
    return pts + jitter


def _merge_and_threshold(
    state: OccupancyState,
    tmp_grid: jnp.ndarray,
    density_decay: float,
    density_thresh: float,
) -> OccupancyState:
    """EMA-decay-max merge + binarization (renderer.py:183-190)."""
    grid = state.density_grid
    valid = (grid >= 0) & (tmp_grid >= 0)
    grid = jnp.where(valid, jnp.maximum(grid * density_decay, tmp_grid), grid)
    mean_density = jnp.mean(jnp.clip(grid, min=0.0))
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = (grid > thresh).reshape(-1)
    grid_size = round(state.density_grid.shape[1] ** (1 / 3))
    return state._replace(
        density_grid=grid,
        bitfield=bitfield,
        skipdist=skipdist_from_bitfield(bitfield, grid_size),
        mean_density=mean_density,
    )


def occupancy_update_full(
    state: OccupancyState,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    *,
    bound: float,
    density_scale: float,
    density_decay: float,
    density_thresh: float,
    chunk: int = 64 * 64 * 64,
) -> OccupancyState:
    """Full sweep: sample every cell of every cascade (renderer.py:142-161).

    ``sigma_fn``: [N, 3] world pts -> [N] raw densities (pre density_scale).
    ``chunk`` bounds the number of points per model call via ``lax.map``.
    """
    cascade, n = state.density_grid.shape
    grid_size = round(n ** (1 / 3))
    coords = jnp.asarray(all_cell_coords(grid_size))  # linear order -> index == position
    chunk = min(chunk, n)
    while n % chunk != 0:  # grid_size**3 is a power of two in practice
        chunk //= 2

    def one_cascade(cas: int, k: jax.Array) -> jnp.ndarray:
        pts = cells_to_cascade_points(coords, cas, grid_size, bound, k)
        sig = jax.lax.map(sigma_fn, pts.reshape(-1, chunk, 3))
        return sig.reshape(-1) * density_scale

    keys = jax.random.split(key, cascade)
    tmp = jnp.stack([one_cascade(c, keys[c]) for c in range(cascade)])
    return _merge_and_threshold(state, tmp, density_decay, density_thresh)


def occupancy_update_random(
    state: OccupancyState,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    *,
    bound: float,
    density_scale: float,
    density_decay: float,
    density_thresh: float,
    chunk: int = 64 * 64 * 64,
) -> OccupancyState:
    """Random update: H**3/4 uniform cells + as many resampled occupied cells
    per cascade (renderer.py:163-181).  ``chunk`` bounds points per model call
    (at H=128 the batch is 2*H**3/4 = 1M points — unchunked, the encoder
    gather intermediates alone exceed HBM).

    The occupied resampling draws uniformly over currently-positive cells via
    inverse-CDF sampling on the binary mask — equivalent in distribution to the
    reference's nonzero + randint, but shape-static and on-device.
    """
    cascade, n = state.density_grid.shape
    grid_size = round(n ** (1 / 3))
    num = n // 4

    def one_cascade(cas: int, k: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k_unif, k_occ, k_jit = jax.random.split(k, 3)
        unif_coords = jax.random.randint(k_unif, (num, 3), 0, grid_size, jnp.int32)
        unif_idx = cell_linear_index(unif_coords, grid_size)

        # Uniform draw over currently-occupied cells via inverse-CDF on the
        # binary mask: cumsum + searchsorted is O(n) memory, where categorical
        # would materialize [num, n] gumbel noise (4 TB at H=128, num=H^3/4).
        occ_mask = state.density_grid[cas] > 0
        any_occ = jnp.any(occ_mask)  # guard: all-empty grid -> uniform draw
        weights = jnp.where(any_occ, occ_mask.astype(jnp.float32), 1.0)
        cdf = jnp.cumsum(weights)
        u = jax.random.uniform(k_occ, (num,)) * cdf[-1]
        occ_idx = jnp.clip(
            jnp.searchsorted(cdf, u, side="right"), 0, n - 1
        ).astype(jnp.int32)
        occ_coords = jnp.stack(
            [occ_idx // (grid_size * grid_size), (occ_idx // grid_size) % grid_size,
             occ_idx % grid_size],
            axis=-1,
        )

        idx = jnp.concatenate([unif_idx, occ_idx])
        coords = jnp.concatenate([unif_coords, occ_coords])
        # Sort probes into linear cell order: the scatter-max below is
        # order-invariant and the jitter is iid, so this changes nothing
        # distributionally — but it gives the probe stream the same spatial
        # coherence as the full sweep, which the encoder's corner dedup
        # exploits (ops/hashgrid.py dedup_plan_for_grid_probes).
        idx, c0, c1, c2 = jax.lax.sort(
            (idx, coords[:, 0], coords[:, 1], coords[:, 2]), num_keys=1
        )
        coords = jnp.stack([c0, c1, c2], axis=-1)
        pts = cells_to_cascade_points(coords, cas, grid_size, bound, k_jit)
        ck = min(chunk, 2 * num)
        while (2 * num) % ck != 0:
            ck //= 2
        sig = jax.lax.map(sigma_fn, pts.reshape(-1, ck, 3)).reshape(-1)
        return idx, sig * density_scale

    tmp = -jnp.ones_like(state.density_grid)
    keys = jax.random.split(key, cascade)
    for cas in range(cascade):
        idx, sig = one_cascade(cas, keys[cas])
        # scatter-max: deterministic under duplicate cell draws
        tmp = tmp.at[cas, idx].max(sig)
    return _merge_and_threshold(state, tmp, density_decay, density_thresh)


def update_mean_count(state: OccupancyState, batch_points: jnp.ndarray) -> OccupancyState:
    """Exponential running mean of compacted point count per training batch.

    Replaces the reference's 16-slot step counter ring (renderer.py:66,192-194)
    with an EMA — used only to pick the compaction-budget bucket.
    """
    bp = batch_points.astype(jnp.float32)
    mc = state.mean_count.astype(jnp.float32)
    new = jnp.where(state.local_step == 0, bp, 0.875 * mc + 0.125 * bp)
    return state._replace(
        mean_count=new.astype(jnp.int32), local_step=state.local_step + 1
    )


def packbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """bool [K] -> uint8 [K/8], LSB-first (parity with raymarching.cu packbits:
    bit index = cell % 8)."""
    k = bitfield.shape[0]
    assert k % 8 == 0
    bits = bitfield.reshape(k // 8, 8).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


def unpackbits(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8 [K/8] -> bool [K], LSB-first."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts[None, :]) & 1
    return bits.reshape(-1).astype(jnp.bool_)
