"""Neural field models (hash-grid NeRFs) as functional param pytrees.

TPU-native rebuild of the reference models:

  * ``StyleNerfField``  <- ``StyleTCNerf`` (/root/reference/networks/style_nerf.py:12-159)
    — the model the reference actually trains: two separate hash grids (density
    vs color) so the stylization stage can optimize color only, plus four
    64-wide MLP heads (density / color1 / color2 / class).
  * ``NerfField``       <- ``TCNerf`` (/root/reference/networks/tcnn_nerf.py:72-139)
    — the classic instant-ngp variant (kept for parity; unused by the main path).

Design: params are plain nested dicts (pytrees); ``field_apply`` is a pure
function, so it jits, vmaps, shards and differentiates without any module
machinery.  Top-level param keys exactly mirror the reference module names
(``x_density_embedder``, ``x_color_embedder``, ``*_net``), so the trainer's
keyword-based optimizer filtering (trainers/base.py:185-199, OPTIM_KEYS) works
identically.

Domain note: the reference normalizes points to [0, 1] via BBox.normalize
(style_nerf.py:121) and then GridEncoder.forward *additionally* maps
``(x + bound) / (2 * bound)`` with bound=1 (gridencoder/grid.py:177), so the
encoder effectively sees [0.5, 1]^3.  Replicated verbatim for parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import BBox
from ..ops.hashgrid import (
    DedupPlan,
    HashGridSpec,
    dedup_plan,
    hashgrid_encode,
    hashgrid_init,
    hashgrid_spec,
)
from ..ops.mlp import mlp_apply, mlp_init, trunc_exp
from ..ops.sh import sh_encode

Params = Dict[str, object]


@dataclass(frozen=True)
class FieldSpec:
    """Static model architecture (from NetworkConfig; config.py:280-324)."""

    grid: HashGridSpec
    class_dim: int = 0
    use_dir: bool = False
    sh_degree: int = 4
    density_hidden_dims: int = 64
    density_hidden_layers: int = 1
    density_out_dims: int = 16  # NerfField only
    rgb_hidden_dims: int = 64
    rgb_hidden_layers: int = 2
    kind: str = "style"  # "style" (StyleTCNerf) | "base" (TCNerf)
    # Constant added to the density head's output before trunc_exp; negative
    # values initialize space empty (see NetworkConfig.density_offset).
    density_offset: float = 0.0
    # Ray-coherent corner dedup for marched sample streams (ops/hashgrid.py
    # DedupPlan); None disables.  Attach via with_dedup().
    dedup: Optional[DedupPlan] = None

    @property
    def out_channels(self) -> int:
        return 3 + self.class_dim if self.kind == "style" else 3


def with_dedup(spec: FieldSpec, max_steps: int, scene_size) -> FieldSpec:
    """Attach a corner-dedup plan derived from the march step and scene size.

    ``max_steps`` is the renderer's samples-per-ray cap (the constant lattice
    step is dt = 2*sqrt(3)/max_steps, ops/marching.py); ``scene_size`` the
    per-axis world bbox size (host floats).  Dedup changes no numerics — the
    encoder output is bitwise-identical (tested) — only the gather volume.
    """
    import dataclasses
    import math

    dt = 2.0 * math.sqrt(3.0) / max_steps
    plan = dedup_plan(spec.grid, dt, np.asarray(scene_size, np.float64))
    return dataclasses.replace(spec, dedup=plan)


def make_grid_spec(
    n_lvls: int,
    n_feats_per_lvl: int,
    hashmap_size: int,
    min_res: int,
    max_res_coeff: float,
    max_bound: float,
    simplex_from: int = -1,
) -> HashGridSpec:
    """Grid spec from NetworkConfig.pos_enc + scene bound
    (reference get_grid_encoder, networks/tcnn_nerf.py:14-35).

    ``simplex_from``: first level interpolated on the Freudenthal simplex (4
    gathered rows/sample instead of 8); -1 = all trilinear (reference
    parity).  See HashGridSpec.simplex_from / HashGridConfig.simplex_from.
    """
    import numpy as np

    max_res = max_res_coeff * max_bound
    per_lvl_scale = float(np.exp2(np.log2(max_res / min_res) / (n_lvls - 1)))
    return hashgrid_spec(
        num_levels=n_lvls,
        level_dim=n_feats_per_lvl,
        base_resolution=min_res,
        per_level_scale=per_lvl_scale,
        log2_hashmap_size=hashmap_size,
        simplex_from=simplex_from,
    )


def style_field_spec(
    grid: HashGridSpec,
    class_dim: int,
    use_dir: bool = False,
    sh_degree: int = 4,
    density_hidden_dims: int = 64,
    density_hidden_layers: int = 1,
    rgb_hidden_dims: int = 64,
    rgb_hidden_layers: int = 2,
    density_offset: float = 0.0,
) -> FieldSpec:
    return FieldSpec(
        grid=grid,
        class_dim=class_dim,
        use_dir=use_dir,
        sh_degree=sh_degree,
        density_hidden_dims=density_hidden_dims,
        density_hidden_layers=density_hidden_layers,
        rgb_hidden_dims=rgb_hidden_dims,
        rgb_hidden_layers=rgb_hidden_layers,
        kind="style",
        density_offset=density_offset,
    )


def field_init(key: jax.Array, spec: FieldSpec) -> Params:
    """Initialize all parameters (seeded by NetworkConfig.network_seed)."""
    enc_dim = spec.grid.output_dim
    sh_dim = spec.sh_degree**2 if spec.use_dir else 0
    keys = jax.random.split(key, 8)

    if spec.kind == "style":
        # StyleTCNerf (style_nerf.py:29-98)
        return {
            "x_density_embedder": hashgrid_init(keys[0], spec.grid),
            "x_color_embedder": hashgrid_init(keys[1], spec.grid),
            "density_net": mlp_init(
                keys[2], enc_dim, spec.density_hidden_dims, spec.density_hidden_layers, 1
            ),
            "color1_net": mlp_init(
                keys[3], enc_dim, spec.density_hidden_dims, spec.density_hidden_layers, 16
            ),
            "color2_net": mlp_init(
                keys[4], 16 + sh_dim, spec.rgb_hidden_dims, spec.rgb_hidden_layers, 3
            ),
            "class_net": mlp_init(
                keys[5], enc_dim, spec.density_hidden_dims, spec.density_hidden_layers,
                spec.class_dim,
            ),
        }
    # TCNerf (tcnn_nerf.py:85-122)
    return {
        "x_embedder": hashgrid_init(keys[0], spec.grid),
        "density_net": mlp_init(
            keys[2], enc_dim, spec.density_hidden_dims, spec.density_hidden_layers,
            spec.density_out_dims,
        ),
        "rgb_net": mlp_init(
            keys[3],
            spec.density_out_dims - 1 + spec.sh_degree**2,
            spec.rgb_hidden_dims,
            spec.rgb_hidden_layers,
            3,
        ),
    }


def _encoder_input(bbox: BBox, pts: jnp.ndarray) -> jnp.ndarray:
    """bbox-normalize to [0,1] then apply the reference's (x+1)/2 quirk."""
    pts_n = bbox.normalize(pts)
    return (pts_n + 1.0) / 2.0


def field_density(
    spec: FieldSpec,
    params: Params,
    bbox: BBox,
    pts: jnp.ndarray,
    compute_dtype=jnp.float32,
    use_dedup: bool = True,
) -> jnp.ndarray:
    """Density-only forward: [M, 3] -> [M] sigmas (style_nerf.py:120-127).

    ``use_dedup=False`` opts out of corner dedup for point streams with no
    spatial coherence (e.g. uniform-random sparsity samples), where the
    run-start cap would chronically overflow into the cond fallback.
    """
    x = _encoder_input(bbox, pts)
    emb_key = "x_density_embedder" if spec.kind == "style" else "x_embedder"
    h = hashgrid_encode(
        spec.grid, params[emb_key], x,
        bwd_pack=compute_dtype == jnp.bfloat16,
        dedup=spec.dedup if use_dedup else None,
    )
    out = mlp_apply(params["density_net"], h, compute_dtype=compute_dtype)
    return trunc_exp(out[:, 0] + spec.density_offset)


def field_color(
    spec: FieldSpec,
    params: Params,
    bbox: BBox,
    pts: jnp.ndarray,
    dirs: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Color-branch-only forward: [M, 3] pts (+dirs) -> channels [M, 3+K].

    StyleTCNerf's color heads (style_nerf.py:129-142) read ONLY the color
    embedder, so weight-significant samples whose density is already known
    (the two-phase inference renderer, the style stage's frozen-geometry
    cache) can skip the density table and MLP entirely.  No corner dedup:
    compacted significant-sample streams have no run coherence, so the
    run-start cap would chronically overflow into the cond fallback.

    For the base TCNerf the color head consumes the density MLP's hidden
    features (tcnn_nerf.py:126-139) — there is no density-free color path,
    so this falls back to the full forward and returns its channels.
    """
    if spec.kind != "style":
        rgbs, _ = field_apply(spec, params, bbox, pts, dirs, compute_dtype)
        return rgbs

    x = _encoder_input(bbox, pts)
    h_color = hashgrid_encode(
        spec.grid, params["x_color_embedder"], x,
        bwd_pack=compute_dtype == jnp.bfloat16,
    )
    classes = mlp_apply(params["class_net"], h_color, compute_dtype=compute_dtype)
    color1 = mlp_apply(params["color1_net"], h_color, compute_dtype=compute_dtype)
    if spec.use_dir:
        d01 = (dirs + 1.0) / 2.0
        rgb_in = jnp.concatenate([color1, sh_encode(d01, spec.sh_degree)], axis=-1)
    else:
        rgb_in = color1
    rgbs = mlp_apply(
        params["color2_net"], rgb_in, output_activation="sigmoid",
        compute_dtype=compute_dtype,
    )
    return jnp.concatenate([rgbs, classes], axis=-1)


def field_apply(
    spec: FieldSpec,
    params: Params,
    bbox: BBox,
    pts: jnp.ndarray,
    dirs: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full forward: [M, 3] pts (+ [M, 3] dirs) ->
    (channels [M, 3+class_dim], sigmas [M]).

    StyleTCNerf semantics (style_nerf.py:120-142): channels =
    concat(sigmoid rgb, raw class logits).
    """
    x = _encoder_input(bbox, pts)

    if spec.kind == "style":
        if dirs is None:
            h_density = hashgrid_encode(
                spec.grid, params["x_density_embedder"], x,
                bwd_pack=compute_dtype == jnp.bfloat16, dedup=spec.dedup,
            )
            sigma_out = mlp_apply(params["density_net"], h_density, compute_dtype=compute_dtype)
            return trunc_exp(sigma_out[:, 0] + spec.density_offset)

        # Fused dual-table gather: the density and color encoders share
        # identical corner indices (same spec, same x), so one gather on the
        # concatenated [T, 4] operand halves the random-access volume — 2.4x
        # measured on TPU v5e vs two separate encodes.  Parameters stay as two
        # arrays so the style stage's color-only optimizer masking is
        # unchanged (trainers/style.py:25).
        fused = jnp.concatenate(
            [params["x_density_embedder"], params["x_color_embedder"]], axis=1
        )
        c = spec.grid.level_dim
        h = hashgrid_encode(
            spec.grid, fused, x, bwd_pack=compute_dtype == jnp.bfloat16,
            dedup=spec.dedup,
        )  # [B, L*2C]
        h3 = h.reshape(x.shape[0], spec.grid.num_levels, 2 * c)
        h_density = h3[..., :c].reshape(x.shape[0], spec.grid.output_dim)
        h_color = h3[..., c:].reshape(x.shape[0], spec.grid.output_dim)

        sigma_out = mlp_apply(params["density_net"], h_density, compute_dtype=compute_dtype)
        sigmas = trunc_exp(sigma_out[:, 0] + spec.density_offset)
        classes = mlp_apply(params["class_net"], h_color, compute_dtype=compute_dtype)
        color1 = mlp_apply(params["color1_net"], h_color, compute_dtype=compute_dtype)

        if spec.use_dir:
            d01 = (dirs + 1.0) / 2.0
            d_emb = sh_encode(d01, spec.sh_degree)
            rgb_in = jnp.concatenate([color1, d_emb], axis=-1)
        else:
            rgb_in = color1

        rgbs = mlp_apply(
            params["color2_net"], rgb_in, output_activation="sigmoid",
            compute_dtype=compute_dtype,
        )
        return jnp.concatenate([rgbs, classes], axis=-1), sigmas

    # TCNerf (tcnn_nerf.py:126-139)
    h = hashgrid_encode(
        spec.grid, params["x_embedder"], x,
        bwd_pack=compute_dtype == jnp.bfloat16, dedup=spec.dedup,
    )
    density_out = mlp_apply(params["density_net"], h, compute_dtype=compute_dtype)
    sigmas = trunc_exp(density_out[:, 0] + spec.density_offset)
    if dirs is None:
        return sigmas
    d01 = (dirs + 1.0) / 2.0
    d_emb = sh_encode(d01, spec.sh_degree)
    rgb_in = jnp.concatenate([density_out[:, 1:], d_emb], axis=-1)
    rgbs = mlp_apply(
        params["rgb_net"], rgb_in, output_activation="sigmoid", compute_dtype=compute_dtype
    )
    return rgbs, sigmas
