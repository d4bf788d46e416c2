#!/usr/bin/env python
"""Stage-level profiling of the flagship train step on the attached TPU.

Times each pipeline stage (occupancy mask, march+compaction, encoder fwd,
field fwd, composite, full fwd+bwd) at bench steady-state sizes, plus
candidate optimization variants of the hash-grid backward.  Methodology per
docs/PERFORMANCE.md: the remote backend's block_until_ready does not block,
so every timing forces a scalar host fetch; inputs vary per rep to defeat
memoization.

Usage: python tools/profile_step.py [--budget 131072] [--reps 6]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    # Same persistent cache as bench.py: every compile here pre-warms the
    # driver's bench run (the bench dir is the one path that may persist).
    _cache = os.environ.get(
        "NERFSTYLE_BENCH_DIR",
        str(Path(__file__).resolve().parent.parent / ".bench_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", str(Path(_cache) / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def timeit(name, fn, args_for_rep, reps=6):
    """fn(*args_for_rep(i)) -> array; returns median seconds."""
    # warmup (compile)
    out = fn(*args_for_rep(0))
    _force(out)
    ts = []
    for i in range(1, reps + 1):
        a = args_for_rep(i)
        t0 = time.perf_counter()
        out = fn(*a)
        _force(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{name:42s} {med*1e3:9.1f} ms   (min {min(ts)*1e3:.1f})")
    return med


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    np.asarray(jax.device_get(jax.numpy.ravel(x)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=131072)
    ap.add_argument("--num-rays", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from nerfstyle_tpu.core.types import BBox, make_rays
    from nerfstyle_tpu.models.fields import field_apply, field_init, style_field_spec
    from nerfstyle_tpu.ops.aabb import near_far_from_aabb
    from nerfstyle_tpu.ops.compositing import composite_rays
    from nerfstyle_tpu.ops.hashgrid import hashgrid_encode, hashgrid_spec
    from nerfstyle_tpu.ops.marching import MarchPlan, OccField, _kept_mask_dense, march_rays
    from nerfstyle_tpu.render.renderer import render_rays

    grid = hashgrid_spec(16, 2, 16, per_level_scale=1.42, log2_hashmap_size=19)
    spec = style_field_spec(grid, class_dim=4)
    key = jax.random.PRNGKey(0)
    params = field_init(key, spec)
    plan = MarchPlan(
        bound=2.0, cascade=2, grid_size=128, max_steps=1024,
        num_rays=args.num_rays, budget=args.budget, min_near=0.2,
    )
    bbox = BBox.from_radius(2.0)
    rng = np.random.default_rng(0)
    bits_np = rng.random(plan.cascade * plan.grid_size**3) < 0.03
    bitfield = jnp.asarray(bits_np)

    n = args.num_rays
    origins_np = rng.normal(size=(n, 3)).astype(np.float32) * 2.5
    dirs_np = rng.normal(size=(n, 3)).astype(np.float32)

    def rays_for(i):
        o = jnp.asarray(origins_np) + (i * 1e-3)
        d = jnp.asarray(dirs_np)
        return make_rays(o, d)

    rays0 = rays_for(0)
    nears, fars = near_far_from_aabb(rays0.origins, rays0.dirs, plan.aabb, plan.min_near)

    print(f"budget={args.budget} rays={n} t_lattice={plan.t_lattice} "
          f"levels={grid.num_levels} table_rows={grid.total_params}")

    # -- stage: dense occupancy mask --
    mask_fn = jax.jit(lambda o, d, nr, fr: _kept_mask_dense(
        plan, bitfield, make_rays(o, d), nr, fr))
    timeit("occupancy mask (dense [N,T])", mask_fn,
           lambda i: (rays_for(i).origins, rays_for(i).dirs, nears, fars),
           args.reps)

    # -- stage: march (mask + compaction) --
    march_fn = jax.jit(lambda o, d, nr, fr: march_rays(
        plan, OccField(bitfield), make_rays(o, d), nr, fr).xyz)
    timeit("march_rays (mask+flatnonzero)", march_fn,
           lambda i: (rays_for(i).origins, rays_for(i).dirs, nears, fars),
           args.reps)

    # -- fixed sample batch for field stages --
    m = args.budget
    pts_np = rng.uniform(-1.8, 1.8, size=(m, 3)).astype(np.float32)
    sdirs_np = rng.normal(size=(m, 3)).astype(np.float32)
    sdirs_np /= np.linalg.norm(sdirs_np, axis=1, keepdims=True)

    def pts_for(i):
        return jnp.asarray(pts_np) + i * 1e-4

    fused = jnp.concatenate(
        [params["x_density_embedder"], params["x_color_embedder"]], axis=1)

    enc_fn = jax.jit(lambda emb, x: hashgrid_encode(
        spec.grid, emb, (x / 4.0 + 0.5 + 1.0) / 2.0))
    timeit("encoder fwd (fused [T,4])", enc_fn,
           lambda i: (fused, pts_for(i)), args.reps)

    # encoder fwd+bwd
    def enc_loss(emb, x):
        return jnp.sum(hashgrid_encode(spec.grid, emb, (x / 4.0 + 0.5 + 1.0) / 2.0) ** 2)

    encg_fn = jax.jit(lambda emb, x: jax.grad(enc_loss)(emb, x))
    timeit("encoder fwd+bwd (grad wrt table)", encg_fn,
           lambda i: (fused, pts_for(i)), args.reps)

    field_fn = jax.jit(lambda p, x, d: field_apply(
        spec, p, bbox, x, d, compute_dtype=jnp.bfloat16)[0])
    timeit("field fwd (enc + 4 MLP heads)", field_fn,
           lambda i: (params, pts_for(i), jnp.asarray(sdirs_np)), args.reps)

    # -- full render fwd --
    render_fn = jax.jit(lambda p, o, d: render_rays(
        spec, plan, p, OccField(bitfield), bbox, make_rays(o, d),
        1e-4, 1.0, jnp.bfloat16)["rgb_map"])
    timeit("render_rays fwd (march+field+composite)", render_fn,
           lambda i: (params, rays_for(i).origins, rays_for(i).dirs), args.reps)

    # -- full train-like fwd+bwd --
    def loss(p, o, d):
        out = render_rays(spec, plan, p, OccField(bitfield), bbox,
                          make_rays(o, d), 1e-4, 1.0, jnp.bfloat16)
        return jnp.mean(out["rgb_map"] ** 2) + 1e-3 * jnp.mean(out["classes"] ** 2)

    step_fn = jax.jit(lambda p, o, d: jax.grad(loss)(p, o, d)["x_density_embedder"])
    timeit("FULL fwd+bwd (render + all grads)", step_fn,
           lambda i: (params, rays_for(i).origins, rays_for(i).dirs), args.reps)


if __name__ == "__main__":
    main()
