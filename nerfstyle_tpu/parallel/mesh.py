"""Device mesh + sharded training/rendering.

First-class parallel layer — the reference has NO multi-device support of any
kind (hardcoded cuda:0, zero distributed constructs; SURVEY.md section 2.3).
This module supplies the TPU-native scaling strategy:

  * one mesh axis ``"data"`` over ICI;
  * **rays** shard on the batch axis — marching, compaction, field evaluation
    and compositing are embarrassingly parallel per ray, so each device runs
    the full pipeline on its ray shard with a *local* compaction budget
    (M/D).  The only cross-device communication is the scalar-loss / gradient
    ``psum`` that ``jax.grad`` induces through ``shard_map`` — exactly one
    all-reduce per step, riding ICI;
  * **occupancy-grid cells** shard the same way during updates (the cell sweep
    is embarrassingly parallel, renderer.py:142-181);
  * hash tables + MLP weights are replicated: the whole model is ~25 MB, far
    cheaper to replicate than to all-to-all gather per lookup — tensor
    parallelism would turn every hash-grid gather into remote traffic for zero
    memory benefit at this size.  (There is no attention/expert structure in
    this model family, so TP/PP/SP/EP have no referent; DP-over-rays IS the
    complete strategy.  See SURVEY.md section 2.3.)

Works on any device count including 1; tests exercise 8 virtual CPU devices.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..core.types import BBox, RayBundle
from ..models.fields import FieldSpec, field_apply
from ..ops.compositing import composite_rays
from ..ops.aabb import near_far_from_aabb
from ..ops.marching import MarchPlan, march_rays
from ..render.pipeline import eval_composite


shard_map = _shard_map


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def local_plan(plan_global: MarchPlan, n_dev: int) -> MarchPlan:
    """Per-device MarchPlan: rays and compaction budget split evenly."""
    assert plan_global.num_rays % n_dev == 0
    assert plan_global.budget % n_dev == 0
    import dataclasses

    wb = plan_global.window_budget
    if wb is not None:
        assert wb % n_dev == 0
        wb = wb // n_dev
    return dataclasses.replace(
        plan_global,
        num_rays=plan_global.num_rays // n_dev,
        budget=plan_global.budget // n_dev,
        window_budget=wb,
    )


def build_sharded_loss_terms(
    mesh: Mesh,
    spec: FieldSpec,
    plan_global: MarchPlan,
    t_thresh: float,
    density_scale: float,
    compute_dtype=jnp.float32,
    with_class: bool = False,
    sparsity_exp_coeff: float = 0.0,
    field_density_fn: Optional[Callable] = None,
    sig_budget: Optional[int] = None,
) -> Callable:
    """Sharded per-ray loss SUMS for the production trainer.

    Returns ``terms(params, bitfield, bbox, origins, dirs, targets,
    sparse_pts) -> dict`` where every entry is already psum-reduced over the
    mesh: ``sq`` (sum of squared rgb error), ``num_points``, and optionally
    ``nll``/``n_lab`` (class CE sum + valid-label count) and ``sp`` (sparsity
    sum over ``sparse_pts``).  The trainer turns sums into means so sharded
    and single-device losses agree bit-for-bit up to reduction order.

    Rays, targets and sparsity points shard on the batch axis; params and the
    occupancy bitfield replicate (SURVEY.md section 2.3: DP-over-rays is the
    complete strategy for this model family).

    ``sig_budget`` (GLOBAL kept-sample capacity, must divide the device
    count) switches each shard to the exact two-phase evaluation
    (render/pipeline.py); the psum-reduced ``num_sig`` term reports demand.
    """
    n_dev = mesh.devices.size
    plan_l = local_plan(plan_global, n_dev)
    sig_l = None
    if sig_budget is not None:
        assert sig_budget % n_dev == 0
        sig_l = sig_budget // n_dev

    def shard_fn(params, bitfield, bbox, origins, dirs, targets, sparse_pts):
        rgb, classes, _ws, n_kept, n_cand, n_sig = _render_shard(
            spec, plan_l, t_thresh, density_scale, compute_dtype,
            params, bitfield, bbox, origins, dirs, sig_budget=sig_l,
        )
        terms = {
            "sq": jnp.sum((rgb - targets[:, :3]) ** 2),
            "num_points": n_kept,
            "num_cand": n_cand,
            "num_sig": n_sig,
        }
        if with_class and spec.class_dim > 0:
            labels = targets[:, 3].astype(jnp.int32)
            mask = labels != -1
            safe = jnp.where(mask, labels, 0)
            logp = jax.nn.log_softmax(classes, axis=-1)
            nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
            terms["nll"] = jnp.sum(jnp.where(mask, nll, 0.0))
            terms["n_lab"] = jnp.sum(mask, dtype=jnp.int32)
        if sparsity_exp_coeff > 0.0 and field_density_fn is not None:
            sig = field_density_fn(params, bbox, sparse_pts)
            terms["sp"] = jnp.sum(jnp.abs(1.0 - jnp.exp(-sparsity_exp_coeff * sig)))
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, "data"), terms
        )

    return _shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )


def build_sharded_cotangent_sum(
    mesh: Mesh,
    spec: FieldSpec,
    plan_global: MarchPlan,
    t_thresh: float,
    density_scale: float,
    compute_dtype=jnp.float32,
) -> Callable:
    """Sharded ``sum(rgb(rays) * cotangent)`` — the scalar whose gradient is
    the style stage's deferred-backprop patch VJP (trainers/style.py:189-198):
    d/d(params) sum(rgb * g_pixels) == vjp(render, g_pixels).

    Rays and cotangents shard on the batch axis; grads psum once.
    """
    n_dev = mesh.devices.size
    plan_l = local_plan(plan_global, n_dev)

    def shard_fn(params, bitfield, bbox, origins, dirs, cot):
        rgb, _classes, _ws, _nk, _nc, _ns = _render_shard(
            spec, plan_l, t_thresh, density_scale, compute_dtype,
            params, bitfield, bbox, origins, dirs,
        )
        return jax.lax.psum(jnp.sum(rgb * cot), "data")

    return _shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )


def build_sharded_density_fn(
    mesh: Mesh,
    density_fn: Callable,
) -> Callable:
    """Shard a pointwise density evaluation over cells/points (axis 0).

    ``density_fn(params, pts) -> sigmas``; the returned function has the same
    signature and splits ``pts`` across the mesh — the occupancy-grid sweep is
    embarrassingly parallel over cells (reference renderer.py:142-181).
    Falls back to the unsharded call when the point count does not divide the
    device count.
    """
    n_dev = mesh.devices.size
    sharded = _shard_map(
        density_fn,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )

    def f(params, pts):
        if pts.shape[0] % n_dev != 0:
            return density_fn(params, pts)
        return sharded(params, pts)

    return f


def _render_shard(
    spec: FieldSpec,
    plan_local: MarchPlan,
    t_thresh: float,
    density_scale: float,
    compute_dtype,
    params,
    bitfield,
    bbox: BBox,
    origins,
    dirs,
    sig_budget: Optional[int] = None,
):
    """Per-device render of a local ray shard; returns local outputs.

    ``sig_budget`` (LOCAL kept capacity) selects the exact two-phase
    evaluation — density-only keep mask on the marched stream, full field on
    the kept prefix only (render/pipeline.py)."""
    rays = RayBundle(origins, dirs)
    nears, fars = near_far_from_aabb(origins, dirs, plan_local.aabb, plan_local.min_near)
    samples = march_rays(plan_local, bitfield, rays, nears, fars)
    out, num_sig = eval_composite(
        spec, params, bbox, samples, plan_local.num_rays, plan_local.dt,
        t_thresh, density_scale, compute_dtype, sig_budget,
    )
    rgb = out.image[:, :3] + (1.0 - out.weights_sum)[:, None]
    return (
        rgb, out.image[:, 3:], out.weights_sum,
        samples.num_kept, samples.num_cand, num_sig,
    )


def build_sharded_render_loss(
    mesh: Mesh,
    spec: FieldSpec,
    plan_global: MarchPlan,
    t_thresh: float,
    density_scale: float,
    class_lambda: float = 0.0,
    compute_dtype=jnp.float32,
) -> Callable:
    """Data-parallel loss over rays: each device marches/evaluates/composites
    its shard; the mean loss is psum-reduced.  jax.grad through this function
    yields replicated gradients with exactly one all-reduce."""
    n_dev = mesh.devices.size
    assert plan_global.num_rays % n_dev == 0, "ray batch must divide device count"
    assert plan_global.budget % n_dev == 0
    plan_local = MarchPlan(
        bound=plan_global.bound,
        cascade=plan_global.cascade,
        grid_size=plan_global.grid_size,
        max_steps=plan_global.max_steps,
        num_rays=plan_global.num_rays // n_dev,
        budget=plan_global.budget // n_dev,
        min_near=plan_global.min_near,
    )

    def shard_fn(params, bitfield, bbox, origins, dirs, targets):
        rgb, classes, _ws, _nk, _nc, _ns = _render_shard(
            spec, plan_local, t_thresh, density_scale, compute_dtype,
            params, bitfield, bbox, origins, dirs,
        )
        local = jnp.sum((rgb - targets[:, :3]) ** 2) / 3.0
        if class_lambda > 0.0 and spec.class_dim > 0:
            labels = targets[:, 3].astype(jnp.int32)
            logp = jax.nn.log_softmax(classes, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            local = local + class_lambda * jnp.sum(nll)
        # Mean over the GLOBAL ray count; psum makes every shard agree.
        total = jax.lax.psum(local, "data") / plan_global.num_rays
        return total

    sharded = _shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )

    # jit is load-bearing, not just a speedup: eager shard_map transposition
    # (jax.grad of the bare shard_map call) trips an XLA sharding-override
    # assert on JAX 0.9 when inputs are uncommitted; under jit the partial
    # eval + transpose happen inside one lowering and placement is inferred
    # consistently.
    return jax.jit(sharded)


def build_sharded_train_step(
    mesh: Mesh,
    spec: FieldSpec,
    plan_global: MarchPlan,
    optim,
    t_thresh: float = 1e-4,
    density_scale: float = 1.0,
    class_lambda: float = 0.0,
    compute_dtype=jnp.float32,
) -> Callable:
    """Full data-parallel training step, jitted over the mesh.

    Inputs: (params, opt_state, bitfield, bbox, origins, dirs, targets) with
    ray arrays sharded on axis 0, everything else replicated.
    Returns (params, opt_state, loss).
    """
    loss_fn = build_sharded_render_loss(
        mesh, spec, plan_global, t_thresh, density_scale, class_lambda, compute_dtype
    )

    ray_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(rep, rep, rep, rep, ray_sharding, ray_sharding, ray_sharding),
             out_shardings=(rep, rep, rep))
    def step(params, opt_state, bitfield, bbox, origins, dirs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, bitfield, bbox, origins, dirs, targets
        )
        import optax

        updates, opt_state = optim.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def shard_ray_arrays(mesh: Mesh, *arrays):
    """Place ray-batch arrays with batch-axis sharding on the mesh."""
    sharding = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sharding) for a in arrays)
