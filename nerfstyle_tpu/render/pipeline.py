"""Shared field-evaluation + compositing pipeline for the training paths.

Two-phase training evaluation (TPU-native form of the reference's in-kernel
training early-break): the reference's CUDA training compositor walks each
ray sequentially and BREAKS once transmittance drops below 1e-4
(``kernel_composite_rays_train_forward``,
``/root/reference/raymarching/src/raymarching.cu:861-862``), so samples past
the break contribute nothing — but the reference still *evaluated the field*
on them, because marching and network evaluation are separate stages there
(``/root/reference/nerf/renderer.py:196-235``).

On TPU the masked scan compositor (:mod:`..ops.compositing`) makes the same
fact algebraic: a sample with entering transmittance ``T < t_thresh`` has
weight EXACTLY zero and — because exclusion is a per-ray suffix — gradient
EXACTLY zero with respect to both its density and its color.  So the full
differentiable field only ever needs to run on the kept prefix:

  * phase A: density-only forward (no autodiff residuals,
    ``stop_gradient``) over the whole marched stream -> keep mask
    ``T >= t_thresh``;
  * phase B: fused dual-grid forward + backward on the compacted kept
    stream only, then the masked compositor.

This is EXACT (not an approximation): at equal thresholds the two-phase
loss and gradients match the single-phase path bit-for-bit up to float
reassociation (tested, tests/test_two_phase_train.py).  The win is the
regime where rays saturate early — enclosed scenes terminate on geometry
after a few dozen samples while the march must still cover the occupied
tail (unobservable regions keep their init-level density), so the kept
prefix is a small fraction of the marched stream.

The kept capacity ``sig_budget`` is a static shape (a bucket-ladder value,
like every other capacity here); ``num_sig`` reports exact demand so the
trainer can grow it.  Overflow truncates the HIGHEST flat indices — later
rays — exactly like the march budget itself, and is detected the same way.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.types import BBox
from ..models.fields import FieldSpec, field_apply, field_density
from ..ops.compact import compact_indices
from ..ops.compositing import (
    CompositeOutput,
    composite_rays,
    significance,
)
from ..ops.marching import SampleBatch


def eval_composite(
    spec: FieldSpec,
    params,
    bbox: BBox,
    samples: SampleBatch,
    num_rays: int,
    dt: float,
    t_thresh: float,
    density_scale: float,
    compute_dtype=jnp.float32,
    sig_budget: Optional[int] = None,
) -> Tuple[CompositeOutput, jnp.ndarray]:
    """Evaluate the field on a marched batch and composite.

    ``sig_budget=None``: single-phase (field on every marched sample).
    ``sig_budget=k``: two-phase (see module docstring) with kept capacity k.

    Returns ``(CompositeOutput, num_sig)`` where ``num_sig`` is the exact
    kept-sample demand (== num_kept on the single-phase path).
    """
    if sig_budget is None:
        rgbs, sigmas = field_apply(
            spec, params, bbox, samples.xyz, samples.dirs,
            compute_dtype=compute_dtype,
        )
        out = composite_rays(
            sigmas * density_scale, rgbs, samples, num_rays, dt, t_thresh
        )
        # Exact kept-prefix demand, from the sigmas already in hand (XLA
        # CSEs the cumsum with composite_rays' internal one): lets the
        # trainer size the two-phase capacity from the FIRST retune instead
        # of paying a full-capacity two-phase compile to discover it.
        inc, _, _ = significance(
            jax.lax.stop_gradient(sigmas) * density_scale,
            samples.ray_id, samples.valid, num_rays, dt, t_thresh,
        )
        num_sig = jnp.sum(inc & samples.valid, dtype=jnp.int32)
        return out, num_sig

    # ---- phase A: density-only keep mask, no gradient, no residuals ----
    sig_a = field_density(
        spec, jax.lax.stop_gradient(params), bbox, samples.xyz,
        compute_dtype=compute_dtype,
    )
    inc, _, _ = significance(
        sig_a * density_scale, samples.ray_id, samples.valid,
        num_rays, dt, t_thresh,
    )
    keep = inc & samples.valid
    num_sig = jnp.sum(keep, dtype=jnp.int32)

    # ---- compact the kept prefix (order-preserving: stays ray-major, so
    # corner dedup's run coherence survives) ----
    dom = samples.xyz.shape[0]
    idx = compact_indices(keep, sig_budget, dom)
    ok = idx < dom
    take = jnp.minimum(idx, dom - 1)
    kept = SampleBatch(
        xyz=jnp.take(samples.xyz, take, axis=0),
        dirs=jnp.take(samples.dirs, take, axis=0),
        tau=jnp.take(samples.tau, take, axis=0),
        ray_id=jnp.where(ok, jnp.take(samples.ray_id, take, axis=0), num_rays),
        valid=ok,
        num_kept=num_sig,
        num_cand=samples.num_cand,
    )

    # ---- phase B: full differentiable field on the kept stream ----
    rgbs, sigmas = field_apply(
        spec, params, bbox, kept.xyz, kept.dirs, compute_dtype=compute_dtype
    )
    out = composite_rays(
        sigmas * density_scale, rgbs, kept, num_rays, dt, t_thresh
    )
    return out, num_sig
