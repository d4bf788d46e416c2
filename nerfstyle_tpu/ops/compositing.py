"""Volume-rendering alpha compositor as segment scans.

TPU-native rebuild of the reference CUDA compositor
(``kernel_composite_rays_train_forward`` / ``_backward``,
``/root/reference/raymarching/src/raymarching.cu:807-997``, and the inference
variant at 1134-1231).

The per-ray sequential loop becomes a pair of prefix sums over the ray-major
compacted sample buffer:

  * transmittance entering sample i:
        T_i = prod_{j<i in segment} (1 - alpha_j) = exp(-dt * sum_{j<i} sigma_j)
    — exact because alpha = 1 - exp(-sigma*dt), so the product telescopes into
    an exponential of an in-segment exclusive cumsum (one flat ``cumsum`` plus
    a per-ray offset gather);
  * outputs are ``jax.ops.segment_sum`` reductions of alpha_i * T_i weights.

The early-termination rule (stop once T < T_thresh, raymarching.cu:861-862) is
an *inclusion mask*: since T decreases monotonically within a ray, "sample i is
processed before the break" is exactly ``T_i >= T_thresh``.

Gradients come from JAX autodiff through the scans — no hand-written backward
needed (the reference's analytic backward at raymarching.cu:905-986 exists
because CUDA autograd can't see inside the kernel).  Unlike the reference's
atomicAdd grads, these are deterministic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .marching import SampleBatch


class CompositeOutput(NamedTuple):
    image: jnp.ndarray  # [N, C] accumulated channels (rgb + class logits)
    weights_sum: jnp.ndarray  # [N] pixel alpha
    depth: jnp.ndarray  # [N] weighted depth integral (pre-normalization)


def segment_exclusive_cumsum(x: jnp.ndarray, ray_id: jnp.ndarray, num_rays: int) -> jnp.ndarray:
    """Exclusive cumulative sum of x within contiguous ray segments.

    Requires samples sorted by ray_id (guaranteed by the marcher's ray-major
    compaction).  Padding rows carry ray_id == num_rays.
    """
    flat = jnp.cumsum(x)
    seg_totals = jax.ops.segment_sum(x, ray_id, num_segments=num_rays + 1)
    prev_total = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(seg_totals)[:-1]])
    return flat - x - prev_total[ray_id]


# Optical-depth clamp: for any sdt >= ~88, alpha == 1.0 and T == 0.0 exactly
# in fp32, so a cap at 100 is numerically identical — but WITHOUT it a single
# sigma=inf sample (transient exp overflow in the unclamped trunc_exp forward,
# which the reference has too) turns the exclusive-cumsum difference into
# inf - inf = NaN and poisons the whole step.  The reference's sequential CUDA
# loop never forms that difference; this cap is the scan formulation's
# equivalent.
OPTICAL_DEPTH_CAP = 100.0


def significance(
    sigmas: jnp.ndarray,
    ray_id: jnp.ndarray,
    valid: jnp.ndarray,
    num_rays: int,
    dt: float,
    t_thresh: float,
):
    """Shared early-stop/inclusion math of the masked-scan compositor.

    The two-phase paths (render/pipeline.py, render/renderer.py) must use
    BIT-IDENTICAL significance math to this compositor's internal mask or
    their exactness guarantee silently breaks — so it lives here, once.

    Args:
        sigmas: [M] densities, already density_scale-multiplied.
    Returns:
        (included, sdt, trans): the inclusion mask ``T_i >= t_thresh`` (NOT
        and-ed with ``valid`` — invalid rows get sdt 0 so their weight
        vanishes regardless), the clamped per-sample optical depth, and the
        entering transmittance.
    """
    sdt = jnp.where(valid, jnp.minimum(sigmas * dt, OPTICAL_DEPTH_CAP), 0.0)
    excl = segment_exclusive_cumsum(sdt, ray_id, num_rays)
    trans = jnp.exp(-excl)  # T entering each sample
    return trans >= t_thresh, sdt, trans


def sample_weights(
    sigmas: jnp.ndarray,
    ray_id: jnp.ndarray,
    valid: jnp.ndarray,
    num_rays: int,
    dt: float,
    t_thresh: float,
):
    """Per-sample compositing weights ``alpha * T * included`` — exactly the
    weights :func:`composite_rays` reduces with (single source of truth for
    the two-phase inference and style-cache paths).

    Returns ``(w, included)`` — the weights and the early-stop inclusion
    mask (the latter is a diagnostic input for the two-phase renderer).
    """
    included, sdt, trans = significance(
        sigmas, ray_id, valid, num_rays, dt, t_thresh
    )
    alpha = 1.0 - jnp.exp(-sdt)
    return alpha * trans * included.astype(sigmas.dtype), included


def composite_rays(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    samples: SampleBatch,
    num_rays: int,
    dt: float,
    t_thresh: float = 1e-4,
) -> CompositeOutput:
    """Composite per-sample densities/colors into per-ray outputs.

    Args:
        sigmas: [M] non-negative densities (post trunc_exp and density_scale).
        rgbs: [M, C] channel values (rgb [+ class logits], C = 3 + K).
        samples: compacted batch from :func:`march_rays`.
        num_rays: N (static).
        dt: constant step size (plan.dt).
        t_thresh: transmittance early-stop threshold (cfg.t_thresh).
    """
    included, sdt, trans = significance(
        sigmas, samples.ray_id, samples.valid, num_rays, dt, t_thresh
    )
    alpha = 1.0 - jnp.exp(-sdt)
    w = alpha * trans * included.astype(sigmas.dtype)

    image = jax.ops.segment_sum(
        w[:, None] * rgbs, samples.ray_id, num_segments=num_rays + 1
    )[:num_rays]
    weights_sum = jax.ops.segment_sum(w, samples.ray_id, num_segments=num_rays + 1)[:num_rays]
    depth = jax.ops.segment_sum(
        w * samples.tau, samples.ray_id, num_segments=num_rays + 1
    )[:num_rays]

    return CompositeOutput(image=image, weights_sum=weights_sum, depth=depth)
