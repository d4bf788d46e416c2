"""Volume-rendering orchestration.

TPU-native rebuild of the reference ``Renderer``
(``/root/reference/renderer.py:19-313``): owns the cascaded occupancy grid,
maintains it during training, and drives march -> field -> composite.

Architectural differences (deliberate, TPU-first):

  * One pure, jit-differentiable :func:`render_rays` serves both training and
    inference.  The reference needs two CUDA paths (compacted train kernels vs
    an in-place alive-ray inference loop, renderer.py:196-293) because of
    dynamic shapes; our static-budget compaction makes the paths identical —
    inference simply runs the same function over ray chunks without gradients.
  * All state is a pytree (:class:`~nerfstyle_tpu.ops.occupancy.OccupancyState`);
    the ``Renderer`` class is a thin host-side orchestrator holding static
    config, jit caches, and the state between steps.
  * The compaction budget M (static for XLA) is picked from a small bucket
    ladder using the running ``mean_count`` — the same estimator the reference
    uses to size its point buffer (raymarching.py:230-236) — so at most a
    handful of compiled variants exist.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import generate_rays
from ..core.types import BBox, Box2D, Intrinsics, RayBundle
from ..models.fields import FieldSpec, Params, field_apply, field_density
from ..ops.aabb import near_far_from_aabb
from ..ops.compact import compact_indices
from ..ops.compositing import composite_rays
from ..ops.marching import MarchPlan, OccField, march_rays
from ..ops.occupancy import (
    OccupancyState,
    occupancy_init,
    occupancy_update_full,
    occupancy_update_random,
    update_mean_count,
)
from .pipeline import eval_composite


@dataclass(frozen=True)
class RenderSettings:
    """Static render configuration (mirrors RendererConfig, config.py:327-366)."""

    grid_size: int = 128
    update_iter: int = 16
    min_near: float = 0.2
    t_thresh: float = 1e-4
    use_ndc: bool = False
    flip_camera: int = 0
    max_steps: int = 1024
    update_thres: int = 256
    density_scale: float = 1.0
    density_thresh: float = 10.0
    density_decay: float = 0.95
    grid_bsize: Optional[int] = None
    # TPU-specific: per-ray average sample capacity of the largest compaction
    # bucket; caps worst-case memory (see budget_for).
    max_samples_per_ray: int = 256
    # TPU-specific: hard ceiling on TOTAL compacted samples per batch (the
    # train step's backward sort-stream temps scale with budget = num_rays *
    # bucket; ~1M samples ~ 15G HLO temp at 16 levels on v5e).  Binds only
    # during the early all-occupied transient — the reference's mean_count-
    # sized buffer drops overflow in exactly that phase (raymarching.py:
    # 233-236) — and is warned about if it still binds after warmup.
    max_budget_samples: int = 1_048_576
    # TPU-specific: initial windows/ray capacity of the two-stage march
    # (0 = ladder max; see RendererConfig.window_init_bucket).
    window_init_bucket: int = 0
    # TPU-specific: empty-space-skipping while_loop marcher (exact lattice
    # semantics; see ops/marching.py). False = dense [N, T] lattice sweep.
    adaptive_march: bool = True
    # TPU-specific: alive-ray compaction bucket of the incremental inference
    # loop (smaller = less dead-slot work on the long tail, more iterations).
    infer_bucket: int = 512
    # TPU-specific: occupied lattice points marched per alive ray per
    # while_loop iteration of the incremental renderer.  Larger rounds mean
    # fewer, bigger field batches (better per-op efficiency) but more wasted
    # tail evaluations after a ray saturates (T < t_thresh mid-round).
    infer_round_size: int = 32
    # TPU-specific: rays per jitted incremental-render call (image chunking).
    infer_chunk: int = 8192
    # TPU-specific: hard ceiling on chunk_rays * samples_per_ray_bucket for
    # one inference dispatch.  When march demand grows the samples/ray bucket
    # (e.g. an unpruned/foggy field at 500+ samples/ray), the chunk SHRINKS
    # so the per-dispatch march stream — and the 16-level encoder gathers it
    # feeds — stays within HBM.  Without this, a demand spike compiles a
    # chunk x 1024-sample graph whose gather temps exceed device memory
    # (measured: 25.7 GB allocation, remote-compile OOM, at 8192 x 1024).
    # 4.2M (= the known-good 8192 x 512 regime) is the default.
    infer_sample_budget: int = 4_194_304
    # TPU-specific: per-dispatch ray-count ceiling for the AUTO-grown chunk.
    # The budget above is two-sided: when the tuned samples/ray bucket is
    # SMALL (converged, pruned scene at 32-64 samples/ray), an 8192-ray
    # dispatch uses a fraction of the known-good sample envelope while the
    # frame pays ~93 dispatches at 1008x756 (each a remote-tunnel call).
    # render() therefore sizes the dispatch chunk as the largest power of two
    # with chunk * spr_bucket <= infer_sample_budget, up to this ceiling —
    # fewer, larger dispatches at identical per-dispatch memory.  Set equal
    # to infer_chunk to pin the legacy fixed-chunk behavior.
    infer_chunk_max: int = 65536
    # TPU-specific: ceiling on the two-stage march's COARSE-probe stream per
    # dispatch, chunk_rays * ceil(t_lattice / 8) probes.  The sample budget
    # above bounds the compacted stream, but the coarse stage's [N, Tc]
    # temporaries scale with rays x lattice length regardless of occupancy —
    # a 65536-ray dispatch at 512 steps is a 8.5M-probe graph whose compile
    # OOMed the remote TPU helper (r5 seeding run) while the known-good
    # 8192 x 1024-step regime is ~2.1M.  3M keeps the auto-grown chunk
    # within ~1.5x of the proven envelope at every march regime.
    infer_probe_budget: int = 3_000_000
    # TPU-specific: two-phase inference (density branch on the whole marched
    # stream, color branch only on weight-significant samples) instead of the
    # incremental alive-ray loop.  See make_two_phase_renderer.
    infer_two_phase: bool = True
    # TPU-specific: weight threshold of the two-phase color compaction; each
    # dropped sample contributes < eps per channel.  0 = keep all w > 0.
    infer_sig_eps: float = 1e-5
    # TPU-specific: 2-round early-terminating phase A of the two-phase
    # renderer.  0 = single round (density branch on the whole marched
    # stream).  k > 0: round 1 evaluates only each ray's first k marched
    # samples; rays whose transmittance already fell below t_thresh are
    # done (in a terminating scene that is most of them — the num_live
    # counter measures exactly this), and round 2 evaluates just the live
    # rays' tails.  EXACT: every skipped sample has entering T < t_thresh,
    # so its weight is identically zero under the compositor's early-stop
    # mask (ops/compositing.py significance) — same w, same image.
    infer_early_k1: int = 0


def cascade_for_bound(bound: float) -> int:
    """1 + ceil(log2(bound)) cascades (renderer.py:61)."""
    return 1 + max(0, math.ceil(math.log2(bound)))


# Compaction bucket ladder (samples per ray); static jit shapes.  Finer than
# powers of two: each step is ~1.4x, so the budget tracks mean_count within
# ~25% instead of ~50% — encoder/sort work scales with the budget (round-2
# phase profile: the bench ran at bucket 64 while mean samples/ray was 36).
# Recompile count stays bounded by the debounced direct-jump policy
# (_debounced_jump below).  The ladder extends to max_steps (1024) so a
# pathological demand regime never silently truncates — it just gets slow
# (and the renderer warns); truncation under a binding cap is a measured
# divergence mode (fog runaway, PERFORMANCE.md "Long-run stability fixes").
_BUDGET_BUCKETS = (4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)

# Candidate-window capacity ladder (windows per ray) for the two-stage march;
# tuned from SampleBatch.num_cand the same way the sample budget tracks
# mean_count.  Start value = max (effectively the full domain — safe: the
# march clamps window_budget to num_rays * ceil(t_lattice / stride)).
_WINDOW_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def _debounced_jump(current: int, want: int, streak: dict) -> int:
    """Bucket update policy: GROW immediately (correctness: a too-small
    capacity truncates), SHRINK by jumping DIRECTLY to the latest wanted
    value once the want has been BELOW current for 2 consecutive retunes.

    Every bucket value is a separate XLA compilation of its dependent jitted
    fns (the capacity is a static shape and MUST key their caches), so the
    one-ladder-step-per-update descent of an earlier revision caused a
    recompile at EVERY rung.  Debouncing on "below current" (not "same want
    twice") matters on monotone demand declines — early training prunes
    occupancy so fast that each retune wants a DIFFERENT smaller bucket, and
    an equal-want rule never fires (measured: bucket stuck at 256 for 60+
    iters at 3.5 s/step while demand fell 139 -> 76 -> 40 per ray)."""
    if want > current:
        streak.clear()
        return want
    if want < current:
        streak["n"] = streak.get("n", 0) + 1
        if streak["n"] >= 2:
            streak.clear()
            return want
    else:
        streak.clear()
    return current


def bucket_for(per_ray_want: float, max_per_ray: int) -> int:
    """Smallest ladder bucket covering ``per_ray_want`` samples/ray."""
    for b in _BUDGET_BUCKETS:
        if b >= per_ray_want and b <= max_per_ray:
            return b
    return min(max(_BUDGET_BUCKETS), max_per_ray)


def render_rays(
    field_spec: FieldSpec,
    plan: MarchPlan,
    params: Params,
    bitfield: jnp.ndarray,
    bbox: BBox,
    rays: RayBundle,
    t_thresh: float,
    density_scale: float,
    compute_dtype=jnp.float32,
    sig_budget: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Pure render pipeline for one ray batch (differentiable w.r.t. params).

    Returns dict with ``rgb_map`` [N,3], ``trans_map`` [N] (normalized depth),
    ``classes`` [N,K], ``weights_sum`` [N], ``num_points`` scalar.
    Semantics: render_train (renderer.py:196-235) == render_test
    (renderer.py:237-293) math.

    ``sig_budget`` enables the two-phase evaluation (density-only keep mask,
    full field on the kept prefix only — exact; see render/pipeline.py) with
    the given kept-stream capacity; ``num_sig`` then reports exact demand.
    """
    nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)
    samples = march_rays(plan, bitfield, rays, nears, fars)

    out, num_sig = eval_composite(
        field_spec, params, bbox, samples, plan.num_rays, plan.dt, t_thresh,
        density_scale, compute_dtype, sig_budget,
    )
    classes = out.image[:, 3:]
    rgb = out.image[:, :3]
    # White background blend (renderer.py:232) applies to rgb only.
    rgb = rgb + (1.0 - out.weights_sum)[:, None]
    # Depth normalization (renderer.py:233); epsilon guards miss rays where
    # fars == nears (the reference produces NaN there).
    depth = jnp.clip(out.depth - nears, min=0.0) / jnp.maximum(fars - nears, 1e-10)

    return {
        "rgb_map": rgb,
        "trans_map": depth,
        "classes": classes,
        "weights_sum": out.weights_sum,
        "num_points": samples.num_kept,
        "num_cand": samples.num_cand,
        "num_sig": num_sig,
    }


def make_incremental_renderer(
    field_spec: FieldSpec,
    base_plan: MarchPlan,
    t_thresh: float,
    density_scale: float,
    compute_dtype=jnp.float32,
    round_size: int = 32,
    bucket: int = 8192,
    samples_per_ray: Optional[int] = None,
    windows_per_ray: Optional[int] = None,
    mesh=None,
):
    """Incremental inference renderer: ONE vectorized march per chunk, then
    an early-termination loop over the PRECOMPACTED samples.

    The reference inference loop (renderer.py:266-293 + raymarching.cu:
    1005-1239) interleaves marching and evaluation per round.  A round-2
    rebuild reproduced that literally — each loop iteration ran a serialized
    per-ray lattice WALK (a nested while_loop stepping cells until
    round_size occupied points emitted).  Measured at 1008x756 that walk,
    not field evaluation, bounded the frame (e.g. bucket 8192 x round 64:
    54.7 s/frame while only 10.8 M samples were evaluated — the serialized
    walk iterations dwarfed the ~9 s of encode work).

    The fix is TPU-native: occupancy is STATIC at render time, so the
    chunk's entire sample stream is produced up front by the same
    vectorized two-stage skip-distance march the training path uses
    (ray-major, compacted), and the alive-ray loop then just SLICES each
    selected ray's next ``round_size`` samples from the precomputed batch —
    every iteration is row gathers + field_apply + compositing, nothing
    serialized.  Early termination (T < t_thresh, raymarching.cu:1218-1227)
    is preserved exactly: trailing samples of saturated rays are never
    evaluated.

    ``samples_per_ray`` sizes the chunk march budget and ``windows_per_ray``
    the candidate-window capacity (None = exact max_steps / full domain).
    Both can truncate when undersized — the outputs ``num_marched`` /
    ``num_cand`` report exact demand so the caller can grow and re-render
    (Renderer.render_ray_batch_incremental does, with a bucket ladder).

    When a ``mesh`` is supplied and the chunk divides the device count, the
    whole per-chunk pipeline runs under ``shard_map`` — each device marches
    and iterates its own ray shard independently (no collectives except one
    psum of the counters).  The reference has no multi-device render at all
    (SURVEY.md section 2.3).

    Returns ``render(params, occ_field, bbox, rays, channels) -> outputs``
    where every per-pixel output stays on device.
    """
    import dataclasses

    jit_cache = {}

    def body_for(chunk: int, channels: int):
        """Unjitted per-device chunk renderer for ``chunk`` rays."""
        b = min(bucket, chunk)
        s = round_size
        dt = base_plan.dt
        spr = samples_per_ray if samples_per_ray else base_plan.max_steps
        spr = min(spr, base_plan.max_steps)
        budget = chunk * spr
        wb = chunk * windows_per_ray if windows_per_ray else None
        plan_c = dataclasses.replace(
            base_plan, num_rays=chunk, budget=budget, window_budget=wb
        )
        # Termination bound.  Each iteration selects up to ``b`` alive rays
        # and each selected ray consumes ``s`` samples or dies, so ray i
        # needs ceil(count_i / s) selections.  While >= b rays are alive the
        # loop retires b selections/iter; once < b remain, every survivor is
        # selected each iter, so the tail costs at most the worst single
        # ray's remaining selections.  count_i is bounded by the marcher's
        # per-ray cap (max_steps), NOT by the mean-demand bucket ``spr`` —
        # a skewed chunk can hold one max_steps-deep ray within the total
        # budget, so a bound derived from spr alone could exit mid-composite
        # and silently truncate that pixel.
        total_slots = -(-budget // s) + chunk  # sum ceil(count_i/s) upper bd
        worst_ray = -(-min(base_plan.max_steps, budget) // s)
        max_iters = -(-total_slots // b) + worst_ray

        def render_chunk(params, occ, bbox, origins, dirs):
            rays = RayBundle(origins, dirs)
            nears, fars = near_far_from_aabb(
                origins, dirs, plan_c.aabb, plan_c.min_near
            )
            sb = march_rays(plan_c, occ, rays, nears, fars)
            # Per-ray segment table over the ray-major compacted stream.
            counts = jnp.zeros((chunk,), jnp.int32).at[sb.ray_id].add(
                sb.valid.astype(jnp.int32), mode="drop"
            )
            starts = jnp.cumsum(counts) - counts

            def cond(st):
                i, _c, _tr, _img, _d, _ws, done, _p = st
                return (i < max_iters) & ~jnp.all(done)

            def body(st):
                i, c, trans, acc_img, acc_depth, acc_ws, done, pts = st
                idx = compact_indices(~done, b, chunk)  # [b], fill = chunk
                sel_ok = idx < chunk
                r = jnp.minimum(idx, chunk - 1)
                c_r = c[r]
                cnt_r = counts[r]
                offs = jnp.arange(s, dtype=jnp.int32)[None, :]
                pos = starts[r][:, None] + c_r[:, None] + offs  # [b, s]
                in_seg = ((c_r[:, None] + offs) < cnt_r[:, None]) & sel_ok[:, None]
                pclip = jnp.minimum(pos, budget - 1).reshape(-1)

                xyz = jnp.take(sb.xyz, pclip, axis=0)  # [b*s, 3] row gathers
                tau = jnp.take(sb.tau, pclip).reshape(b, s)
                dirs_r = dirs[r]
                dirs_rep = jnp.broadcast_to(dirs_r[:, None, :], (b, s, 3))
                rgbs, sigmas = field_apply(
                    field_spec, params, bbox, xyz, dirs_rep.reshape(-1, 3),
                    compute_dtype=compute_dtype,
                )
                cC = rgbs.shape[-1]
                # sdt capped at 100 for the same inf - inf NaN guard as
                # ops/compositing.py (identical: alpha==1, T==0 there).
                sdt = jnp.where(
                    in_seg,
                    jnp.minimum(sigmas.reshape(b, s) * density_scale * dt, 100.0),
                    0.0,
                )
                alpha = 1.0 - jnp.exp(-sdt)
                excl = jnp.cumsum(sdt, axis=1) - sdt
                trans_row = trans[r][:, None] * jnp.exp(-excl)
                included = trans_row >= t_thresh  # raymarching.cu:1218-1227
                w = alpha * trans_row * included.astype(sdt.dtype)

                acc_img = acc_img.at[idx].add(
                    jnp.sum(w[..., None] * rgbs.reshape(b, s, cC), axis=1),
                    mode="drop",
                )
                acc_depth = acc_depth.at[idx].add(
                    jnp.sum(w * tau, axis=1), mode="drop"
                )
                acc_ws = acc_ws.at[idx].add(jnp.sum(w, axis=1), mode="drop")
                trans_out = trans[r] * jnp.exp(-jnp.sum(sdt, axis=1))
                adv = jnp.sum(in_seg, axis=1, dtype=jnp.int32)
                dead = (trans_out < t_thresh) | (c_r + adv >= cnt_r)
                c = c.at[idx].add(adv, mode="drop")
                trans = trans.at[idx].set(trans_out, mode="drop")
                done = done.at[idx].set(dead, mode="drop")
                pts = pts + jnp.sum(adv)
                return (i + 1, c, trans, acc_img, acc_depth, acc_ws, done, pts)

            init = (
                jnp.int32(0),
                jnp.zeros((chunk,), jnp.int32),
                jnp.ones((chunk,), jnp.float32),
                jnp.zeros((chunk, channels), jnp.float32),
                jnp.zeros((chunk,), jnp.float32),
                jnp.zeros((chunk,), jnp.float32),
                counts == 0,
                jnp.int32(0),
            )
            (_, _, _, acc_img, acc_depth, acc_ws, _, pts) = (
                jax.lax.while_loop(cond, body, init)
            )

            rgb = acc_img[:, :3] + (1.0 - acc_ws)[:, None]
            # identical post-processing to render_rays (white bg, depth norm)
            depth = jnp.clip(acc_depth - nears, min=0.0) / jnp.maximum(
                fars - nears, 1e-10
            )
            return {
                "rgb_map": rgb,
                "trans_map": depth,
                "classes": acc_img[:, 3:],
                "weights_sum": acc_ws,
                "num_points": pts,
                # Exact demand counters for the caller's grow-and-retry.
                "num_marched": sb.num_kept,
                "num_cand": sb.num_cand,
            }

        return render_chunk

    def chunk_fn_for(chunk: int, channels: int):
        key = (chunk, channels)
        if key in jit_cache:
            return jit_cache[key]

        n_dev = mesh.devices.size if mesh is not None else 1
        if n_dev > 1 and chunk % n_dev == 0:
            from ..parallel.mesh import shard_map
            from jax.sharding import PartitionSpec as P

            local = body_for(chunk // n_dev, channels)

            def per_device(params, occ, bbox, origins, dirs):
                out = local(params, occ, bbox, origins, dirs)
                for k in ("num_points", "num_marched", "num_cand"):
                    out[k] = jax.lax.psum(out[k], "data")
                return out

            fn = shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P("data")),
                out_specs={
                    "rgb_map": P("data"),
                    "trans_map": P("data"),
                    "classes": P("data"),
                    "weights_sum": P("data"),
                    "num_points": P(),
                    "num_marched": P(),
                    "num_cand": P(),
                },
                check_vma=False,
            )
            jit_cache[key] = jax.jit(fn)
        else:
            jit_cache[key] = jax.jit(body_for(chunk, channels))
        return jit_cache[key]

    def render(params, occ, bbox, rays: RayBundle, channels: int):
        n = rays.origins.shape[0]
        return chunk_fn_for(n, channels)(
            params, occ, bbox, rays.origins, rays.dirs
        )

    return render


def make_two_phase_renderer(
    field_spec: FieldSpec,
    base_plan: MarchPlan,
    t_thresh: float,
    density_scale: float,
    compute_dtype=jnp.float32,
    sig_eps: float = 1e-5,
    samples_per_ray: Optional[int] = None,
    windows_per_ray: Optional[int] = None,
    sig_per_ray: int = 8,
    early_k1: int = 0,
    tail_per_ray: Optional[int] = None,
    mesh=None,
):
    """Two-phase inference renderer: density on everything, color on the few.

    The incremental loop (:func:`make_incremental_renderer`) still evaluates
    the FULL field — fused dual-grid encode + all four MLP heads — on every
    marched sample it touches, in ``round_size``-granule batches inside a
    serialized ``while_loop`` (hundreds of small sequential steps per frame;
    a [b*s, .] batch of 16k samples cannot fill the chip).  But at inference
    the density branch alone determines the compositing weights, and in a
    terminating scene only a handful of samples per ray carry weight above
    the reference's own T < t_thresh cutoff (raymarching.cu:1218-1227).

    So: phase A marches the chunk ONCE (vectorized two-stage march) and runs
    the DENSITY branch over the entire compacted stream — one huge,
    MXU-friendly batch, with ray-coherent corner dedup intact (the marched
    stream is run-coherent).  Exact weights come from the same segment-scan
    as ops/compositing.py.  Phase B compacts the weight-significant samples
    (w > sig_eps) and evaluates the COLOR branch — the expensive half: color
    encode, class/color1/color2 heads, SH — on only those, then composites
    by segment-sum.  Two large dispatches per chunk replace the loop.

    Exactness: identical to the incremental path for every sample with
    w > sig_eps; dropped samples each contribute < sig_eps per channel
    (bounded by sig_eps * samples/ray ~ 1e-5 * 256 << 1/255 per pixel).
    ``sig_eps=0`` keeps every w > 0 sample (bit-parity up to fp reduction
    order) at the cost of a near-full-stream phase B.

    ``sig_per_ray`` sizes the phase-B compaction capacity; the exact demand
    counter ``num_sig`` (like ``num_marched`` / ``num_cand``) lets the
    caller grow a bucket ladder and re-render on overflow.

    Multi-device: same shard_map layout as the incremental renderer — each
    device marches and shades its own ray shard; one psum of the counters.

    ``early_k1 > 0`` splits phase A itself into two rounds (the num_live
    diagnostic showed most marched samples sit BEHIND each ray's
    saturation point in terminating scenes): round 1 runs the density
    branch on only each ray's first ``early_k1`` samples; a ray whose
    optical depth over those already puts T below ``t_thresh`` can receive
    no further weight (``significance`` masks every later sample — the
    entering transmittance is monotone non-increasing), so round 2
    evaluates only the surviving rays' tails, compacted to a
    ``tail_per_ray`` capacity with the exact ``num_tail`` demand counter.
    Unevaluated tail densities enter the weight scan as zeros, which
    cannot change any included sample's weight — the output is EXACT,
    not an approximation.
    """
    import dataclasses

    from ..models.fields import field_color
    from ..ops.compositing import OPTICAL_DEPTH_CAP, sample_weights

    jit_cache = {}

    def body_for(chunk: int, channels: int):
        dt = base_plan.dt
        spr = samples_per_ray if samples_per_ray else base_plan.max_steps
        spr = min(spr, base_plan.max_steps)
        budget = chunk * spr
        wb = chunk * windows_per_ray if windows_per_ray else None
        plan_c = dataclasses.replace(
            base_plan, num_rays=chunk, budget=budget, window_budget=wb
        )
        cap = chunk * min(sig_per_ray, spr)
        k1 = min(early_k1, spr) if early_k1 > 0 else 0
        two_round = 0 < k1 < spr
        tail_pr = min(tail_per_ray if tail_per_ray else spr, spr)

        def render_chunk(params, occ, bbox, origins, dirs):
            rays = RayBundle(origins, dirs)
            nears, fars = near_far_from_aabb(
                origins, dirs, plan_c.aabb, plan_c.min_near
            )
            sb = march_rays(plan_c, occ, rays, nears, fars)

            # Phase A: density branch; exact weights via the segment scan
            # (identical math + NaN cap to ops/compositing.py
            # composite_rays).
            if not two_round:
                sigmas = field_density(
                    field_spec, params, bbox, sb.xyz,
                    compute_dtype=compute_dtype,
                ) * density_scale
                n_tail = jnp.int32(0)
                n_eval_a = sb.num_kept
            else:
                # Round 1: density on each ray's first k1 marched samples.
                # The stream is ray-major with all valid samples in a
                # contiguous global prefix (march_rays contract), so the
                # within-ray rank is stream position minus the ray's start.
                iota = jax.lax.iota(jnp.int32, budget)
                start = jax.ops.segment_min(
                    iota, sb.ray_id, num_segments=chunk + 1
                )
                rank = iota - start[sb.ray_id]
                m1 = sb.valid & (rank < k1)
                cap1 = min(chunk * k1, budget)
                idx1 = compact_indices(m1, cap1, budget)
                ok1 = idx1 < budget
                t1 = jnp.minimum(idx1, budget - 1)
                sig1 = field_density(
                    field_spec, params, bbox, jnp.take(sb.xyz, t1, axis=0),
                    compute_dtype=compute_dtype,
                ) * density_scale
                sig1 = jnp.where(ok1, sig1, 0.0)
                rid1 = jnp.where(ok1, jnp.take(sb.ray_id, t1), chunk)

                # A ray whose entering transmittance after its round-1
                # samples is already below t_thresh can receive no further
                # weight (significance masks every later sample).  Same
                # per-sample optical-depth law as significance(); an
                # epsilon disagreement at the threshold boundary is
                # harmless — the final scan recomputes inclusion
                # canonically, and a zero-filled sigma gives alpha = 0.
                sdt1 = jnp.minimum(sig1 * dt, OPTICAL_DEPTH_CAP)
                od1 = jax.ops.segment_sum(
                    sdt1, rid1, num_segments=chunk + 1
                )
                alive = jnp.exp(-od1) >= t_thresh

                # Round 2: only the live rays' tails.
                m2 = sb.valid & (rank >= k1) & alive[sb.ray_id]
                n_tail = jnp.sum(m2, dtype=jnp.int32)
                cap2 = min(chunk * tail_pr, budget)
                idx2 = compact_indices(m2, cap2, budget)
                ok2 = idx2 < budget
                t2 = jnp.minimum(idx2, budget - 1)
                sig2 = field_density(
                    field_spec, params, bbox, jnp.take(sb.xyz, t2, axis=0),
                    compute_dtype=compute_dtype,
                ) * density_scale
                sig2 = jnp.where(ok2, sig2, 0.0)
                n_eval_a = jnp.sum(m1, dtype=jnp.int32) + jnp.minimum(
                    n_tail, cap2
                )

                # Unevaluated slots stay zero: every such sample either has
                # entering T < t_thresh (excluded by the scan) or gets
                # alpha = 1 - exp(0) = 0 — exact either way.
                sigmas = (
                    jnp.zeros((budget + 1,), sig1.dtype)
                    .at[jnp.where(ok1, idx1, budget)].set(sig1)
                    .at[jnp.where(ok2, idx2, budget)].set(sig2)
                )[:budget]
            # Early-stop mask per raymarching.cu:1218-1227.
            w, included = sample_weights(
                sigmas, sb.ray_id, sb.valid, chunk, dt, t_thresh
            )

            # Phase B: color branch on the weight-significant samples only.
            sig = (w > sig_eps) & sb.valid
            n_sig = jnp.sum(sig, dtype=jnp.int32)
            idx = compact_indices(sig, cap, budget)  # [cap], fill = budget
            ok = idx < budget
            take = jnp.minimum(idx, budget - 1)
            xyz_sig = jnp.take(sb.xyz, take, axis=0)
            w_sig = jnp.where(ok, jnp.take(w, take), 0.0)
            rid_sig = jnp.where(ok, jnp.take(sb.ray_id, take), chunk)
            dirs_sig = jnp.take(sb.dirs, take, axis=0)
            ch = field_color(
                field_spec, params, bbox, xyz_sig, dirs_sig,
                compute_dtype=compute_dtype,
            )  # [cap, channels]

            acc_img = jax.ops.segment_sum(
                w_sig[:, None] * ch, rid_sig, num_segments=chunk + 1
            )[:chunk]
            # weights_sum / depth from the FULL stream (free — w is already
            # computed), so pixel alpha and depth are exact regardless of
            # sig_eps.
            acc_ws = jax.ops.segment_sum(
                w, sb.ray_id, num_segments=chunk + 1
            )[:chunk]
            acc_depth = jax.ops.segment_sum(
                w * sb.tau, sb.ray_id, num_segments=chunk + 1
            )[:chunk]

            rgb = acc_img[:, :3] + (1.0 - acc_ws)[:, None]
            # identical post-processing to render_rays (white bg, depth norm)
            depth = jnp.clip(acc_depth - nears, min=0.0) / jnp.maximum(
                fars - nears, 1e-10
            )
            return {
                "rgb_map": rgb,
                "trans_map": depth,
                "classes": acc_img[:, 3:],
                "weights_sum": acc_ws,
                # Field evaluations: density (both rounds) + color on the few.
                "num_points": n_eval_a + n_sig,
                # Exact demand counters for the caller's grow-and-retry.
                "num_marched": sb.num_kept,
                "num_cand": sb.num_cand,
                "num_sig": n_sig,
                "num_tail": n_tail,
                # Diagnostic: samples BEFORE each ray's T < t_thresh cutoff —
                # what an early-termination-aware phase A would evaluate
                # (the incremental loop's evaluation count, round granularity
                # aside).  marched - live = the tail a 2-round phase A skips.
                "num_live": jnp.sum(
                    included & sb.valid, dtype=jnp.int32
                ),
            }

        return render_chunk

    def chunk_fn_for(chunk: int, channels: int):
        key = (chunk, channels)
        if key in jit_cache:
            return jit_cache[key]

        n_dev = mesh.devices.size if mesh is not None else 1
        if n_dev > 1 and chunk % n_dev == 0:
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import shard_map

            local = body_for(chunk // n_dev, channels)

            def per_device(params, occ, bbox, origins, dirs):
                out = local(params, occ, bbox, origins, dirs)
                for k in (
                    "num_points", "num_marched", "num_cand", "num_sig",
                    "num_live", "num_tail",
                ):
                    out[k] = jax.lax.psum(out[k], "data")
                return out

            fn = shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P("data")),
                out_specs={
                    "rgb_map": P("data"),
                    "trans_map": P("data"),
                    "classes": P("data"),
                    "weights_sum": P("data"),
                    "num_points": P(),
                    "num_marched": P(),
                    "num_cand": P(),
                    "num_sig": P(),
                    "num_live": P(),
                    "num_tail": P(),
                },
                check_vma=False,
            )
            jit_cache[key] = jax.jit(fn)
        else:
            jit_cache[key] = jax.jit(body_for(chunk, channels))
        return jit_cache[key]

    def render(params, occ, bbox, rays: RayBundle, channels: int):
        n = rays.origins.shape[0]
        return chunk_fn_for(n, channels)(
            params, occ, bbox, rays.origins, rays.dirs
        )

    return render


class Renderer:
    """Host-side orchestrator: occupancy state + jitted render/update fns.

    The training loop does NOT call this class inside its jitted step — the
    trainer composes the pure functions directly.  This class serves
    evaluation, the style stage, and the render CLI (the reference
    ``Renderer.render`` surface, renderer.py:295-313).
    """

    def __init__(
        self,
        field_spec: FieldSpec,
        params_template_bbox: BBox,
        settings: RenderSettings,
        intr: Intrinsics,
        bound: float,
        raymarch_channels: int = 3,
        precrop_frac: float = 1.0,
        compute_dtype=jnp.float32,
    ):
        if settings.use_ndc:
            raise NotImplementedError(
                "NDC is plumbed but not implemented — the reference never "
                "enables it either (renderer.py:56-58, all call sites commented)."
            )
        self.field_spec = field_spec
        self.settings = settings
        self.intr = intr
        self.bound = float(bound)
        self.bbox = params_template_bbox
        self.raymarch_channels = raymarch_channels
        self.precrop_frac = precrop_frac
        self.compute_dtype = compute_dtype

        # Optional device mesh: when set (by the trainer), occupancy-grid
        # density sweeps shard over cells (embarrassingly parallel,
        # reference renderer.py:142-181).
        self.mesh = None

        self.cascade = cascade_for_bound(self.bound)
        self.occ_state: OccupancyState = occupancy_init(self.cascade, settings.grid_size)
        self.update_occ = True
        self._mean_count_host = 0
        self._local_step_host = 0
        self._last_num_rays = 1
        # Samples/ray bucket with hysteresis: every bucket value is a separate
        # XLA compilation of the train step (minutes each on the remote TPU
        # compiler), so the bucket must NOT track the mean_count EMA tick by
        # tick.  Policy (_debounced_jump): GROW immediately to the needed
        # bucket on overflow, SHRINK by a debounced direct jump once the same
        # smaller bucket has been wanted twice — bounding recompiles per run
        # to a handful.  Initial bucket is 256 (not the ladder max): growth
        # under real demand is immediate, and a 1024/ray first compile would
        # pay minutes + GBs before the first mean_count exists.
        self._budget_bucket = min(settings.max_samples_per_ray, 256)
        # Inference march buckets (samples/ray and windows/ray of the
        # per-chunk precompacted march): seeded modestly, grown on observed
        # overflow by render_ray_batch_incremental (demand counters are
        # exact, so a grow is never missed).  load_state_dict_static reseeds
        # the sample bucket from the recon-tuned one riding the checkpoint.
        self._infer_spr_bucket = min(64, settings.max_steps)
        self._infer_win_bucket = 32
        # Two-phase color compaction bucket (significant samples/ray); grown
        # on the exact num_sig counter like the march buckets above.
        self._infer_sig_bucket = 8
        # 2-round phase A tail capacity (live rays' tail samples/ray,
        # infer_early_k1 > 0 only); grown on the exact num_tail counter.
        self._infer_tail_bucket = 16
        # Candidate-window capacity (windows/ray) of the two-stage march;
        # starts at the ladder max (~the full window domain: safe, slower)
        # and shrinks with hysteresis as observed candidate counts allow.
        # window_init_bucket pre-seeds a settled value (snapped up to the
        # ladder) so the first compile is the steady shape; growth on the
        # exact candidate counter corrects an undersized seed.
        if settings.window_init_bucket > 0:
            self._window_bucket = next(
                (b for b in _WINDOW_BUCKETS if b >= settings.window_init_bucket),
                max(_WINDOW_BUCKETS),
            )
        else:
            self._window_bucket = max(_WINDOW_BUCKETS)
        self._last_num_cand = None  # device scalar from the latest batch
        self._bucket_debounce: dict = {}
        self._window_debounce: dict = {}
        # When False, the train-step sample budget is owned externally
        # (adaptive ray batching fixes it and adapts the ray count instead);
        # _retune_bucket then only maintains _budget_bucket as a per-ray
        # demand summary for downstream consumers (checkpoint seed for the
        # style/render stages) and never warns about truncation — the
        # external controller guarantees demand fits the budget.
        self.autotune_budget = True

        self._render_jit_cache = {}

    # ---- occupancy maintenance (renderer.py:138-194) ----

    def _update_fn(self, kind: str):
        """Jitted occupancy update (one dispatch instead of dozens of eager
        ops — each eager op is a round trip on the remote TPU tunnel)."""
        # mesh identity keys the cache: the mesh is attached externally
        # after construction, and a stale closure would freeze the sharding
        # decision (or keep a dead mesh).
        key_ = ("occ_update", kind, id(self.mesh))
        if key_ not in self._render_jit_cache:
            spec, bbox, dtype = self.field_spec, self.bbox, self.compute_dtype
            # Probe streams are cell-ordered, not ray-marched: give them a
            # dedup plan matched to their own coherence geometry (R/H new-cell
            # fractions) instead of the marching plan.
            if spec.dedup is not None:
                import dataclasses

                from ..ops.hashgrid import dedup_plan_for_grid_probes

                spec = dataclasses.replace(
                    spec,
                    dedup=dedup_plan_for_grid_probes(
                        spec.grid, self.settings.grid_size
                    ),
                )
            kwargs = dict(
                bound=self.bound,
                density_scale=self.settings.density_scale,
                density_decay=self.settings.density_decay,
                density_thresh=self.settings.density_thresh,
            )
            if self.settings.grid_bsize:
                kwargs["chunk"] = int(self.settings.grid_bsize)
            update = (
                occupancy_update_full if kind == "full" else occupancy_update_random
            )
            mesh = self.mesh

            def density(p, pts):
                return field_density(spec, p, bbox, pts, compute_dtype=dtype)

            if mesh is not None and mesh.devices.size > 1:
                from ..parallel.mesh import build_sharded_density_fn

                sharded = build_sharded_density_fn(mesh, density)

                def f(params, occ_state, key):
                    return update(
                        occ_state, lambda pts: sharded(params, pts), key, **kwargs
                    )
            else:

                def f(params, occ_state, key):
                    return update(
                        occ_state, lambda pts: density(params, pts), key, **kwargs
                    )

            self._render_jit_cache[key_] = jax.jit(f)
        return self._render_jit_cache[key_]

    def update_state(self, params: Params, key: jax.Array) -> None:
        """Periodic occupancy refresh; full sweep early, random later
        (renderer.py:139-194)."""
        kind = "full" if self._local_step_host < self.settings.update_thres else "random"
        self.occ_state = self._update_fn(kind)(params, self.occ_state, key)
        # Host mirror of the device mean_count for budget bucketing (the
        # reference syncs its step counter here too, renderer.py:192-194).
        self._mean_count_host = int(self.occ_state.mean_count)
        self._retune_bucket()

    def _effective_cap(self, num_rays: int) -> int:
        """Per-ray bucket cap: the configured truncation bound, additionally
        bounded by the HBM budget ceiling for this batch size."""
        mem_cap = max(
            min(_BUDGET_BUCKETS),
            self.settings.max_budget_samples // max(1, num_rays),
        )
        return min(self.settings.max_samples_per_ray, mem_cap)

    def _retune_bucket(self) -> None:
        if self._mean_count_host <= 0:
            return
        # 1.25x headroom over the running mean (the reference sizes its point
        # buffer at mean_count exactly and drops overflow,
        # raymarching.py:233-236 — 1.25x is strictly more generous).
        per_ray = self._mean_count_host * 1.25 / max(1, self._last_num_rays)
        if not self.autotune_budget:
            # Adaptive ray batching owns the budget; keep the bucket as a
            # demand summary only (seeds style/render via the checkpoint).
            self._budget_bucket = bucket_for(
                per_ray, self.settings.max_samples_per_ray
            )
            if self._last_num_cand is not None:
                self._retune_window_bucket(
                    int(self._last_num_cand), self._last_num_rays
                )
            return
        cap = self._effective_cap(self._last_num_rays)
        if (
            per_ray > cap
            and self._local_step_host > self.settings.update_thres
        ):
            # A PERSISTENTLY binding cap truncates exactly the samples whose
            # gradients would suppress spurious density, which then compounds
            # (measured: fog runaway + divergence under a 64 cap at 178
            # samples/ray demand).  The reference's buffer is uncapped in
            # steady state.  During the early all-occupied transient
            # (local_step <= update_thres) truncation is reference-parity
            # behavior and not warned about.
            import warnings

            warnings.warn(
                f"steady-state sample demand ({per_ray:.0f}/ray) exceeds the "
                f"effective cap {cap}/ray (max_samples_per_ray="
                f"{self.settings.max_samples_per_ray}, max_budget_samples="
                f"{self.settings.max_budget_samples}); training will "
                "truncate — raise the cap or fix the scene regime",
                stacklevel=2,
            )
        cand = bucket_for(per_ray, cap)
        self._budget_bucket = _debounced_jump(
            self._budget_bucket, cand, self._bucket_debounce
        )
        if self._last_num_cand is not None:
            self._retune_window_bucket(
                int(self._last_num_cand), self._last_num_rays
            )

    def _retune_window_bucket(
        self, cand: int, num_rays: int, floor_current: bool = False
    ) -> None:
        """Grow the window capacity immediately on pressure; shrink with a
        debounced DIRECT jump.  A too-small capacity silently drops candidate
        windows AND corrupts num_kept, which would spiral the sample budget
        down — the observed num_cand is exact, so growth is reliable."""
        if cand <= 0:
            return
        per_ray = cand * 1.25 / max(1, num_rays)
        if per_ray > max(_WINDOW_BUCKETS):
            import warnings

            warnings.warn(
                f"candidate-window demand ({per_ray:.0f}/ray) exceeds the "
                f"capacity ladder max ({max(_WINDOW_BUCKETS)}); the march "
                "will truncate windows", stacklevel=2,
            )
        want = next(
            (b for b in _WINDOW_BUCKETS if b >= per_ray), max(_WINDOW_BUCKETS)
        )
        if floor_current:
            self._window_bucket = max(self._window_bucket, want)
        else:
            self._window_bucket = _debounced_jump(
                self._window_bucket, want, self._window_debounce
            )

    def note_batch_points(
        self, num_points, num_rays: Optional[int] = None, num_cand=None
    ) -> None:
        """Feed the compacted point count of a train batch into mean_count."""
        self.occ_state = update_mean_count(self.occ_state, jnp.asarray(num_points))
        self._local_step_host += 1
        if num_rays:
            self._last_num_rays = num_rays
        if num_cand is not None:
            self._last_num_cand = num_cand  # device scalar; fetched at retune

    def retune_bucket_now(
        self, num_points: int, num_rays: int, num_cand=None,
        floor_current: bool = False,
    ) -> None:
        """Jump the compaction bucket directly to fit an observed batch.

        The style stage marches with --max-steps 512 (double the recon dt),
        so the recon-tuned bucket oversizes its budgets ~2-4x; unlike the
        hysteresis in :meth:`_retune_bucket` (which bounds recompiles during
        training), the style stage observes a full frame at once and can
        retarget immediately — compiled fns are cached per bucket.

        ``floor_current=True`` grows-only: callers inside a grow-until-fit
        retry loop pass EXACT observed demand and must never shrink the
        other ladder mid-loop.  (Passing current capacity as demand instead
        would 1.25x-inflate whichever ladder did NOT overflow, one rung per
        retry, ratcheting it to the ladder max — the source of the r03
        dryrun's spurious truncation warnings.)"""
        if num_points <= 0 or num_rays <= 0:
            return
        # The caller may observe a FULL FRAME (style pass 1 reports the
        # frame-total point count), but rendering dispatches at most
        # infer_chunk rays per jitted call — the HBM budget cap applies to
        # one dispatch, not the frame (a frame-sized cap at 378x504 would
        # bound the bucket ~23x too low and silently truncate every chunk).
        cap_rays = min(num_rays, self.settings.infer_chunk)
        per_ray = num_points * 1.25 / num_rays
        self._last_num_rays = cap_rays
        self._mean_count_host = int(num_points * cap_rays / num_rays)
        cand = bucket_for(per_ray, self._effective_cap(cap_rays))
        if floor_current:
            cand = max(cand, self._budget_bucket)
        self._budget_bucket = cand
        if num_cand is not None:
            self._retune_window_bucket(
                int(num_cand), num_rays, floor_current=floor_current
            )

    def maybe_update_state(self, params: Params, key: jax.Array) -> bool:
        if self.update_occ and (self._local_step_host % self.settings.update_iter == 0):
            self.update_state(params, key)
            return True
        return False

    # ---- rendering ----

    def make_plan(self, num_rays: int, budget: Optional[int] = None) -> MarchPlan:
        if budget is None:
            budget = num_rays * self._budget_bucket
        return MarchPlan(
            bound=self.bound,
            cascade=self.cascade,
            grid_size=self.settings.grid_size,
            max_steps=self.settings.max_steps,
            num_rays=num_rays,
            budget=budget,
            min_near=self.settings.min_near,
            window_budget=num_rays * self._window_bucket,
        )

    def _render_fn(self, plan: MarchPlan):
        key = (plan.num_rays, plan.budget, plan.window_budget)
        if key not in self._render_jit_cache:
            spec = self.field_spec
            t_thresh = self.settings.t_thresh
            dscale = self.settings.density_scale
            dtype = self.compute_dtype

            @jax.jit
            def f(params, bitfield, bbox, origins, dirs):
                return render_rays(
                    spec, plan, params, bitfield, bbox,
                    RayBundle(origins, dirs), t_thresh, dscale, dtype,
                )

            self._render_jit_cache[key] = f
        return self._render_jit_cache[key]

    @property
    def occ_field(self) -> OccField:
        """Marching structures: bitfield (+ skip distances when adaptive)."""
        if self.settings.adaptive_march:
            return OccField(self.occ_state.bitfield, self.occ_state.skipdist)
        return OccField(self.occ_state.bitfield)

    def render_ray_batch(self, params: Params, rays: RayBundle) -> Dict[str, jnp.ndarray]:
        plan = self.make_plan(len(rays))
        return self._render_fn(plan)(params, self.occ_field, self.bbox,
                                     rays.origins, rays.dirs)

    def _render_chunk_incremental(
        self, params: Params, rays: RayBundle, round_size: int
    ) -> Dict[str, jnp.ndarray]:
        """One incremental chunk dispatch at the CURRENT buckets — no host
        fetch, no demand check (the caller batches those per frame)."""
        spr = self._infer_spr_bucket
        wpr = self._infer_win_bucket
        key = ("incremental", round_size, spr, wpr, id(self.mesh))
        if key not in self._render_jit_cache:
            plan = self.make_plan(1, budget=1)  # re-chunked inside
            self._render_jit_cache[key] = make_incremental_renderer(
                self.field_spec, plan, self.settings.t_thresh,
                self.settings.density_scale, self.compute_dtype,
                round_size, bucket=self.settings.infer_bucket,
                samples_per_ray=spr, windows_per_ray=wpr, mesh=self.mesh,
            )
        return self._render_jit_cache[key](
            params, self.occ_field, self.bbox, rays, self.raymarch_channels,
        )

    def _render_chunk_two_phase(
        self, params: Params, rays: RayBundle
    ) -> Dict[str, jnp.ndarray]:
        """One two-phase chunk dispatch at the CURRENT buckets — no host
        fetch, no demand check (the caller batches those per frame)."""
        spr = self._infer_spr_bucket
        wpr = self._infer_win_bucket
        sigb = min(self._infer_sig_bucket, spr)
        k1 = self.settings.infer_early_k1
        tailb = min(self._infer_tail_bucket, spr) if 0 < k1 < spr else spr
        key = ("two_phase", spr, wpr, sigb, k1, tailb, id(self.mesh))
        if key not in self._render_jit_cache:
            plan = self.make_plan(1, budget=1)  # re-chunked inside
            self._render_jit_cache[key] = make_two_phase_renderer(
                self.field_spec, plan, self.settings.t_thresh,
                self.settings.density_scale, self.compute_dtype,
                sig_eps=self.settings.infer_sig_eps,
                samples_per_ray=spr, windows_per_ray=wpr,
                sig_per_ray=sigb, early_k1=k1, tail_per_ray=tailb,
                mesh=self.mesh,
            )
        return self._render_jit_cache[key](
            params, self.occ_field, self.bbox, rays, self.raymarch_channels,
        )

    def _render_chunk_infer(
        self, params: Params, rays: RayBundle, round_size: int
    ) -> Dict[str, jnp.ndarray]:
        if self.settings.infer_two_phase:
            return self._render_chunk_two_phase(params, rays)
        return self._render_chunk_incremental(params, rays, round_size)

    def _grow_infer_buckets(
        self, n: int, marched: int, cand: int, sig: int = 0, tail: int = 0
    ) -> bool:
        """Grow the march-bucket ladders to cover observed demand on ``n``
        rays.  Returns True if any bucket grew."""
        before = (
            self._infer_spr_bucket, self._infer_win_bucket,
            self._infer_sig_bucket, self._infer_tail_bucket,
        )
        if marched > n * self._infer_spr_bucket:
            self._infer_spr_bucket = bucket_for(
                marched * 1.25 / n, self.settings.max_steps
            )
        if cand > n * self._infer_win_bucket:
            self._infer_win_bucket = next(
                (w for w in _WINDOW_BUCKETS if n * w >= cand * 1.25),
                max(_WINDOW_BUCKETS),
            )
        if sig > n * min(self._infer_sig_bucket, self._infer_spr_bucket):
            self._infer_sig_bucket = bucket_for(
                sig * 1.25 / n, self.settings.max_steps
            )
        if tail > n * min(self._infer_tail_bucket, self._infer_spr_bucket):
            self._infer_tail_bucket = bucket_for(
                tail * 1.25 / n, self.settings.max_steps
            )
        return (
            self._infer_spr_bucket, self._infer_win_bucket,
            self._infer_sig_bucket, self._infer_tail_bucket,
        ) != before

    def _infer_chunk_cap(self) -> int:
        """Rays per inference dispatch at the CURRENT samples/ray bucket:
        the largest power of two with chunk * bucket <= infer_sample_budget
        (floored at 256, ceiled at max(infer_chunk, infer_chunk_max)).  The
        budget cuts BOTH ways: high-demand regimes shrink the chunk so the
        per-dispatch march stream stays within HBM (instead of compiling
        graphs whose encoder-gather temps exceed it), and low-demand regimes
        (converged scene, 32-64 samples/ray) GROW it past infer_chunk so a
        1008x756 frame costs ~12 dispatches instead of ~93 at identical
        per-dispatch memory.  The candidate-window buffer (not covered by the
        sample budget) gets 4x the envelope — windows are ~8 B vs ~512 B of
        encoder-gather traffic per sample."""
        spr = max(1, self._infer_spr_bucket)
        wpr = max(1, self._infer_win_bucket)
        budget = self.settings.infer_sample_budget
        # Coarse-probe bound: the march's stage-1 stream is [chunk, Tc]
        # whatever the buckets say (see infer_probe_budget).
        t_lat = int(math.ceil(self.bound * self.settings.max_steps)) + 1
        tc = -(-t_lat // 8)
        cap = max(
            256,
            min(
                budget // spr,
                4 * budget // wpr,
                self.settings.infer_probe_budget // tc,
            ),
        )
        hi = max(self.settings.infer_chunk, self.settings.infer_chunk_max)
        chunk = 256
        while chunk * 2 <= min(cap, hi):
            chunk *= 2
        return chunk

    def _render_piece(
        self, params: Params, rays: RayBundle, round_size: int
    ) -> Dict[str, jnp.ndarray]:
        """Dispatch one frame piece, sub-chunking to the current chunk cap
        (bucket growth mid-frame can shrink the cap below the piece size).
        Sub-outputs merge exactly: maps concatenate, counters sum."""
        cap = self._infer_chunk_cap()
        n = len(rays)
        if n <= cap:
            return self._render_chunk_infer(params, rays, round_size)
        bounds = list(range(0, n, cap))
        subs = [
            self._render_chunk_infer(
                params,
                RayBundle(rays.origins[i : i + cap], rays.dirs[i : i + cap]),
                round_size,
            )
            for i in bounds
        ]
        sub_lens = [min(cap, n - i) for i in bounds]
        merged = {
            k: jnp.concatenate([s[k] for s in subs])
            for k in ("rgb_map", "trans_map", "classes", "weights_sum")
        }
        for k in subs[0]:
            if k in merged:
                continue
            if k in ("num_marched", "num_cand", "num_sig", "num_tail"):
                # Demand counters answer "does the CURRENT bucket cover one
                # dispatch?" — scale the worst sub-chunk's per-ray demand to
                # piece size so the caller's piece-level capacity check stays
                # exact; a piece-total sum could hide one overflowing
                # sub-chunk behind its under-budget siblings.
                # ceil-per-ray FIRST (keeps int32 away from overflow: the
                # per-ray value is <= max_steps, so * n stays < 2^31).
                merged[k] = functools.reduce(
                    jnp.maximum,
                    [
                        ((s[k] + ln - 1) // ln) * n
                        for s, ln in zip(subs, sub_lens)
                    ],
                )
            else:  # evaluation-count diagnostics: exact sums
                merged[k] = sum(s[k] for s in subs)
        return merged

    def _render_frame_incremental(
        self, params: Params, piece_rays: list, round_size: Optional[int] = None
    ) -> list:
        """Render a frame's chunks through the incremental path with ONE
        batched demand fetch per frame.

        All chunks dispatch back-to-back (device-resident outputs, no host
        sync between them); the demand counters of every chunk are then
        fetched in one transfer, the buckets grow to cover the frame-wide
        maximum, and only the chunks that actually overflowed re-render.
        Steady state: zero retries, one demand fetch per FRAME (a per-chunk
        blocking fetch would cost a tunnel round trip per chunk — ~93 per
        1008x756 frame at the 8192-ray default chunk)."""
        if round_size is None:
            round_size = self.settings.infer_round_size
        pieces = [
            self._render_piece(params, pr, round_size)
            for pr in piece_rays
        ]
        for _ in range(len(_WINDOW_BUCKETS) + 8):  # ladder is finite
            demands = jax.device_get(
                [
                    (
                        p["num_marched"], p["num_cand"],
                        p.get("num_sig", 0), p.get("num_tail", 0),
                    )
                    for p in pieces
                ]
            )
            spr, wpr = self._infer_spr_bucket, self._infer_win_bucket
            sigb = min(self._infer_sig_bucket, spr)
            tailb = min(self._infer_tail_bucket, spr)
            over = [
                i for i, (m, c, s, t) in enumerate(demands)
                if m > len(piece_rays[i]) * spr or c > len(piece_rays[i]) * wpr
                or s > len(piece_rays[i]) * sigb
                or t > len(piece_rays[i]) * tailb
            ]
            if not over:
                return pieces
            n_max = max(len(piece_rays[i]) for i in over)
            grew = self._grow_infer_buckets(
                n_max,
                max(int(demands[i][0]) for i in over),
                max(int(demands[i][1]) for i in over),
                max(int(demands[i][2]) for i in over),
                max(int(demands[i][3]) for i in over),
            )
            if not grew:
                import warnings

                worst = max(int(demands[i][0]) / len(piece_rays[i]) for i in over)
                warnings.warn(
                    f"inference march demand ({worst:.0f} samples/ray) exceeds"
                    " the bucket-ladder maxima; rendering with truncation"
                )
                return pieces
            for i in over:
                pieces[i] = self._render_piece(
                    params, piece_rays[i], round_size
                )
        return pieces

    def render_ray_batch_incremental(
        self, params: Params, rays: RayBundle, round_size: Optional[int] = None
    ) -> Dict[str, jnp.ndarray]:
        """Inference path without truncation (see make_incremental_renderer).

        The chunk's march buffers are bucket-sized (samples/ray and
        windows/ray ladders, seeded from the recon-tuned buckets riding the
        checkpoint); the renderer returns exact demand counters, and an
        undersized bucket triggers ONE grow-and-re-render (subsequent chunks
        reuse the grown bucket, so steady state pays zero retries).  Frame
        rendering (``render``) batches the demand fetches across all chunks
        instead of calling this per chunk — a blocking per-chunk fetch would
        serialize dispatch into one tunnel round trip per chunk."""
        if round_size is None:
            round_size = self.settings.infer_round_size
        n = len(rays)
        while True:
            out = self._render_piece(params, rays, round_size)
            marched = int(out["num_marched"])
            cand = int(out["num_cand"])
            sig = int(out.get("num_sig", 0))
            tail = int(out.get("num_tail", 0))
            if (
                marched <= n * self._infer_spr_bucket
                and cand <= n * self._infer_win_bucket
                and sig <= n * min(self._infer_sig_bucket, self._infer_spr_bucket)
                and tail <= n * min(self._infer_tail_bucket, self._infer_spr_bucket)
            ):
                return out
            if not self._grow_infer_buckets(n, marched, cand, sig, tail):
                # Demand exceeds the top ladder rung: the buckets cannot
                # grow further, so a retry would loop forever on the same
                # truncating graph.  Accept the truncation loudly.
                import warnings

                warnings.warn(
                    f"inference march demand ({marched / n:.0f} samples/ray,"
                    f" {cand / n:.0f} windows/ray) exceeds the bucket-ladder"
                    " maxima; rendering with truncation"
                )
                return out

    def render(
        self,
        params: Params,
        pose: jnp.ndarray,
        image: Optional[jnp.ndarray] = None,
        patch: Optional[Box2D] = None,
        num_rays: Optional[int] = None,
        training: bool = False,
        key: Optional[jax.Array] = None,
        chunk: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Reference Renderer.render surface (renderer.py:295-313).

        Training: subsample ``num_rays`` pixels.  Inference: render every grid
        pixel, chunked to bound memory (replaces the alive-ray loop).
        """
        # Precrop is handled by the trainer's step cache (training/trainer.py
        # _build_train_step); this surface always renders the full window.
        chunk_auto = chunk is None
        if chunk_auto:
            chunk = self.settings.infer_chunk
        if not training:
            # Size chunk * samples/ray-bucket to the per-dispatch HBM
            # envelope (see infer_sample_budget / infer_chunk_max): SHRINK
            # under high demand (a checkpoint restored into a foggy regime
            # would otherwise compile an oversized graph on frame 1), GROW
            # past infer_chunk when demand is low so the frame pays fewer
            # dispatches.  An explicit caller-chosen chunk is only shrunk.
            cap = self._infer_chunk_cap()
            chunk = cap if chunk_auto else min(chunk, cap)
        rays, target = generate_rays(
            pose, self.intr, image, patch=patch,
            num_rays=num_rays, camera_flip=self.settings.flip_camera, key=key,
        )
        output: Dict[str, jnp.ndarray] = {"target": target}

        n = len(rays)
        if training and num_rays is not None:
            out = self.render_ray_batch(params, rays)
        else:
            # pad to chunk multiple, render chunkwise, concat
            pad = (-n) % chunk
            o = jnp.concatenate([rays.origins, jnp.zeros((pad, 3))]) if pad else rays.origins
            d = (
                jnp.concatenate([rays.dirs, jnp.ones((pad, 3))]) if pad else rays.dirs
            )
            # Full-frame TRAINING renders (the style stage's pass 1) use the
            # BUDGETED path — exactly the reference, whose pass 1 goes through
            # render_train's compacted marching (trainers/style.py:177-179).
            # Inference uses the incremental alive-ray loop, which never
            # truncates (reference render_test, renderer.py:237-293).
            use_incremental = self.settings.adaptive_march and not training
            piece_rays = [
                RayBundle(o[i : i + chunk], d[i : i + chunk])
                for i in range(0, n + pad, chunk)
            ]
            if use_incremental:
                pieces = self._render_frame_incremental(params, piece_rays)
            else:
                pieces = [self.render_ray_batch(params, pr) for pr in piece_rays]
            out = {
                k: jnp.concatenate([p[k] for p in pieces])[:n]
                for k in ("rgb_map", "trans_map", "classes", "weights_sum")
            }
            # Device-side sum: chunks dispatch back-to-back with no host
            # fetch between them (each fetch is a full tunnel round trip).
            out["num_points"] = sum(p["num_points"] for p in pieces)
            for k in ("num_cand", "num_marched", "num_sig", "num_live", "num_tail"):
                if all(k in p for p in pieces):  # mode-dependent counters
                    out[k] = sum(p[k] for p in pieces)

        output.update(out)
        return output

    # ---- checkpoint interop (renderer.py:78-107) ----

    def state_dict_static(self) -> Dict[str, object]:
        """JSON-serializable renderer state for the checkpoint meta
        (renderer.py:80-81,94-97): validation fields plus the tuned compaction
        bucket.  The bucket must survive the recon -> style -> render chain,
        or downstream stages size their ray budgets at the max bucket
        (256/ray) and OOM on full-frame evals."""
        return {
            "intr": self.intr.asdict(),
            "precrop_frac": self.precrop_frac,
            "raymarch_channels": self.raymarch_channels,
            "bound": self.bound,
            "budget_bucket": self._budget_bucket,
            "last_num_rays": self._last_num_rays,
            "window_bucket": self._window_bucket,
            # The buckets are tuned per march regime: samples AND candidate
            # windows per ray both scale ~linearly with max_steps (lattice
            # resolution).  Recording it lets a loader under a different
            # regime rescale instead of starting mis-sized (fog-phase 256 ->
            # production 1024, recon 1024 -> style 512, ...).
            "max_steps": self.settings.max_steps,
        }

    def load_state_dict_static(self, sd: Dict[str, object]) -> None:
        """Restore host-side tuning from checkpoint meta; validates scalar
        compatibility fields the way the reference load_state_dict does
        (renderer.py:93-97)."""
        for k in ("raymarch_channels", "bound"):
            if k in sd and not _close(getattr(self, k), sd[k]):
                raise ValueError(
                    f'checkpoint mismatch for "{k}": {sd[k]} vs {getattr(self, k)}'
                )
        if "budget_bucket" in sd:
            # Cross-regime rescale: a bucket tuned under ckpt max_steps M0
            # describes samples (and windows) per ray at lattice resolution
            # M0; under the current regime both scale by M/M0 (see
            # state_dict_static).  mean_count rides the occupancy state and
            # is rescaled by the same factor so demand estimates agree.
            ck_steps = int(sd.get("max_steps", self.settings.max_steps))
            scale = self.settings.max_steps / max(1, ck_steps)
            self._budget_bucket = min(
                bucket_for(
                    int(sd["budget_bucket"]) * scale,
                    self.settings.max_samples_per_ray,
                ),
                self.settings.max_samples_per_ray,
            )
            self._last_num_rays = int(sd.get("last_num_rays", 1))
            if scale != 1.0 and self._mean_count_host > 0:
                self._mean_count_host = int(self._mean_count_host * scale)
                self.occ_state = self.occ_state._replace(
                    mean_count=(
                        self.occ_state.mean_count.astype(jnp.float32) * scale
                    ).astype(jnp.int32)
                )
            if "window_bucket" in sd:
                want_w = int(round(int(sd["window_bucket"]) * scale))
                self._window_bucket = next(
                    (b for b in _WINDOW_BUCKETS if b >= want_w),
                    max(_WINDOW_BUCKETS),
                )
            # Seed the inference march bucket from the recon-tuned demand
            # (same scene, same occupancy -> same samples/ray scale).
            self._infer_spr_bucket = max(
                self._infer_spr_bucket,
                min(self._budget_bucket, self.settings.max_steps),
            )
        elif self._mean_count_host > 0:
            # Legacy ckpt: assume the reference's default train batch size.
            self._last_num_rays = 4096
            self._budget_bucket = bucket_for(
                self._mean_count_host * 1.5 / 4096,
                self.settings.max_samples_per_ray,
            )


def _close(a, b) -> bool:
    try:
        return bool(abs(float(a) - float(b)) < 1e-9)
    except (TypeError, ValueError):
        return a == b
