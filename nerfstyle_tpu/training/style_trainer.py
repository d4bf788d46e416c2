"""Stylization-stage trainer.

Rebuild of the reference ``StyleTrainer`` (``/root/reference/trainers/style.py:24-219``):
loads a reconstruction checkpoint (model + occupancy only), optimizes ONLY the
color hash grid against VGG-feature style losses, using the deferred-backprop
two-pass scheme for full-image gradients:

  pass 1: render the full image without gradients (chunked);
  loss:   d(loss)/d(pixels) via ``jax.grad`` of the image-space loss at the
          rendered pixels (the reference caches ``rgb_map.grad``,
          style.py:182-187);
  pass 2: re-render patch-wise under ``jax.vjp`` and pull the cached pixel
          cotangents back to the color-grid parameters (style.py:189-198).

TPU-first notes: pass-2 VJPs are computed w.r.t. the *trainable subset only*
(the color embedder), so the backward never materializes density-branch
gradients; each patch shape compiles once.  On large-HBM parts the whole-image
gradient could instead be taken in one pass with ``jax.checkpoint`` remat —
the patch scheme is kept because it is the reference's memory behavior and
scales to arbitrary resolutions.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BaseConfig, ConfigValue
from ..data.style import SingleImage
from ..losses.recon import mse_loss
from ..losses.style import MattingLaplacian, get_style_loss
from ..models.vgg import VGG16FeatureExtractor
from ..render.renderer import render_rays
from ..training.trainer import Trainer
from .. import utils


def _tile_windows(w: int, h: int, pw: int, ph: int):
    """Equal-shape window tiling of a w x h frame with ownership masks.

    Returns (idx [G, pw*ph] int32 flat pixel indices, own [G, pw*ph] f32).
    Border windows shift inward so every window is exactly pw x ph (static
    shape for jit); each pixel is OWNED by the window of its unshifted tile,
    so overlapping pixels contribute their cotangent exactly once.
    """
    gx = max(1, -(-w // pw))
    gy = max(1, -(-h // ph))
    idx_list, own_list = [], []
    for j in range(gy):
        sy = min(j * ph, h - ph)
        for i in range(gx):
            sx = min(i * pw, w - pw)
            ys, xs = np.meshgrid(
                np.arange(sy, sy + ph), np.arange(sx, sx + pw), indexing="ij"
            )
            idx_list.append((ys * w + xs).reshape(-1).astype(np.int32))
            x_tile = np.minimum(xs // pw, gx - 1)
            y_tile = np.minimum(ys // ph, gy - 1)
            own = (x_tile == i) & (y_tile == j)
            own_list.append(own.reshape(-1).astype(np.float32))
    return np.stack(idx_list), np.stack(own_list)


class StyleTrainer(Trainer):
    OPTIM_KEYS = ["x_color_embedder"]

    def __init__(self, cfg: BaseConfig, nargs: List[str]):
        assert cfg.style_image is not None
        super().__init__(cfg, nargs, load_model_only=True)

        # Feature extractor + losses (style.py:42-54)
        fx_keys = ["relu3"]
        self.content_feat = "relu3"
        self.fx = VGG16FeatureExtractor(fx_keys)
        matching = None
        if self.train_cfg.style_matching is not None:
            matching = [int(c) for c in self.train_cfg.style_matching.split(",")]
        self.style_loss = get_style_loss(
            "SemanticStyleLoss", fx_keys,
            clusters_path=self.train_cfg.style_seg_path, matching=matching,
        )
        self.photo_loss = MattingLaplacian()  # constructed, unused in the total
        # (parity with style.py:54,98-107 where the photo term is commented out)

        if cfg.style_image is ConfigValue.EmptyPassed:
            # Multi-style Wikiart training is dormant in the reference
            # (style.py:56-62 raises); the dataset class exists in
            # data/style.py for when the semantic loss grows multi-style
            # support.
            raise NotImplementedError("multi-style (Wikiart) training not wired up")
        longer_edge = max(self.train_set.intr.w, self.train_set.intr.h)
        self.style_train_set = SingleImage(cfg.style_image, longer_edge)
        self.logger.info("Loaded %s", str(self.style_train_set))

        self.style_image = jnp.asarray(self.style_train_set[0])  # [3, H, W]
        style_feats = self.fx(self.style_image)
        self.style_loss.init_feats(style_feats, num_classes=self.train_set.num_classes)

        self._pass2_cache: Dict = {}
        # Per-pose host caches (valid for the whole run: density frozen).
        self._win_counts_cache: Dict[int, np.ndarray] = {}
        self._win_group_cache: Dict[int, list] = {}
        # Frozen-geometry caches (style_geom_cache): per-pose compacted
        # weight-significant sample streams; see _build_geom_cache.  Insertion
        # order doubles as LRU order (dict is re-inserted on hit) for the
        # style_geom_cache_max_poses eviction cap.
        self._geom_cache: Dict[int, Dict] = {}
        self._sig_bucket = 8  # significant samples/ray bucket (ladder-grown)
        # Presize from the recon checkpoint's settled two-phase kept-prefix
        # bucket: {w > eps} ⊆ {T > t_thresh} per ray (w = alpha*T <= T), so at
        # the default eps == t_thresh the recon bucket is an upper bound on
        # this stage's significant-sample demand.  Starting there avoids the
        # grow -> evict-all-caches -> rebuild cycle (each ladder move is a
        # multi-minute XLA compile on the remote helper); the first pose
        # build shrinks-to-fit on its exact demand counter so the upper
        # bound doesn't tax all 200 iterations (_build_geom_cache).
        ts = getattr(self, "_restored_trainer_static", None) or {}
        sb = ts.get("sig_bucket_train")
        if sb:
            self._sig_bucket = max(self._sig_bucket, int(sb))
            self._sig_presized = True
        else:
            self._sig_presized = False
        self._frame_dirs_dev = None
        # Bucket-retune fetch gating (run_iter): fetches stop for good after
        # two consecutive no-change retunes.
        self._retunes_active = True
        self._stable_retunes = 0
        self._data_iter = self.train_set.iter_shuffled_indexed(
            seed=self.train_cfg.rng_seed
        )

    # ------------------------------------------------------------------
    # loss (style.py:74-117)
    # ------------------------------------------------------------------

    def _image_losses(self, rgb_map_flat, target_chw, preds, target_content_feat=None):
        """Full-image losses as a pure function of the rendered pixels.

        rgb_map_flat: [HW, 3]; target_chw: [3, H, W]; preds: [H, W] labels.
        ``target_content_feat`` optionally supplies the (constant) content
        feature of the target image, skipping its VGG forward.
        Returns (total, dict of scalars).
        """
        w, h = self.train_set.intr.size()
        rgb_chw = rgb_map_flat.T.reshape(3, h, w)

        rgb_feats = self.fx(rgb_chw)
        if target_content_feat is None:
            target_content_feat = self.fx(target_chw)[self.content_feat]

        content = mse_loss(rgb_feats[self.content_feat], target_content_feat)
        style = self.style_loss(rgb_feats, None, preds, self.iter_ctr)

        content = content * self.train_cfg.content_lambda
        style = style * self.train_cfg.style_lambda
        total = content + style
        return total, {"content": content, "style": style, "total": total}

    # ------------------------------------------------------------------
    # pass 2 machinery
    # ------------------------------------------------------------------

    def _split_params(self):
        trainable = {k: v for k, v in self.params.items() if any(kw in k for kw in self.OPTIM_KEYS)}
        frozen = {k: v for k, v in self.params.items() if k not in trainable}
        return trainable, frozen

    # ------------------------------------------------------------------
    # pass 2: deferred backprop with PER-WINDOW budgets
    #
    # The reference loops ``defer_patch_size`` patches on the host with one
    # backward launch each (style.py:189-198).  Here the frame is tiled into
    # equal-shape windows (border windows shift inward; each pixel's
    # cotangent is applied by exactly one owning window, so overlaps
    # contribute zero) and windows are re-rendered under ``jax.grad`` of
    # ``sum(rgb * pixel_grad)`` — which IS the patch VJP — in jitted
    # ``lax.scan`` groups.
    #
    # TPU-first: encoder+backward work scales with the compaction budget, and
    # per-window demand is wildly heterogeneous (object-covering vs sky
    # windows).  Because the DENSITY grid is frozen in this stage, each
    # pose's marching — hence each window's sample demand — is CONSTANT for
    # the whole run, so demands are measured once per pose (march-only jit,
    # one host fetch), windows are bucketed per-window on the budget ladder,
    # empty windows are skipped outright, and one scan per bucket group
    # accumulates grads on device.  A uniform budget would pay the densest
    # window's budget for every window, every iteration.
    # ------------------------------------------------------------------

    PASS2_MARGIN = 1.5

    def _pass2_tiling(self):
        if getattr(self, "_tiling", None) is None:
            from ..core.cameras import camera_dir_grid

            w, h = self.train_set.intr.size()
            ps = self.train_cfg.defer_patch_size
            pw, ph = min(ps, w), min(ps, h)
            win_idx_np, win_own_np = _tile_windows(w, h, pw, ph)
            cam_dirs_np, _ys, _xs = camera_dir_grid(
                self.train_set.intr, self.settings.flip_camera
            )
            self._tiling = (
                win_idx_np, win_own_np,
                jnp.asarray(cam_dirs_np.reshape(-1, 3)), pw * ph,
            )
        return self._tiling

    def _win_cap(self) -> int:
        """Largest admissible per-window bucket: 1.5x the frame-mean bucket
        (measured round 2: a 2x margin cost ~70% style wall-clock for
        marginal gradient fidelity), clamped to the truncation cap."""
        return min(
            (3 * self.renderer._budget_bucket + 1) // 2,
            self.settings.max_samples_per_ray,
        )

    def _window_counts(self, pose_idx: int, bitfield, pose) -> np.ndarray:
        """Per-window kept-sample counts for this pose (cached; density is
        frozen so they never change across iterations)."""
        cached = self._win_counts_cache.get(pose_idx)
        if cached is not None:
            return cached

        win_idx_np, _own, cam_dirs, n_pix = self._pass2_tiling()
        key = ("wincount",)
        if key not in self._pass2_cache:
            import dataclasses

            from ..core.types import make_rays
            from ..ops.aabb import near_far_from_aabb
            from ..ops.marching import march_rays

            # Exact counts: full window domain (window_budget=None), tiny
            # compaction budget (compaction outputs are unused -> DCE'd).
            plan = dataclasses.replace(
                self.renderer.make_plan(n_pix, budget=256), window_budget=None
            )
            win_idx_dev = jnp.asarray(win_idx_np)

            @jax.jit
            def f(bitfield, pose):
                rot = pose[:3, :3]
                origin = pose[:3, 3]

                def body(_, idx):
                    rays = make_rays(origin, cam_dirs[idx] @ rot.T)
                    nears, fars = near_far_from_aabb(
                        rays.origins, rays.dirs, plan.aabb, plan.min_near
                    )
                    sb = march_rays(plan, bitfield, rays, nears, fars)
                    return None, sb.num_kept

                _, counts = jax.lax.scan(body, None, win_idx_dev)
                return counts

            self._pass2_cache[key] = f
        counts = np.asarray(self._pass2_cache[key](bitfield, pose))
        self._win_counts_cache[pose_idx] = counts
        return counts

    def _pass2_scan_fn(self, per_ray: int, n_win: int):
        """Jitted scan over ``n_win`` windows at ``per_ray`` budget/ray."""
        key = (per_ray, n_win, self.renderer._window_bucket)
        if key in self._pass2_cache:
            return self._pass2_cache[key]

        from ..core.types import make_rays

        _wi, _wo, cam_dirs, n_pix = self._pass2_tiling()
        spec = self.field_spec
        settings = self.settings
        bbox = self.train_set.bbox
        plan = self.renderer.make_plan(n_pix, budget=n_pix * per_ray)
        dtype = self.compute_dtype

        sharded = None
        mesh = self.mesh
        if (
            mesh is not None
            and n_pix % mesh.devices.size == 0
            and plan.budget % mesh.devices.size == 0
        ):
            from ..parallel.mesh import build_sharded_cotangent_sum

            sharded = build_sharded_cotangent_sum(
                mesh, spec, plan, settings.t_thresh, settings.density_scale,
                dtype,
            )

        @jax.jit
        def f(trainable, frozen, bitfield, pose, grad_map_flat, win_idx, win_own):
            rot = pose[:3, :3]
            origin = pose[:3, 3]

            def body(acc, win):
                idx, own = win
                rays = make_rays(origin, cam_dirs[idx] @ rot.T)
                cot = grad_map_flat[idx] * own[:, None]

                def weighted_sum(tr):
                    p = {**tr, **frozen}
                    if sharded is not None:
                        return sharded(
                            p, bitfield, bbox, rays.origins, rays.dirs, cot
                        )
                    out = render_rays(
                        spec, plan, p, bitfield, bbox, rays,
                        settings.t_thresh, settings.density_scale, dtype,
                    )
                    return jnp.sum(out["rgb_map"] * cot)

                g = jax.grad(weighted_sum)(trainable)
                return jax.tree_util.tree_map(jnp.add, acc, g), None

            acc0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            grads, _ = jax.lax.scan(body, acc0, (win_idx, win_own))
            return grads

        self._pass2_cache[key] = f
        return f

    def _pass2_groups(self, pose_idx: int, bitfield, pose):
        """Windows grouped by per-window budget bucket for this pose;
        device-resident (bucket, win_idx, win_own) triples, cached."""
        cached = self._win_group_cache.get(pose_idx)
        if cached is not None:
            return cached

        from ..render.renderer import bucket_for

        win_idx_np, win_own_np, _cd, n_pix = self._pass2_tiling()
        counts = self._window_counts(pose_idx, bitfield, pose)
        cap = self._win_cap()
        groups: Dict[int, list] = {}
        for wid, cnt in enumerate(counts):
            if cnt == 0:
                continue  # empty window: exactly zero gradient
            b = bucket_for(self.PASS2_MARGIN * float(cnt) / n_pix, cap)
            groups.setdefault(b, []).append(wid)
        out = [
            (b, jnp.asarray(win_idx_np[ids]), jnp.asarray(win_own_np[ids]))
            for b, ids in sorted(groups.items())
        ]
        self._win_group_cache[pose_idx] = out
        self.logger.info(
            "Pose %d pass-2 buckets: %s (uniform would be %d x %d/ray)",
            pose_idx,
            {b: wi.shape[0] for b, wi, _ in out},
            len(counts), cap,
        )
        return out

    def _pass2_grads(self, pose_idx, trainable, frozen, bitfield, pose, grad_map):
        acc = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        for b, wi, wo in self._pass2_groups(pose_idx, bitfield, pose):
            g = self._pass2_scan_fn(b, wi.shape[0])(
                trainable, frozen, bitfield, pose, grad_map, wi, wo
            )
            acc = jax.tree_util.tree_map(jnp.add, acc, g)
        return acc

    # ------------------------------------------------------------------
    # frozen-geometry fast path (style_geom_cache)
    #
    # The reference re-marches and re-evaluates the ENTIRE field for every
    # pose on every iteration — in pass 1 (full-image render) AND pass 2
    # (patch re-renders under autograd), trainers/style.py:177-198.  But the
    # stylization stage freezes the density branch (only x_color_embedder
    # trains, style.py:25), so a pose's geometry — marched sample positions,
    # densities, compositing weights, per-pixel accumulated alpha — is
    # CONSTANT for all 200 iterations.  TPU-first consequence: march +
    # density are hoisted out of the loop entirely.  Each pose's weight-
    # significant samples are extracted ONCE into a compacted device cache,
    # and every iteration becomes ONE jitted forward+backward over that
    # stream: color-branch evaluation, segment-sum compositing, VGG losses,
    # and the color-grid VJP — no marching, no density MLP, no window
    # machinery, no multi-pass scheme.
    # ------------------------------------------------------------------

    def _frame_dirs(self):
        """Camera-frame direction grid for the full frame (device-resident)
        plus the integer pixel maps that align a raw image with ray order."""
        if self._frame_dirs_dev is None:
            from ..core.cameras import camera_dir_grid

            cam_dirs_np, ys, xs = camera_dir_grid(
                self.train_set.intr, self.settings.flip_camera
            )
            self._frame_dirs_dev = (
                jnp.asarray(cam_dirs_np.reshape(-1, 3)), ys, xs
            )
        return self._frame_dirs_dev

    def _cache_build_fn(self, chunk: int, spb: int):
        """Jitted per-chunk extractor: march + density + weights, then
        compact the weight-significant samples to a [chunk*spb] stream."""
        key = (
            "geombuild", chunk, spb,
            self.renderer._budget_bucket, self.renderer._window_bucket,
        )
        if key in self._pass2_cache:
            return self._pass2_cache[key]

        from ..core.types import make_rays
        from ..models.fields import field_density
        from ..ops.aabb import near_far_from_aabb
        from ..ops.compact import compact_indices
        from ..ops.compositing import sample_weights
        from ..ops.marching import march_rays

        spec = self.field_spec
        settings = self.settings
        bbox = self.train_set.bbox
        dtype = self.compute_dtype
        plan = self.renderer.make_plan(chunk)
        cap = chunk * spb
        eps = float(self.train_cfg.style_geom_cache_eps)
        use_dir = spec.use_dir

        @jax.jit
        def f(params, bitfield, pose, cam_dirs_chunk):
            rot = pose[:3, :3]
            origin = pose[:3, 3]
            rays = make_rays(origin, cam_dirs_chunk @ rot.T)
            nears, fars = near_far_from_aabb(
                rays.origins, rays.dirs, plan.aabb, plan.min_near
            )
            sb = march_rays(plan, bitfield, rays, nears, fars)
            sigmas = field_density(
                spec, params, bbox, sb.xyz, compute_dtype=dtype
            ) * settings.density_scale
            # Same weight formula (and inf-sigma cap) as ops/compositing.py.
            w, _ = sample_weights(
                sigmas, sb.ray_id, sb.valid, chunk, plan.dt, settings.t_thresh
            )

            sig = (w > eps) & sb.valid
            n_sig = jnp.sum(sig, dtype=jnp.int32)
            idx = compact_indices(sig, cap, plan.budget)
            ok = idx < plan.budget
            take = jnp.minimum(idx, plan.budget - 1)
            xyz = jnp.take(sb.xyz, take, axis=0)
            wv = jnp.where(ok, jnp.take(w, take), 0.0)
            rid = jnp.where(ok, jnp.take(sb.ray_id, take), chunk)
            acc_ws = jax.ops.segment_sum(w, sb.ray_id, num_segments=chunk + 1)[:chunk]
            # Dropped (sub-threshold) weight mass per ray: the exact error
            # bound of the cache, reported once per pose in the build log.
            dropped = jax.ops.segment_sum(
                jnp.where(sig, 0.0, w), sb.ray_id, num_segments=chunk + 1
            )[:chunk]
            out = (xyz, wv, rid, acc_ws, jnp.max(dropped), n_sig,
                   sb.num_kept, sb.num_cand)
            if use_dir:
                dirs = jnp.take(sb.dirs, take, axis=0)
                return out + (dirs,)
            return out

        self._pass2_cache[key] = f
        return f

    def _build_geom_cache(self, pose_idx: int, image, pose_dev) -> Dict:
        """Extract the pose's frozen geometry into a compacted device cache.

        Chunked over the frame (renderer.infer_chunk rays per dispatch);
        march/window/significant-sample buckets grow on exact observed demand
        and only the overflowed chunks re-run (one batched demand fetch)."""
        from ..render.renderer import _BUDGET_BUCKETS, bucket_for

        w, h = self.train_set.intr.size()
        hw = w * h
        # Dispatch-chunk law, same two-sided envelope as the renderer's
        # _infer_chunk_cap: largest power of two whose march stream
        # (chunk * samples/ray bucket) fits infer_sample_budget, windows get
        # 4x.  At settled buckets (~64/ray) a 504x378 pose costs 3 dispatches
        # instead of 24 — each dispatch is a remote-tunnel round trip, and
        # the epoch-1 cache builds sit on the style stage's critical path.
        # High-demand checkpoints shrink the chunk instead (compile-OOM
        # guard, exactly like inference).
        import math

        spr = max(1, self.renderer._budget_bucket)
        wpr = max(1, self.renderer._window_bucket)
        budget = self.settings.infer_sample_budget
        # Coarse-probe bound, mirroring Renderer._infer_chunk_cap: the
        # march's stage-1 [chunk, Tc] stream scales with rays x lattice
        # length regardless of the buckets (the r5 seeding run's 65536-ray
        # cache-build graph OOMed the remote compiler on exactly this term).
        t_lat = int(math.ceil(self.renderer.bound * self.settings.max_steps)) + 1
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
        chunk = min(chunk, hw)
        cam_dirs, ys, xs = self._frame_dirs()
        pad = (-hw) % chunk
        if pad:
            cam_dirs = jnp.concatenate([cam_dirs, jnp.ones((pad, 3))])
        n_chunks = (hw + pad) // chunk
        bitfield = self.renderer.occ_field

        t0 = time.time()
        sig_bucket_at_entry = self._sig_bucket
        pieces = [None] * n_chunks
        todo = list(range(n_chunks))
        for _ in range(len(_BUDGET_BUCKETS) + 8):  # ladders are finite
            fn = self._cache_build_fn(chunk, self._sig_bucket)
            for i in todo:
                pieces[i] = fn(
                    self.params, bitfield, pose_dev,
                    jax.lax.slice_in_dim(cam_dirs, i * chunk, (i + 1) * chunk),
                )
            demands = jax.device_get(
                [(p[5], p[6], p[7]) for p in pieces]
            )
            budget = chunk * self.renderer._budget_bucket
            wb = chunk * self.renderer._window_bucket
            cap = chunk * self._sig_bucket
            todo = [
                i for i, (s, k, c) in enumerate(demands)
                if s > cap or k > budget or c > wb
            ]
            if not todo:
                break
            s_max = max(int(demands[i][0]) for i in todo)
            k_max = max(int(demands[i][1]) for i in todo)
            c_max = max(int(demands[i][2]) for i in todo)
            before = (
                self.renderer._budget_bucket, self.renderer._window_bucket,
                self._sig_bucket,
            )
            if k_max > budget or c_max > wb:
                # EXACT demands with floor_current: growing only what
                # overflowed.  (Passing capacity maxima as demand inflated
                # the non-overflowing ladder by 1.25x per retry — the r03
                # dryrun's spurious truncation-warning ratchet.)
                self.renderer.retune_bucket_now(
                    k_max, chunk, num_cand=c_max, floor_current=True
                )
            if s_max > cap:
                self._sig_bucket = bucket_for(
                    s_max * 1.25 / chunk, self.settings.max_steps
                )
            if (
                self.renderer._budget_bucket, self.renderer._window_bucket,
                self._sig_bucket,
            ) == before:
                # Demand exceeds a hard cap (max_samples_per_ray / ladder
                # max): the buckets cannot grow, so the cached stream
                # truncates exactly like the budgeted two-pass path does
                # under the same cap.  Rebuilding would loop forever.
                self.logger.warning(
                    "geometry-cache demand exceeds hard caps (samples %.0f, "
                    "kept %.0f, windows %.0f per ray); caching with "
                    "truncation", s_max / chunk, k_max / chunk, c_max / chunk,
                )
                break

        if self._sig_presized and not self._geom_cache:
            # First pose under a checkpoint-presized (upper-bound) bucket:
            # shrink-to-fit on the exact demand counters so the whole epoch's
            # fused steps don't run over a padded stream sized for the recon
            # stage's kept-prefix.  One extra build of ONE pose, before any
            # other pose caches exist (nothing to evict).
            s_max = max(int(d[0]) for d in demands)
            settled = bucket_for(s_max * 1.25 / chunk, self.settings.max_steps)
            if settled < self._sig_bucket:
                self.logger.info(
                    "sig bucket shrink-to-fit: presized %d -> settled %d "
                    "(max chunk demand %.1f/ray)",
                    self._sig_bucket, settled, s_max / chunk,
                )
                self._sig_bucket = settled
                fn = self._cache_build_fn(chunk, self._sig_bucket)
                for i in range(n_chunks):
                    pieces[i] = fn(
                        self.params, bitfield, pose_dev,
                        jax.lax.slice_in_dim(
                            cam_dirs, i * chunk, (i + 1) * chunk
                        ),
                    )
                demands = jax.device_get([(p[5], p[6], p[7]) for p in pieces])
        self._sig_presized = False

        cache = {
            "xyz": jnp.concatenate([p[0] for p in pieces]),
            "w": jnp.concatenate([p[1] for p in pieces]),
            "rid": jnp.concatenate(
                [
                    jnp.where(p[2] < chunk, jnp.minimum(p[2] + i * chunk, hw), hw)
                    for i, p in enumerate(pieces)
                ]
            ),
            "acc_ws": jnp.concatenate([p[3] for p in pieces])[:hw],
        }
        if self.field_spec.use_dir:
            cache["dirs"] = jnp.concatenate([p[8] for p in pieces])
        # Dataset images are channels-first [C, H, W] (C = 3, or 4 with the
        # segmentation channel).  Gather through the ys/xs pixel maps so the
        # target is in RAY order — identical to generate_rays' target
        # (core/cameras.py:111-113); under flip_camera the raw image rows
        # would otherwise misalign with rgb_map's ray-major layout.
        img = jnp.asarray(image)
        target_chw = img[:3][:, jnp.asarray(ys)][:, :, jnp.asarray(xs)]
        cache["target_chw"] = target_chw
        cache["tgt_feat"] = self.fx(target_chw)[self.content_feat]
        n_sig = sum(int(d[0]) for d in demands)
        drop_max = max(float(jax.device_get(p[4])) for p in pieces)
        self.logger.info(
            "Pose %d geometry cache: %d significant samples (%.1f/ray, "
            "bucket %d/ray), max dropped weight/ray %.2e, built in %.2fs",
            pose_idx, n_sig, n_sig / hw, self._sig_bucket, drop_max,
            time.time() - t0,
        )
        if self._sig_bucket != sig_bucket_at_entry and self._geom_cache:
            # The fused step (and the forward fn) compile per stream size S =
            # rays * sig_bucket: caches built at the old bucket would each
            # keep their own S alive and force one more multi-minute compile
            # apiece.  Evict them — a rebuild at the settled bucket is
            # seconds; they rebuild on their next visit.
            self.logger.info(
                "sig bucket grew %d -> %d; evicting %d stale pose caches",
                sig_bucket_at_entry, self._sig_bucket, len(self._geom_cache),
            )
            self._geom_cache.clear()
        self._geom_cache[pose_idx] = cache
        return cache

    @staticmethod
    def _geom_cache_nbytes(cache: Dict) -> int:
        return sum(
            v.nbytes for v in cache.values() if hasattr(v, "nbytes")
        )

    def _evict_geom_caches(self, keep: int) -> None:
        """LRU-evict pose caches beyond the count/byte bounds (never the
        pose in use).  Device memory frees by refcount."""
        cap = self.train_cfg.style_geom_cache_max_poses
        max_bytes = float(self.train_cfg.style_geom_cache_bytes)

        def over() -> bool:
            if cap > 0 and len(self._geom_cache) > cap:
                return True
            if max_bytes > 0 and len(self._geom_cache) > 1:
                total = sum(
                    self._geom_cache_nbytes(c)
                    for c in self._geom_cache.values()
                )
                return total > max_bytes
            return False

        while over():
            victim = next(k for k in self._geom_cache if k != keep)
            del self._geom_cache[victim]

    def _color_channels(self, params, cache_xyz, cache_dirs=None):
        """StyleTCNerf color-branch channels (style_nerf.py:129-142) for a
        cached sample stream: [S, 3+K].  Pointwise in the samples, so it
        shards on the stream.  Dedup-free (models/fields.py field_color)."""
        from ..models.fields import field_color

        return field_color(
            self.field_spec, params, self.train_set.bbox, cache_xyz,
            cache_dirs, compute_dtype=self.compute_dtype,
        )

    def _color_forward(self, params, cache_xyz, cache_w, cache_rid,
                       cache_acc_ws, cache_dirs=None):
        """Color-branch forward over a cached stream -> (rgb_map [HW,3],
        class_map [HW,K]): channels, then segment-sum compositing with the
        cached weights."""
        w, h = self.train_set.intr.size()
        hw = w * h
        ch = self._color_channels(params, cache_xyz, cache_dirs)
        img = jax.ops.segment_sum(
            cache_w[:, None] * ch, cache_rid, num_segments=hw + 1
        )[:hw]
        # White background blend, identical to render_rays (renderer.py:232).
        rgb_map = img[:, :3] + (1.0 - cache_acc_ws)[:, None]
        return rgb_map, img[:, 3:]

    def _cache_args(self, cache):
        return (
            cache["xyz"], cache["w"], cache["rid"], cache["acc_ws"],
            cache.get("dirs"),
        )

    def _fast_fwd_fn(self, S: int):
        """Jitted forward-only render from a cached stream (matching init)."""
        key = ("fastfwd", S)
        if key not in self._pass2_cache:
            w, h = self.train_set.intr.size()

            @jax.jit
            def f(params, xyz, wgt, rid, acc_ws, dirs):
                rgb_map, cls_map = self._color_forward(
                    params, xyz, wgt, rid, acc_ws, dirs
                )
                return rgb_map, jnp.argmax(cls_map, axis=1).reshape(h, w)

            self._pass2_cache[key] = f
        return self._pass2_cache[key]

    def _fast_step_fn(self, S: int):
        """Jitted fused style step: loss + color-grid grads from a cache.

        Keyed on the stream size and the (trace-static) Hungarian matching
        state — update_matching swaps the loss's masking constants.

        With a device mesh, the sample stream shards on the batch axis: each
        device evaluates the color branch on its shard and segment-sums a
        partial image; ONE psum assembles the full image, the (cheap) VGG
        loss replicates, and AD through shard_map psums the color-grid grads
        — two all-reduces per step total.

        On a single device, streams above style_step_window_slots go through
        the scanned-window variant (:meth:`_fast_step_windowed_fn`) to bound
        the hash-grid backward's sort-stream temps."""
        mv = None if self.style_loss.matching is None else tuple(
            int(m) for m in self.style_loss.matching
        )
        mesh = self.mesh
        n_dev = mesh.devices.size if mesh is not None else 1
        use_mesh = n_dev > 1 and S % n_dev == 0
        win = int(self.train_cfg.style_step_window_slots)
        if not use_mesh and 0 < win < S:
            return self._fast_step_windowed_fn(S, -(-S // win))
        key = ("faststep", S, mv, use_mesh and id(mesh))
        if key in self._pass2_cache:
            return self._pass2_cache[key]

        w, h = self.train_set.intr.size()
        hw = w * h

        def image_loss(trainable, frozen, xyz, wgt, rid, acc_ws, dirs,
                       target_chw, tgt_feat, *, sharded: bool):
            p = {**trainable, **frozen}
            ch = self._color_channels(p, xyz, dirs)
            img = jax.ops.segment_sum(
                wgt[:, None] * ch, rid, num_segments=hw + 1
            )[:hw]
            if sharded:
                img = jax.lax.psum(img, "data")
            rgb_map = img[:, :3] + (1.0 - acc_ws)[:, None]
            preds = jnp.argmax(img[:, 3:], axis=1).reshape(h, w)
            return self._image_losses(rgb_map, target_chw, preds, tgt_feat)

        if use_mesh:
            from functools import partial

            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import shard_map

            dirs_spec = P("data") if self.field_spec.use_dir else P()
            loss_fn = shard_map(
                partial(image_loss, sharded=True),
                mesh=mesh,
                in_specs=(
                    P(), P(), P("data"), P("data"), P("data"), P(),
                    dirs_spec, P(), P(),
                ),
                out_specs=P(),
                check_vma=False,
            )
        else:
            from functools import partial

            loss_fn = partial(image_loss, sharded=False)

        @jax.jit
        def f(trainable, frozen, xyz, wgt, rid, acc_ws, dirs, target_chw, tgt_feat):
            (total, scalars), g = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, xyz, wgt, rid, acc_ws, dirs,
                target_chw, tgt_feat,
            )
            return total, scalars, g

        self._pass2_cache[key] = f
        return self._pass2_cache[key]

    def _fast_step_windowed_fn(self, S: int, n_win: int):
        """Scanned-window variant of the fused style step (same signature).

        One jitted fn: the forward scans the cached stream in ``n_win``
        equal windows accumulating the composited image, the VGG/style loss
        backpropagates to PIXEL cotangents once, and a second scan
        backpropagates each window's per-sample cotangent
        (w * pixel_grad[ray]) through the color branch, accumulating table
        grads.  EXACT: the composited image is linear in the per-sample
        color channels, so splitting the VJP at the pixel boundary is the
        chain rule, not an approximation (same scheme as the two-pass
        deferred backprop, reference trainers/style.py:177-198 — but over
        the cached stream, with no marching or density work).  Peak memory
        is one window's encode activations + sort stream instead of the
        whole stream's.
        """
        mv = None if self.style_loss.matching is None else tuple(
            int(m) for m in self.style_loss.matching
        )
        key = ("faststepwin", S, n_win, mv)
        if key in self._pass2_cache:
            return self._pass2_cache[key]

        from ..models.fields import field_color

        spec = self.field_spec
        bbox = self.train_set.bbox
        dtype = self.compute_dtype
        w, h = self.train_set.intr.size()
        hw = w * h
        channels = 3 + spec.class_dim
        win = -(-S // n_win)
        pad = n_win * win - S
        use_dir = spec.use_dir

        @jax.jit
        def f(trainable, frozen, xyz, wgt, rid, acc_ws, dirs, target_chw, tgt_feat):
            p = {**trainable, **frozen}

            def padded(a, fill):
                if pad == 0:
                    return a
                return jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
                )

            xyz_w = padded(xyz, 0.0).reshape(n_win, win, 3)
            wgt_w = padded(wgt, 0.0).reshape(n_win, win)
            rid_w = padded(rid, hw).reshape(n_win, win)
            xs = (xyz_w, wgt_w, rid_w)
            if use_dir:
                xs = xs + (padded(dirs, 0.0).reshape(n_win, win, 3),)

            def fwd_body(img, x):
                xyz_i, wgt_i, rid_i = x[:3]
                ch = field_color(
                    spec, p, bbox, xyz_i, x[3] if use_dir else None,
                    compute_dtype=dtype,
                )
                return img + jax.ops.segment_sum(
                    wgt_i[:, None] * ch, rid_i, num_segments=hw + 1
                ), None

            img0 = jnp.zeros((hw + 1, channels), jnp.float32)
            img, _ = jax.lax.scan(fwd_body, img0, xs)
            img = img[:hw]
            rgb_map = img[:, :3] + (1.0 - acc_ws)[:, None]
            preds = jnp.argmax(img[:, 3:], axis=1).reshape(h, w)

            (total, scalars), pixel_grad = jax.value_and_grad(
                self._image_losses, has_aux=True
            )(rgb_map, target_chw, preds, tgt_feat)
            # Row hw = the fill target of padding/overflow slots: zero grad.
            pg = jnp.concatenate(
                [pixel_grad, jnp.zeros((1, 3), pixel_grad.dtype)]
            )

            def bwd_body(acc, x):
                xyz_i, wgt_i, rid_i = x[:3]
                cot = wgt_i[:, None] * jnp.take(pg, rid_i, axis=0)

                def weighted_sum(tr):
                    pp = {**tr, **frozen}
                    ch = field_color(
                        spec, pp, bbox, xyz_i, x[3] if use_dir else None,
                        compute_dtype=dtype,
                    )
                    return jnp.sum(ch[:, :3] * cot)

                g = jax.grad(weighted_sum)(trainable)
                return jax.tree_util.tree_map(jnp.add, acc, g), None

            acc0 = jax.tree_util.tree_map(
                lambda a: jnp.zeros_like(a), trainable
            )
            grads, _ = jax.lax.scan(bwd_body, acc0, xs)
            return total, scalars, grads

        self._pass2_cache[key] = f
        return self._pass2_cache[key]

    def _run_iter_cached(self):
        """One style iteration on the frozen-geometry fast path."""
        self.time0 = time.time()
        pose_idx, (image, pose) = next(self._data_iter)
        pose_dev = jnp.asarray(pose)

        cache = self._geom_cache.get(pose_idx)
        if cache is None:
            cache = self._build_geom_cache(pose_idx, image, pose_dev)
        else:
            # Refresh LRU position (dicts preserve insertion order).
            del self._geom_cache[pose_idx]
            self._geom_cache[pose_idx] = cache
        self._evict_geom_caches(keep=pose_idx)
        S = cache["xyz"].shape[0]

        # First call computes the Hungarian matching on host (loss.py:169-184)
        # BEFORE the step traces — the matching is a trace-time constant.
        if self.style_loss.use_matching and self.style_loss.matching is None:
            w, h = self.train_set.intr.size()
            rgb_map, preds = self._fast_fwd_fn(S)(
                self.params, *self._cache_args(cache)
            )
            feats = self.fx(rgb_map.T.reshape(3, h, w))[self.style_loss.keys[0]][0]
            self.style_loss.update_matching(feats, preds)
            self.logger.info(
                "Style matching: %s", list(map(int, self.style_loss.matching))
            )

        trainable, frozen = self._split_params()
        total, scalars, grads = self._fast_step_fn(S)(
            trainable, frozen, *self._cache_args(cache),
            cache["target_chw"], cache["tgt_feat"],
        )

        full_grads = {
            **grads,
            **jax.tree_util.tree_map(jnp.zeros_like, frozen),
        }
        updates, self.opt_state = self.optim.update(
            full_grads, self.opt_state, self.params
        )
        import optax

        self.params = optax.apply_updates(self.params, updates)
        # EMA intentionally NOT updated in the style stage (style.py:205).

        self.iter_ctr += 1
        self.time1 = time.time()

        losses_lv = self._to_loss_values(scalars)
        if self._check_interval(self.train_cfg.intervals.print):
            self.print_status(losses_lv)
        if self._check_interval(self.train_cfg.intervals.test):
            self.test_networks()
        if self._check_interval(self.train_cfg.intervals.log):
            self.log_status(losses_lv)
        if self._check_interval(self.train_cfg.intervals.ckpt, final=True):
            self.save_ckpt()

    # ------------------------------------------------------------------
    # iteration (style.py:162-219)
    # ------------------------------------------------------------------

    def run_iter(self):
        if self.train_cfg.style_geom_cache:
            return self._run_iter_cached()
        return self._run_iter_two_pass()

    def _run_iter_two_pass(self):
        self.time0 = time.time()
        pose_idx, (image, pose) = next(self._data_iter)
        image_dev = jnp.asarray(image)
        pose_dev = jnp.asarray(pose)
        w, h = self.train_set.intr.size()

        # -- pass 1: full-image render, no gradients (style.py:177-179) --
        output = self.renderer.render(self.params, pose_dev, image_dev, training=True)
        # Retarget the compaction bucket to the style stage's own marching
        # (--max-steps 512 doubles dt vs recon, ~2-4x fewer samples/ray).
        # The int() is a BLOCKING device fetch, so retunes stop permanently
        # once two consecutive ones leave the buckets unchanged — the style
        # stage only ever shrinks demand (the color grid moves, density is
        # frozen), so a stabilized bucket stays stable.
        if self.iter_ctr % 8 == 0 and self._retunes_active:
            before = (self.renderer._budget_bucket, self.renderer._window_bucket)
            self.renderer.retune_bucket_now(
                int(output["num_points"]), w * h, output.get("num_cand")
            )
            after = (self.renderer._budget_bucket, self.renderer._window_bucket)
            self._stable_retunes = 0 if after != before else self._stable_retunes + 1
            if after != before:
                # The per-window bucket cap derives from the frame bucket
                # (_win_cap); regroup windows under the new cap.
                self._win_group_cache.clear()
            if self._stable_retunes >= 2:
                self._retunes_active = False
                self.logger.info(
                    "Style buckets stable at %s; no further retune fetches", after
                )
        rgb_map = output["rgb_map"]  # [HW, 3]
        target = output["target"]  # [HW, 4]
        target_chw = target[:, :3].T.reshape(3, h, w)
        preds = jnp.argmax(output["classes"], axis=1).reshape(h, w)

        # First call computes the Hungarian matching on host (loss.py:169-184).
        if self.style_loss.use_matching and self.style_loss.matching is None:
            feats = self.fx(rgb_map.T.reshape(3, h, w))[self.style_loss.keys[0]][0]
            self.style_loss.update_matching(feats, preds)
            self.logger.info("Style matching: %s", list(map(int, self.style_loss.matching)))

        # -- d(loss)/d(pixels) (style.py:182-187) --
        (total, scalars), pixel_grad = jax.value_and_grad(
            self._image_losses, has_aux=True
        )(rgb_map, target_chw, preds)

        # -- pass 2: patch VJPs in per-budget-bucket jitted scans
        # (style.py:189-198) --
        trainable, frozen = self._split_params()
        grads = self._pass2_grads(
            pose_idx, trainable, frozen, self.renderer.occ_field, pose_dev,
            pixel_grad,
        )

        # -- optimizer step over the full param tree (masked to color grid) --
        full_grads = {
            **grads,
            **jax.tree_util.tree_map(jnp.zeros_like, frozen),
        }
        updates, self.opt_state = self.optim.update(full_grads, self.opt_state, self.params)
        import optax

        self.params = optax.apply_updates(self.params, updates)
        # EMA intentionally NOT updated in the style stage (style.py:205).

        self.iter_ctr += 1
        self.time1 = time.time()

        losses_lv = self._to_loss_values(scalars)
        if self._check_interval(self.train_cfg.intervals.print):
            self.print_status(losses_lv)
        if self._check_interval(self.train_cfg.intervals.test):
            self.test_networks()
        if self._check_interval(self.train_cfg.intervals.log):
            self.log_status(losses_lv)
        if self._check_interval(self.train_cfg.intervals.ckpt, final=True):
            self.save_ckpt()

    # ------------------------------------------------------------------
    # evaluation (style.py:119-160): stylized renders + GIF collage
    # ------------------------------------------------------------------

    def test_networks(self):
        image_dir = self.log_dir / "epoch_{:0{w}d}".format(
            self.iter_ctr, w=len(str(self.train_cfg.num_iterations))
        )
        image_dir.mkdir(exist_ok=True)

        h, w = self.test_set.intr.h, self.test_set.intr.w
        style_np = np.asarray(self.style_image)
        frames = []
        for i in range(len(self.test_set)):
            _, pose = self.test_set[i]
            frame_id = self.test_set.fns[i]
            output = self.renderer.render(self.params, jnp.asarray(pose), None, training=False)
            rgb_chw = np.asarray(output["rgb_map"]).T.reshape(3, h, w)
            collage = utils.collage_h(rgb_chw, style_np)
            frames.append(
                (np.clip(np.moveaxis(collage, 0, -1), 0, 1) * 255).astype(np.uint8)
            )
            utils.save_image(rgb_chw, image_dir / f"{frame_id}.png")

        utils.save_gif(frames, image_dir / "video.gif", fps=3.75)
        return {}
