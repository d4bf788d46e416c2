"""Reconstruction-stage trainer.

Rebuild of the reference ``Trainer`` (``/root/reference/trainers/base.py:25-455``)
around a fully-jitted TPU train step.

TPU-first design — one fused device program per iteration:

  * The ENTIRE training dataset (images + seg channel + poses) is uploaded to
    device once at startup; each step samples the frame and the 4096 pixels
    on-device with the JAX PRNG.  Steady-state host<->device traffic is zero —
    the reference uploads a 3 MB image every iteration and crosses into numpy
    for pixel sampling (trainers/base.py:401-402, nerf_lib.py:118,134).
  * Ray generation, occupancy-guided marching, the field MLPs, compositing,
    all losses, the backward pass, the Adam update, and the EMA update are one
    jitted function of the train-state pytree.
  * Mixed precision is bf16 compute (enable_amp); there is no loss-SCALING
    machinery because bf16 shares fp32's exponent range, and the GradScaler's
    skip-on-nonfinite behavior is kept via optax.apply_if_finite — together
    replacing the reference's fp16 AMP + GradScaler (trainers/base.py:420-425).
  * The occupancy-grid refresh every ``update_iter`` steps is its own jitted
    function (full sweep before ``update_thres``, random resample after),
    mirroring renderer.py:139-194.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import (
    BaseConfig,
    DatasetConfig,
    NetworkConfig,
    RendererConfig,
    TrainConfig,
)
from ..core.cameras import camera_dir_grid
from ..core.types import DatasetSplit, LossValue, make_rays
from ..data import get_dataset
from ..losses.recon import (
    cross_entropy_ignore,
    mse_loss,
    sparsity_loss,
    weight_reg_loss,
)
from ..models.fields import (
    field_density, field_init, make_grid_spec, style_field_spec, with_dedup,
)
from ..parallel.mesh import (
    build_sharded_loss_terms,
    make_mesh,
)
from ..ops.occupancy import occupancy_persistable, occupancy_restore
from ..render.renderer import (
    Renderer,
    RenderSettings,
    _debounced_jump,
    bucket_for,
    render_rays,
)
from ..training import checkpoint as ckpt_lib
from ..training.ema import EmaState, ema_init, ema_params, ema_update
from .. import utils


class ScalarLogger:
    """Scalar metric sink: JSONL always; TensorBoard if available.

    Replaces the reference's SummaryWriter-only logging
    (trainers/base.py:122-124, 328-342)."""

    def __init__(self, log_dir: Path):
        self.path = Path(log_dir) / "scalars.jsonl"
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir=str(log_dir))
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        import json

        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)


class Trainer:
    SAVE_KEYS = ["version", "log_dir", "iter_ctr", "cfg", "dataset_cfg",
                 "train_cfg", "net_cfg", "render_cfg"]
    OPTIM_KEYS = ["x_density_embedder", "x_color_embedder", "net"]

    def __init__(
        self,
        cfg: BaseConfig,
        nargs: List[str],
        load_model_only: bool = False,
        assume_yes: Optional[bool] = None,
    ):
        # CLI runs take the confirmation policy from --yes; programmatic
        # callers may override explicitly.
        if assume_yes is None:
            assume_yes = bool(getattr(cfg, "yes", False))
        self.logger = utils.create_logger(type(self).__name__)
        self.iter_ctr = 0
        self.time0 = 0.0
        self.time1 = 0.0
        self.version = utils.get_git_sha()
        self.cfg = cfg
        self.clock = utils.Clock()

        # -- checkpoint preload (trainers/base.py:53-68) --
        ckpt_meta, ckpt_groups = None, None
        if cfg.ckpt is not None:
            ckpt_meta, ckpt_groups = ckpt_lib.load_checkpoint(cfg.ckpt)
            if not load_model_only:
                self.iter_ctr = int(ckpt_meta["iter_ctr"])
                if ckpt_meta.get("version") != self.version:
                    self.logger.warning(
                        'Checkpoint version "%s" differs from current repo '
                        'version "%s".',
                        str(ckpt_meta.get("version"))[:7], self.version[:7],
                    )

        # -- log dir (trainers/base.py:70-92, 172-183) --
        self.log_dir: Optional[Path] = None
        if ckpt_meta is None or load_model_only:
            if cfg.log_dir is None:
                self.logger.error("Log directory must be provided if training from scratch")
            self._init_new_log_dir(cfg.log_dir, assume_yes)
        else:
            if cfg.log_dir is None or str(cfg.log_dir) == ckpt_meta["log_dir"]:
                self.log_dir = Path(ckpt_meta["log_dir"])
                if not self.log_dir.exists():
                    self.logger.error(
                        'Checkpoint log directory "%s" does not exist.', self.log_dir
                    )
            else:
                self._init_new_log_dir(cfg.log_dir, assume_yes)

        # -- config chain (trainers/base.py:94-111) --
        if cfg.data_cfg is None:
            if ckpt_meta is None:
                self.logger.error("Data config must be provided if training from scratch")
            cfg.data_cfg = Path(ckpt_meta["cfg"]["data_cfg"])
        self.dataset_cfg, nargs = DatasetConfig.load_nargs(cfg.data_cfg, nargs=nargs)

        train_cfg_path = Path("cfgs/training/style.yaml") if cfg.style_image is not None else None
        render_cfg_path = Path(f"cfgs/renderer/{self.dataset_cfg.type.lower()}.yaml")
        if not render_cfg_path.exists():
            render_cfg_path = None

        self.train_cfg, nargs = TrainConfig.load_nargs(train_cfg_path, nargs=nargs)
        self.net_cfg, nargs = NetworkConfig.load_nargs(nargs=nargs)
        self.render_cfg, nargs = RendererConfig.load_nargs(render_cfg_path, nargs=nargs)
        if len(nargs) > 0:
            self.logger.error("Unrecognized arguments: " + " ".join(nargs))

        # -- PRNG discipline (replaces np/torch/cuda seeding, base.py:115-117) --
        self.root_key = jax.random.PRNGKey(self.train_cfg.rng_seed)
        self._data_key, self._occ_key, self.root_key = jax.random.split(self.root_key, 3)

        self.writer = None
        if self.train_cfg.intervals.log > 0:
            self.writer = ScalarLogger(self.log_dir)

        # -- datasets (base.py:126-135) --
        self.train_set = get_dataset(self.dataset_cfg, split=DatasetSplit.TRAIN)
        self.logger.info("Loaded %s", str(self.train_set))
        self.test_set = get_dataset(
            self.dataset_cfg, split=DatasetSplit.TEST, max_count=self.train_cfg.max_eval_count
        )
        self.logger.info("Loaded %s", str(self.test_set))

        self.class_cmap = utils.tab10_colormap(max(self.train_set.num_classes, 1))

        # -- model + renderer (base.py:146-158) --
        max_bound = float(np.max(np.asarray(self.train_set.bbox.size)))
        grid_spec = make_grid_spec(
            n_lvls=self.net_cfg.pos_enc.n_lvls,
            n_feats_per_lvl=self.net_cfg.pos_enc.n_feats_per_lvl,
            hashmap_size=self.net_cfg.pos_enc.hashmap_size,
            min_res=self.net_cfg.pos_enc.min_res,
            max_res_coeff=self.net_cfg.pos_enc.max_res_coeff,
            max_bound=max_bound,
            simplex_from=self.net_cfg.pos_enc.simplex_from,
        )
        self.field_spec = style_field_spec(
            grid_spec,
            class_dim=self.train_set.num_classes,
            use_dir=False,  # base.py:149-151 constructs with use_dir=False
            sh_degree=self.net_cfg.dir_enc_sh_deg,
            density_hidden_dims=self.net_cfg.density_hidden_dims,
            density_hidden_layers=self.net_cfg.density_hidden_layers,
            rgb_hidden_dims=self.net_cfg.rgb_hidden_dims,
            rgb_hidden_layers=self.net_cfg.rgb_hidden_layers,
            density_offset=self.net_cfg.density_offset,
        )
        # Ray-coherent corner dedup (ops/hashgrid.py): bitwise-identical
        # encodes, ~2x fewer gathered table rows on marched sample streams.
        self.field_spec = with_dedup(
            self.field_spec,
            self.render_cfg.max_steps,
            np.asarray(self.train_set.bbox.size),
        )
        net_key = jax.random.PRNGKey(
            self.net_cfg.network_seed if self.net_cfg.network_seed is not None
            else self.train_cfg.rng_seed
        )
        self.params = field_init(net_key, self.field_spec)
        self.compute_dtype = jnp.bfloat16 if self.train_cfg.enable_amp else jnp.float32

        self.settings = RenderSettings(
            grid_size=self.render_cfg.grid_size,
            update_iter=self.render_cfg.update_iter,
            min_near=self.render_cfg.min_near,
            t_thresh=self.render_cfg.t_thresh,
            use_ndc=self.render_cfg.use_ndc,
            flip_camera=self.render_cfg.flip_camera,
            max_steps=self.render_cfg.max_steps,
            update_thres=self.render_cfg.update_thres,
            density_scale=self.render_cfg.density_scale,
            density_thresh=self.render_cfg.density_thresh,
            density_decay=self.render_cfg.density_decay,
            grid_bsize=self.render_cfg.grid_bsize,
            max_samples_per_ray=self.render_cfg.max_samples_per_ray,
            max_budget_samples=self.render_cfg.max_budget_samples,
            window_init_bucket=self.render_cfg.window_init_bucket,
        )
        self.renderer = Renderer(
            self.field_spec,
            self.train_set.bbox,
            self.settings,
            self.train_set.intr,
            float(self.dataset_cfg.bound),
            raymarch_channels=3 + self.train_set.num_classes,
            precrop_frac=self.train_cfg.precrop_fraction,
            compute_dtype=self.compute_dtype,
        )

        # -- device mesh (DP over rays; SURVEY.md section 2.3) --
        # The reference is hardcoded single-GPU; here every device in the
        # slice shards the ray batch, params replicate, and jax.grad's psum
        # is the only collective.  Single-device runs skip shard_map.
        self.mesh = None
        n_dev = jax.device_count()
        if n_dev > 1:
            if self.train_cfg.num_rays_per_batch % n_dev == 0:
                self.mesh = make_mesh()
                self.renderer.mesh = self.mesh
                self.logger.info(
                    "Data-parallel over %d devices (rays sharded, params "
                    "replicated)", n_dev,
                )
            else:
                self.logger.warning(
                    "num_rays_per_batch (%d) does not divide %d devices; "
                    "running single-device",
                    self.train_cfg.num_rays_per_batch, n_dev,
                )

        # -- optimizer + EMA (base.py:185-229) --
        self._reset_optim(self.OPTIM_KEYS)
        self.ema_state: EmaState = ema_init(self.params)

        # -- checkpoint restore (base.py:162-168) --
        if ckpt_groups is not None:
            self._restore(ckpt_meta, ckpt_groups, load_model_only)
            self.logger.info('Loaded checkpoint "%s"', cfg.ckpt)
        else:
            self.logger.info("Initialized new %s from scratch", type(self).__name__)

        # -- device-resident dataset (TPU-first; see module docstring) --
        self._stage_train_data()
        self._train_step_cache: Dict = {}

        # -- adaptive ray batching (fixed sample budget; config.py) --
        # Ray-count ladder: powers of two so mesh shards stay even and the
        # compile count is bounded.  Demand estimates come from the same
        # mean_count EMA the bucket ladder uses, synced at occupancy updates.
        self.rays_trained = 0
        tc = self.train_cfg
        self._adaptive_budget = 0
        if tc.adaptive_batch:
            self._adaptive_budget = (
                tc.adaptive_batch_budget or self.settings.max_budget_samples
            )
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            if self._adaptive_budget % n_dev:
                raise ValueError(
                    f"adaptive_batch budget {self._adaptive_budget} must "
                    f"divide the {n_dev}-device mesh"
                )
            # Power-of-two rungs, each rounded UP to a mesh multiple so
            # local_plan's even-shard requirement holds at every rung (a
            # non-power-of-two mesh, e.g. 12 devices, would otherwise fail
            # mid-training on the first ladder move).
            ladder, v, seen = [], 256, set()
            while v <= max(256, tc.adaptive_batch_max_rays):
                rung = -(-v // n_dev) * n_dev
                if rung not in seen:
                    ladder.append(rung)
                    seen.add(rung)
                v *= 2
            self._ray_ladder = tuple(ladder)
            self._adaptive_rays = min(
                max(self._ray_ladder[0], tc.num_rays_per_batch),
                self._ray_ladder[-1],
            )
            self._ray_grow_streak = 0
            self._ray_grow_cand = 0
            # The renderer's budget bucket becomes a demand summary only.
            self.renderer.autotune_budget = False

        # -- two-phase training (config.py two_phase_train) --
        # Kept-prefix capacity ladder (samples/ray).  None = "equal to the
        # march budget" (no truncation possible: kept <= marched); the first
        # demand fetch at an occupancy sync retunes it downward.
        self._sig_bucket_train: Optional[int] = None
        if tc.two_phase_train and tc.two_phase_init_bucket > 0:
            # Pre-seeded kept capacity: the first compile is already the
            # two-phase shape (config.py two_phase_init_bucket).
            self._sig_bucket_train = bucket_for(
                float(tc.two_phase_init_bucket), self.settings.max_samples_per_ray
            )
        self._sig_train_debounce: Dict = {}
        self._last_num_sig = None  # device scalar from the latest step
        self._last_sig_rays = 0  # ray count that step actually ran at
        # Host-side RNG for frame selection: keeps the hot loop free of
        # blocking device->host fetches (a per-iter int() fetch costs a full
        # tunnel round trip).
        self._frame_rng = np.random.default_rng(self.train_cfg.rng_seed ^ 0x5EED)

        # Settled adaptive shapes from the checkpoint (saved as
        # "trainer_static"): a full resume starts at the ray count and
        # two-phase kept-prefix bucket the run had settled on, so the FIRST
        # compiled step is the steady-state shape — no retune churn (each
        # ladder move is a multi-minute XLA compile on the remote helper).
        ts = getattr(self, "_restored_trainer_static", None) or {}
        ar = ts.get("adaptive_rays")
        if ar and tc.adaptive_batch:
            cand = self._ray_ladder[0]
            for v in self._ray_ladder:
                if v <= int(ar):
                    cand = v
            self._adaptive_rays = cand
        sb = ts.get("sig_bucket_train")
        if sb and tc.two_phase_train:
            self._sig_bucket_train = int(sb)

    # ------------------------------------------------------------------
    # setup helpers
    # ------------------------------------------------------------------

    def _init_new_log_dir(self, log_dir, assume_yes: bool):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        if next(self.log_dir.iterdir(), None) is not None:
            if utils.prompt_bool("Log directory not empty. Clean directory?", assume_yes):
                utils.rmtree(self.log_dir)
                self.log_dir.mkdir()
            else:
                import sys

                sys.exit(1)

    def _optim_mask(self, keywords: Optional[List[str]]):
        """Per-top-level-key trainability mask (keyword substring match, exactly
        the reference's param filtering, base.py:188-199)."""

        def flag(name):
            return keywords is None or any(kw in name for kw in keywords)

        return {
            k: jax.tree_util.tree_map(lambda _: flag(k), v)
            for k, v in self.params.items()
        }

    def _lr_schedule(self):
        lr0 = self.train_cfg.initial_learning_rate
        decay = self.train_cfg.learning_rate_decay
        if decay > 0:
            # 0.1 ** (iter / decay) (base.py:223-225)
            return optax.exponential_decay(lr0, transition_steps=decay, decay_rate=0.1)
        return lr0

    def _reset_optim(self, keywords: Optional[List[str]]):
        mask = self._optim_mask(keywords)
        n_trainable = sum(
            int(np.prod(leaf.shape))
            for leaf, flag in zip(
                jax.tree_util.tree_leaves(self.params), jax.tree_util.tree_leaves(mask)
            )
            if flag
        )
        self.logger.info(
            "Optimizing %d parameters from components %s", n_trainable, keywords
        )
        # apply_if_finite = the reference's GradScaler skip-on-inf semantics
        # (trainers/base.py:420-425): a batch with non-finite grads (e.g. a
        # transient exp overflow in the unclamped density activation) leaves
        # params/optimizer untouched instead of poisoning them.
        self.optim = optax.apply_if_finite(
            optax.masked(
                optax.adam(self._lr_schedule(), b1=0.9, b2=0.999, eps=1e-15),
                mask,
            ),
            max_consecutive_errors=1000,
        )
        self.opt_state = self.optim.init(self.params)

    def _stage_train_data(self):
        """Upload the full training set to device memory once."""
        imgs = []
        for i in range(len(self.train_set)):
            img, _pose = self.train_set[i]
            imgs.append(img)
        self._images_dev = jnp.asarray(np.stack(imgs))  # [F, C(+1), H, W]
        self._poses_dev = jnp.asarray(self.train_set.poses)

    # ------------------------------------------------------------------
    # jitted train step
    # ------------------------------------------------------------------

    def _build_train_step(self, plan, precrop: float, sig_budget=None):
        """Compile a train step for a given march plan + precrop window.

        ``sig_budget`` (total kept-sample capacity) selects the exact
        two-phase evaluation — density-only keep mask over the marched
        stream, full differentiable field on the kept prefix only
        (render/pipeline.py)."""
        spec = self.field_spec
        settings = self.settings
        bbox = self.train_set.bbox
        tc = self.train_cfg
        num_rays = plan.num_rays
        cam_dirs_np, ys_np, xs_np = camera_dir_grid(
            self.train_set.intr, settings.flip_camera, precrop
        )
        gh, gw = cam_dirs_np.shape[:2]
        cam_dirs = jnp.asarray(cam_dirs_np.reshape(-1, 3))
        pix_y = jnp.asarray(ys_np)
        pix_x = jnp.asarray(xs_np)
        optim = self.optim
        ema_decay = tc.ema_decay
        dtype = self.compute_dtype
        has_seg = spec.class_dim > 0 and self._images_dev.shape[1] == 4

        # Mesh path: per-ray loss SUMS shard over devices; psum makes every
        # device agree, jax.grad through the shard_map yields replicated
        # grads with one all-reduce (parallel/mesh.py).
        mesh = self.mesh
        n_dev = mesh.devices.size if mesh is not None else 1
        sharded_terms = None
        n_sparse = tc.sparsity_samples
        if mesh is not None and plan.budget % n_dev == 0:
            n_sparse = max(1, tc.sparsity_samples // n_dev) * n_dev

            def _density_fn(p, bb, pts):
                # sparsity samples are uniform-random: no run coherence
                return field_density(
                    spec, p, bb, pts, compute_dtype=dtype, use_dedup=False
                )

            sharded_terms = build_sharded_loss_terms(
                mesh, spec, plan, settings.t_thresh, settings.density_scale,
                dtype, with_class=has_seg,
                sparsity_exp_coeff=(
                    tc.sparsity_exp_coeff if tc.sparsity_lambda > 0.0 else 0.0
                ),
                field_density_fn=_density_fn,
                sig_budget=sig_budget,
            )

        def loss_fn(params, bitfield, image, pose, key):
            k_pix, k_sparse = jax.random.split(key)
            # On-device pixel subsampling.  WITH replacement (randint) instead
            # of the reference's without-replacement choice (nerf_lib.py:134):
            # choice(replace=False) is a full [gh*gw] permutation sort in the
            # hot loop, and at ~2% sampling the distributions are
            # indistinguishable for SGD.
            idx = jax.random.randint(k_pix, (num_rays,), 0, gh * gw)
            gy, gx = idx // gw, idx % gw
            dirs_cam = cam_dirs[idx]
            rays_d = dirs_cam @ pose[:3, :3].T
            rays = make_rays(pose[:3, 3], rays_d)
            target = image[:, pix_y[gy], pix_x[gx]].T  # [K, C(+1)]

            losses = {}
            if sharded_terms is not None:
                if tc.sparsity_lambda > 0.0:
                    pts = jax.random.uniform(k_sparse, (n_sparse, 3))
                    pts = pts * bbox.size + bbox.min_pt
                else:
                    pts = jnp.zeros((n_dev, 3), jnp.float32)
                terms = sharded_terms(
                    params, bitfield, bbox, rays.origins, rays.dirs, target, pts
                )
                num_points = terms["num_points"]
                num_cand = terms["num_cand"]
                num_sig = terms["num_sig"]
                mse = terms["sq"] / (3.0 * num_rays)
                losses["mse"] = mse
                losses["psnr"] = utils.compute_psnr(mse)
                total = mse
                if has_seg:
                    class_l = (
                        terms["nll"] / jnp.maximum(terms["n_lab"], 1)
                    ) * tc.class_lambda
                    losses["class"] = class_l
                    total = total + class_l
                if tc.sparsity_lambda > 0.0:
                    sp = terms["sp"] / n_sparse * tc.sparsity_lambda
                    losses["sparsity"] = sp
                    total = total + sp
            else:
                out = render_rays(
                    spec, plan, params, bitfield, bbox, rays,
                    settings.t_thresh, settings.density_scale, dtype,
                    sig_budget=sig_budget,
                )
                num_points = out["num_points"]
                num_cand = out["num_cand"]
                num_sig = out["num_sig"]
                mse = mse_loss(out["rgb_map"], target[:, :3])
                losses["mse"] = mse
                losses["psnr"] = utils.compute_psnr(mse)
                total = mse

                if spec.class_dim > 0 and target.shape[1] == 4:
                    labels = target[:, 3].astype(jnp.int32)
                    class_l = cross_entropy_ignore(out["classes"], labels) * tc.class_lambda
                    losses["class"] = class_l
                    total = total + class_l

                if tc.sparsity_lambda > 0.0:
                    pts = jax.random.uniform(k_sparse, (tc.sparsity_samples, 3))
                    pts = pts * bbox.size + bbox.min_pt
                    sig = field_density(
                        spec, params, bbox, pts, compute_dtype=dtype,
                        use_dedup=False,
                    )
                    sp = sparsity_loss(sig, tc.sparsity_exp_coeff) * tc.sparsity_lambda
                    losses["sparsity"] = sp
                    total = total + sp

            if tc.weight_reg_lambda > 0.0:
                wr = weight_reg_loss(params) * tc.weight_reg_lambda
                losses["weight_reg"] = wr
                total = total + wr

            losses["total"] = total
            return total, (losses, num_points, num_cand, num_sig)

        @jax.jit
        def step(params, opt_state, ema_state, bitfield, image, pose, key):
            (_, (losses, num_points, num_cand, num_sig)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    params, bitfield, image, pose, key
                )
            )
            updates, opt_state = optim.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_state = ema_update(ema_state, params, ema_decay)
            return (
                params, opt_state, ema_state, losses,
                num_points, num_cand, num_sig,
            )

        return step

    def _get_train_step(self):
        precrop = (
            self.renderer.precrop_frac
            if self.iter_ctr < self.train_cfg.precrop_iterations
            else 1.0
        )
        if self.train_cfg.adaptive_batch:
            plan = self.renderer.make_plan(
                self._adaptive_rays, budget=self._adaptive_budget
            )
        else:
            plan = self.renderer.make_plan(self.train_cfg.num_rays_per_batch)
        # Two-phase kept capacity: None (single-phase) until the first demand
        # fetch — the single-phase step already reports exact num_sig, so the
        # first retune jumps straight to the right bucket with no
        # full-capacity two-phase compile in between.
        sig_budget = None
        if self.train_cfg.two_phase_train and self._sig_bucket_train is not None:
            sig_budget = plan.num_rays * self._sig_bucket_train
            if sig_budget >= plan.budget:
                # No savings at this capacity: phase B would cover the whole
                # march budget, so two-phase is pure phase-A overhead.  Stay
                # single-phase (which still reports exact num_sig) until
                # saturation actually drops the kept prefix below the budget.
                sig_budget = None
        # window_budget MUST key the cache: a stale compiled step would keep
        # marching with an outgrown window capacity — the silent-starvation
        # loop the window-bucket tuning exists to prevent.  num_rays keys it
        # too: under adaptive_batch the budget is constant while the ray
        # count moves.  sig_budget keys the two-phase kept capacity.
        cache_key = (
            plan.num_rays, plan.budget, plan.window_budget, precrop, sig_budget
        )
        if cache_key not in self._train_step_cache:
            self._train_step_cache[cache_key] = self._build_train_step(
                plan, precrop, sig_budget
            )
        return self._train_step_cache[cache_key]

    def _retune_adaptive_rays(self) -> None:
        """Fit the ray count to the fixed sample budget (adaptive_batch).

        Policy mirrors the bucket ladder's (_debounced_jump), with the
        directions swapped: demand RISING means too many rays would overflow
        the budget and truncate, so SHRINK immediately; demand falling means
        idle budget, so GROW only after two consecutive retunes want the SAME
        ladder value (each ladder value is a separate XLA compile of the
        train step — on the remote compile helper the flagship step costs
        tens of minutes per shape, so during the monotone demand decay of
        occupancy pruning the controller must NOT walk every octave: requiring
        the wanted value itself to repeat collapses the transient into one
        jump to the settled count).
        """
        r = self.renderer
        if r._mean_count_host <= 0:
            return
        demand = r._mean_count_host / max(1, r._last_num_rays)
        want = int(self._adaptive_budget / (1.25 * max(demand, 1.0)))
        cand = self._ray_ladder[0]
        for v in self._ray_ladder:
            if v <= want:
                cand = v
        cur = self._adaptive_rays
        new = cur
        if cand < cur:
            new = cand
            self._ray_grow_streak = 0
        elif cand > cur:
            # Streak counts consecutive retunes wanting THIS cand; a still-
            # moving demand estimate resets it, so mid-decay octaves are
            # never compiled.
            if cand == self._ray_grow_cand:
                self._ray_grow_streak += 1
            else:
                self._ray_grow_cand = cand
                self._ray_grow_streak = 1
            if self._ray_grow_streak >= 2:
                new = cand
                self._ray_grow_streak = 0
        else:
            self._ray_grow_streak = 0
        if (
            new == self._ray_ladder[0]
            and demand * 1.25 * new > self._adaptive_budget
            and r._local_step_host > r.settings.update_thres
        ):
            # The controller can shrink no further: demand at the ladder
            # minimum overflows the fixed budget, so march_rays is silently
            # truncating samples every step — the fog-runaway regime the
            # autotune path warns about (renderer._retune_bucket).  Surface
            # it here too; the fix is a larger adaptive_batch_budget (or a
            # scene regime whose demand fits).
            import warnings

            warnings.warn(
                f"adaptive_batch pinned at the {new}-ray ladder minimum with "
                f"steady-state demand {demand:.0f} samples/ray "
                f"({demand * 1.25 * new:.0f} > budget {self._adaptive_budget})"
                "; training is truncating — raise adaptive_batch_budget",
                stacklevel=2,
            )
        if new != cur:
            # mean_count is an EMA of per-BATCH compacted counts; rescale it
            # to the new batch size so per-ray demand estimates stay
            # consistent across the move.
            scale = new / cur
            r.occ_state = r.occ_state._replace(
                mean_count=(
                    r.occ_state.mean_count.astype(jnp.float32) * scale
                ).astype(jnp.int32)
            )
            r._mean_count_host = int(r._mean_count_host * scale)
            r._last_num_rays = new
            self._adaptive_rays = new
            self.logger.info(
                "Adaptive batch: %d -> %d rays (demand %.1f samples/ray, "
                "budget %d)", cur, new, demand, self._adaptive_budget,
            )

    def _retune_sig_bucket(self) -> None:
        """Fit the two-phase kept-prefix capacity to observed demand.

        Same policy as the march-budget ladder (_debounced_jump: grow
        immediately — a binding capacity truncates the most-saturated tail
        samples — shrink after two consecutive below-current retunes).  The
        demand counter is exact (pipeline.eval_composite's num_sig), fetched
        here alongside the occupancy sync so the hot loop stays fetch-free.
        """
        if self._last_num_sig is None:
            return
        # Divide by the ray count the measured step ACTUALLY ran at — an
        # adaptive-batch retune immediately before this call may already have
        # moved the CURRENT ray count (measured: a 4096->1024 move inflated
        # the per-ray estimate 4x and pinned the bucket at the ladder max).
        num_rays = max(1, self._last_sig_rays)
        num_sig = int(jax.device_get(self._last_num_sig))
        want = bucket_for(
            num_sig * 1.25 / num_rays, self.settings.max_samples_per_ray
        )
        cur = self._sig_bucket_train
        if cur is None:
            self._sig_bucket_train = want
            self.logger.info(
                "Two-phase train: kept-prefix bucket %d/ray "
                "(%.1f significant samples/ray)", want, num_sig / num_rays,
            )
            return
        new = _debounced_jump(cur, want, self._sig_train_debounce)
        if new != cur:
            self._sig_bucket_train = new

    # ------------------------------------------------------------------
    # loop (base.py:396-449)
    # ------------------------------------------------------------------

    def run_iter(self):
        self.time0 = time.time()
        self._occ_key, k_occ = jax.random.split(self._occ_key)
        if self.renderer.maybe_update_state(self.params, k_occ):
            # mean_count was just host-synced; retarget the ray count while
            # the estimate is fresh (no extra device fetch).
            if self.train_cfg.adaptive_batch:
                self._retune_adaptive_rays()
            if self.train_cfg.two_phase_train:
                self._retune_sig_bucket()

        self._data_key, k_step = jax.random.split(self._data_key)
        frame = int(self._frame_rng.integers(0, len(self.train_set)))

        step_fn = self._get_train_step()
        (
            self.params,
            self.opt_state,
            self.ema_state,
            losses,
            num_points,
            num_cand,
            num_sig,
        ) = step_fn(
            self.params,
            self.opt_state,
            self.ema_state,
            # Two-stage skip-distance marching (ops/marching.py
            # _march_two_stage): coarse candidate windows then exact
            # occupancy — ~4x fewer random accesses than the dense [N, T]
            # sweep at train batch sizes (measured round 2).
            self.renderer.occ_field,
            self._images_dev[frame],
            self._poses_dev[frame],
            k_step,
        )
        batch_rays = (
            self._adaptive_rays
            if self.train_cfg.adaptive_batch
            else self.train_cfg.num_rays_per_batch
        )
        self.renderer.note_batch_points(num_points, batch_rays, num_cand)
        self._last_num_sig = num_sig  # device scalar; fetched at retune
        self._last_sig_rays = batch_rays  # the count num_sig was measured at
        self.rays_trained += batch_rays

        self.iter_ctr += 1
        self.time1 = time.time()
        # Device scalars, zero sync cost; probes/tools fetch at their own
        # cadence (the hot loop must stay fetch-free).
        self.last_losses = losses

        losses_lv = self._to_loss_values(losses)
        if self._check_interval(self.train_cfg.intervals.print):
            self.print_status(losses_lv)
        if self._check_interval(self.train_cfg.intervals.test):
            self.test_networks()
        if self._check_interval(self.train_cfg.intervals.log):
            self.log_status(losses_lv)
        if self._check_interval(self.train_cfg.intervals.ckpt, final=True):
            self.save_ckpt()

    def run(self):
        if self.train_cfg.test_before_train:
            self.test_networks()
        # jax.profiler trace window (SURVEY.md section 5: the TPU replacement
        # for the reference's iter_time-only observability).
        pdir = self.train_cfg.profile_dir
        p0 = self.train_cfg.profile_start
        p1 = p0 + self.train_cfg.profile_steps
        tracing = False
        try:
            while self.iter_ctr < self.train_cfg.num_iterations:
                if pdir is not None and not tracing and self.iter_ctr == p0:
                    jax.profiler.start_trace(str(pdir))
                    tracing = True
                self.run_iter()
                if tracing and self.iter_ctr >= p1:
                    jax.block_until_ready(self.params)
                    jax.profiler.stop_trace()
                    tracing = False
                    self.logger.info("Wrote profiler trace to %s", pdir)
        finally:
            if tracing:
                jax.profiler.stop_trace()

    def close(self):
        self.logger.info("Closed")

    # ------------------------------------------------------------------
    # reporting (base.py:306-342)
    # ------------------------------------------------------------------

    _PRINT_NAMES = {
        "mse": ("MSE", "mse_loss"),
        "psnr": ("PSNR", "psnr"),
        "class": ("Class", "class_loss"),
        "sparsity": ("Sparsity", "sparsity_loss"),
        "weight_reg": ("Weight Reg.", "weight_reg_loss"),
        "total": ("Total", "total_loss"),
        "content": ("Content", "content_loss"),
        "style": ("Style", "style_loss"),
        "photo": ("Photo", "photo_loss"),
    }

    def _to_loss_values(self, losses: Dict[str, jnp.ndarray]) -> Dict[str, LossValue]:
        out = {}
        for k, v in losses.items():
            pn, ln = self._PRINT_NAMES.get(k, (k, k))
            out[k] = LossValue(pn, ln, v)
        return out

    def print_status(self, losses: Dict[str, LossValue], phase: str = "TRAIN"):
        items = [f"{lv.print_name}: {float(lv.value):.5f}" for lv in losses.values()]
        self.logger.info("[%s] Iter: %d, %s", phase, self.iter_ctr, ", ".join(items))

    def log_status(self, losses: Dict[str, LossValue]):
        if self.writer is None:
            return
        for lv in losses.values():
            self.writer.add_scalar(f"train/{lv.log_name}", float(lv.value), self.iter_ctr)
        self.writer.add_scalar("misc/iter_time", self.time1 - self.time0, self.iter_ctr)

    def _check_interval(self, interval, after=0, final=False):
        if interval <= 0:
            return False
        is_final = (self.iter_ctr == self.train_cfg.num_iterations) and final
        return ((self.iter_ctr % interval == 0) or is_final) and (self.iter_ctr > after)

    # ------------------------------------------------------------------
    # evaluation (base.py:344-386)
    # ------------------------------------------------------------------

    def eval_params(self):
        return ema_params(self.ema_state, self.params, self.train_cfg.ema_decay is not None)

    def test_networks(self):
        img_dir = self.log_dir / "epoch_{:0{w}d}".format(
            self.iter_ctr, w=len(str(self.train_cfg.num_iterations))
        )
        img_dir.mkdir(exist_ok=True)

        params = self.eval_params()
        h, w = self.test_set.intr.h, self.test_set.intr.w
        mses = []
        for i in range(len(self.test_set)):
            img, pose = self.test_set[i]
            frame_id = self.test_set.fns[i]
            output = self.renderer.render(
                params, jnp.asarray(pose),
                jnp.asarray(img) if img is not None else None,
                training=False,
            )
            rgb = np.asarray(output["rgb_map"]).reshape(h, w, 3)
            utils.save_image(rgb, img_dir / f"{frame_id}.png")

            if self.train_set.num_classes > 0:
                preds = np.argmax(np.asarray(output["classes"]), axis=1).reshape(h, w)
                seg_rgb = self.class_cmap[preds]
                utils.save_image(seg_rgb, img_dir / f"{frame_id}_seg.png")

            if self.test_set.has_gt and output["target"] is not None:
                target = np.asarray(output["target"])[:, :3]
                mses.append(float(np.mean((np.asarray(output["rgb_map"]) - target) ** 2)))

        if mses:
            mse = float(np.mean(mses))
            psnr = -10.0 * np.log(mse) / np.log(10.0)
            self.logger.info(
                "[TEST] Iter: %d, MSE: %.5f, PSNR: %.5f", self.iter_ctr, mse, psnr
            )
            return {"mse": mse, "psnr": psnr}
        return {}

    # ------------------------------------------------------------------
    # checkpointing (base.py:231-249)
    # ------------------------------------------------------------------

    def save_ckpt(self):
        ckpt_fn = "iter_{:0{w}d}.ckpt".format(
            self.iter_ctr, w=len(str(self.train_cfg.num_iterations))
        )
        path = self.log_dir / ckpt_fn
        meta = {
            "version": self.version,
            "log_dir": str(self.log_dir),
            "iter_ctr": self.iter_ctr,
            "cfg": self.cfg.asdict(),
            "dataset_cfg": self.dataset_cfg.asdict(),
            "train_cfg": self.train_cfg.asdict(),
            "net_cfg": self.net_cfg.asdict(),
            "render_cfg": self.render_cfg.asdict(),
            "renderer_static": self.renderer.state_dict_static(),
            # Settled adaptive shapes (see __init__'s resume presize).
            "trainer_static": {
                "adaptive_rays": (
                    int(self._adaptive_rays)
                    if getattr(self, "_adaptive_rays", None)
                    else None
                ),
                "sig_bucket_train": self._sig_bucket_train,
            },
        }
        trees = {
            "params": self.params,
            "opt_state": self.opt_state,
            "ema": self.ema_state,
            "occ": occupancy_persistable(self.renderer.occ_state),
        }
        ckpt_lib.save_checkpoint(path, meta, trees)
        self.logger.info("Saved checkpoint at %s", path)

    def _restore(self, meta: Dict, groups: Dict, load_model_only: bool):
        # Stashed even under load_model_only: settled shapes are a property
        # of the scene's geometry, so a style stage (or a fresh run seeded
        # from this model) presizes its buckets from them instead of paying
        # the grow-ladder's multi-minute recompiles again.  Applied after
        # the adaptive-batch init (which runs later in __init__ and would
        # otherwise overwrite it) — see the presize block there.
        self._restored_trainer_static = meta.get("trainer_static")
        self.params = ckpt_lib.restore_tree(self.params, groups["params"])
        self.renderer.occ_state = occupancy_restore(
            ckpt_lib.restore_tree(
                occupancy_persistable(self.renderer.occ_state), groups["occ"]
            ),
            self.settings.grid_size,
        )
        self.renderer._mean_count_host = int(self.renderer.occ_state.mean_count)
        self.renderer._local_step_host = int(self.renderer.occ_state.local_step)
        # Host-side renderer tuning (compaction bucket) rides the meta dict so
        # the style stage and render CLI size their budgets from the recon run.
        if "renderer_static" in meta:
            self.renderer.load_state_dict_static(meta["renderer_static"])
        if not load_model_only:
            try:
                self.opt_state = ckpt_lib.restore_tree(
                    self.opt_state, groups["opt_state"]
                )
            except (ValueError, KeyError):
                # Optimizer-state schema changed (e.g. the apply_if_finite
                # wrapper added leaves), or the ckpt carries no optimizer
                # state at all (tools/import_reference_ckpt.py — torch Adam
                # moments are not convertible).  A fresh optimizer beats
                # aborting the resume: Adam moments rebuild within a few
                # hundred steps.
                self.logger.warning(
                    "Checkpoint optimizer state missing or mismatched; "
                    "resuming with a FRESH optimizer state."
                )
            self.ema_state = ckpt_lib.restore_tree(self.ema_state, groups["ema"])


def get_trainer(cfg: BaseConfig, nargs: List[str]) -> Trainer:
    """Trainer factory (reference trainers/__init__.py:10-35): style stage when
    a style image is supplied."""
    if cfg.style_image is None:
        return Trainer(cfg, nargs)
    from .style_trainer import StyleTrainer

    return StyleTrainer(cfg, nargs)
