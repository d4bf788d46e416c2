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
from itertools import product
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BaseConfig, ConfigValue
from ..core.cameras import generate_rays
from ..core.types import Box2D, LossValue
from ..data.style import SingleImage
from ..losses.recon import mse_loss
from ..losses.style import MattingLaplacian, get_style_loss
from ..models.vgg import VGG16FeatureExtractor
from ..render.renderer import render_rays
from ..training.trainer import Trainer
from .. import utils


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

        self._patch_vjp_cache: Dict = {}
        self._data_iter = self.train_set.iter_shuffled(seed=self.train_cfg.rng_seed)

    # ------------------------------------------------------------------
    # loss (style.py:74-117)
    # ------------------------------------------------------------------

    def _image_losses(self, rgb_map_flat, target_chw, preds):
        """Full-image losses as a pure function of the rendered pixels.

        rgb_map_flat: [HW, 3]; target_chw: [3, H, W]; preds: [H, W] labels.
        Returns (total, dict of scalars).
        """
        w, h = self.train_set.intr.size()
        rgb_chw = rgb_map_flat.T.reshape(3, h, w)

        rgb_feats = self.fx(rgb_chw)
        target_feats = self.fx(target_chw)

        content = mse_loss(rgb_feats[self.content_feat], target_feats[self.content_feat])
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

    def _patch_grad_fn(self, n_rays: int, budget: int):
        """Jitted: (trainable, frozen, bitfield, origins, dirs, pixel_grad) ->
        grads w.r.t. trainable params only."""
        key = (n_rays, budget)
        if key not in self._patch_vjp_cache:
            spec = self.field_spec
            settings = self.settings
            bbox = self.train_set.bbox
            plan = self.renderer.make_plan(n_rays, budget)
            dtype = self.compute_dtype

            def render_patch(trainable, frozen, bitfield, origins, dirs):
                params = {**trainable, **frozen}
                from ..core.types import RayBundle

                out = render_rays(
                    spec, plan, params, bitfield, bbox, RayBundle(origins, dirs),
                    settings.t_thresh, settings.density_scale, dtype,
                )
                return out["rgb_map"]

            @jax.jit
            def f(trainable, frozen, bitfield, origins, dirs, pixel_grad):
                _, vjp = jax.vjp(
                    lambda tr: render_patch(tr, frozen, bitfield, origins, dirs),
                    trainable,
                )
                return vjp(pixel_grad)[0]

            self._patch_vjp_cache[key] = f
        return self._patch_vjp_cache[key]

    # ------------------------------------------------------------------
    # iteration (style.py:162-219)
    # ------------------------------------------------------------------

    def run_iter(self):
        self.time0 = time.time()
        image, pose = next(self._data_iter)
        image_dev = jnp.asarray(image)
        pose_dev = jnp.asarray(pose)
        w, h = self.train_set.intr.size()

        # -- pass 1: full-image render, no gradients (style.py:177-179) --
        output = self.renderer.render(self.params, pose_dev, image_dev, training=True)
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
        grad_map = pixel_grad.reshape(h, w, 3)

        # -- pass 2: patch-wise VJP accumulation (style.py:189-198) --
        trainable, frozen = self._split_params()
        grads = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        ps = self.train_cfg.defer_patch_size
        for x, y in product(range(0, w, ps), range(0, h, ps)):
            patch = Box2D(x=x, y=y, w=min(ps, w - x), h=min(ps, h - y))
            rays, _ = generate_rays(
                pose_dev, self.train_set.intr, None, patch=patch,
                camera_flip=self.settings.flip_camera,
            )
            n = len(rays)
            budget = self.renderer.make_plan(n).budget
            patch_grad = grad_map[patch.hrange(), patch.wrange()].reshape(-1, 3)
            g = self._patch_grad_fn(n, budget)(
                trainable, frozen, self.renderer.occ_field,
                rays.origins, rays.dirs, patch_grad,
            )
            grads = jax.tree_util.tree_map(jnp.add, grads, g)

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
