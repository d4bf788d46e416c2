"""Style-stage end-to-end smoke: recon ckpt -> stylization -> render chain.

Covers the reference's two-stage workflow (SURVEY.md section 3.2): checkpoint
interop, color-only optimization, deferred backprop, semantic matching.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def recon_ckpt(tmp_path_factory):
    """Short reconstruction run that produces a checkpoint."""
    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.data.synthetic import generate_scene
    from nerfstyle_tpu.training.trainer import Trainer

    root = tmp_path_factory.mktemp("style_smoke")
    data_root = root / "scene"
    generate_scene(data_root, num_train=4, num_test=2, h=48, w=64)
    data_cfg = root / "data.yaml"
    data_cfg.write_text(f"root_path: {data_root}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n")

    log_dir = root / "recon_logs"
    cfg = BaseConfig(log_dir=log_dir, data_cfg=data_cfg)
    tiny = [
        "--num_iterations", "20",
        "--num_rays_per_batch", "128",
        "--pos_enc.n_lvls", "4",
        "--pos_enc.hashmap_size", "11",
        "--pos_enc.max_res_coeff", "8",
        "--grid_size", "16",
        "--max_steps", "64",
        "--max_samples_per_ray", "32",
        "--update_thres", "2",
        "--max_eval_count", "1",
        "--intervals.print", "0",
        "--intervals.log", "0",
        "--intervals.test", "0",
        "--intervals.ckpt", "0",
        "--enable_amp",
    ]
    trainer = Trainer(cfg, list(tiny))
    for _ in range(12):
        trainer.run_iter()
    trainer.save_ckpt()
    ckpt = sorted(log_dir.glob("*.ckpt"))[-1]
    recon_bucket = trainer.renderer._budget_bucket

    # Style assets: a gradient "painting" + 4 style clusters.
    from nerfstyle_tpu import utils

    h, w = 40, 56
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    style_img = np.stack([yy, xx, 1 - yy], axis=-1).astype(np.float32)
    style_path = root / "style.png"
    utils.save_image(style_img, style_path)

    seg = (yy > 0.5).astype(np.int64) * 2 + (xx > 0.5).astype(np.int64)  # 4 quadrants
    seg_path = root / "style_seg.npz"
    np.savez(seg_path, seg_map=seg)

    yield root, data_cfg, ckpt, style_path, seg_path, tiny, recon_bucket
    shutil.rmtree(root, ignore_errors=True)


class TestStyleStage:
    def test_style_trainer_runs_and_touches_only_color(self, recon_ckpt):
        root, data_cfg, ckpt, style_path, seg_path, tiny, recon_bucket = recon_ckpt
        from nerfstyle_tpu.config import BaseConfig
        from nerfstyle_tpu.training.style_trainer import StyleTrainer

        cfg = BaseConfig(
            log_dir=root / "style_logs", data_cfg=data_cfg,
            ckpt=ckpt, style_image=style_path,
        )
        nargs = list(tiny) + [
            "--style_seg_path", str(seg_path),
            "--defer_patch_size", "32",
            "--test_before_train",  # toggles default true -> false
        ]
        st = StyleTrainer(cfg, nargs)
        assert st.train_cfg.initial_learning_rate == 0.1  # style.yaml applied
        # The tuned compaction bucket must survive the recon -> style restore;
        # an unrestored bucket sits at the max and OOMs full-frame patch VJPs.
        assert st.renderer._budget_bucket == recon_bucket

        import jax.numpy as jnp

        density_before = np.asarray(st.params["x_density_embedder"]).copy()
        color_before = np.asarray(st.params["x_color_embedder"]).copy()

        st.run_iter()
        st.run_iter()

        density_after = np.asarray(st.params["x_density_embedder"])
        color_after = np.asarray(st.params["x_color_embedder"])
        np.testing.assert_array_equal(density_before, density_after)
        assert np.abs(color_after - color_before).max() > 0
        assert st.style_loss.matching is not None

    def test_pass2_scan_equals_whole_image_vjp(self, recon_ckpt):
        """The tiled-window scan (pass 2) must produce the same color-grid
        grads as ONE whole-image VJP: window ownership partitions the pixels,
        so sum-over-windows of sum(rgb*cot*own) == sum(rgb*cot)."""
        root, data_cfg, ckpt, style_path, seg_path, tiny, _ = recon_ckpt
        import jax
        import jax.numpy as jnp
        from nerfstyle_tpu.config import BaseConfig
        from nerfstyle_tpu.core.cameras import generate_rays
        from nerfstyle_tpu.render.renderer import render_rays
        from nerfstyle_tpu.training.style_trainer import StyleTrainer

        cfg = BaseConfig(
            log_dir=root / "pass2_logs", data_cfg=data_cfg,
            ckpt=ckpt, style_image=style_path,
        )
        nargs = list(tiny) + [
            "--style_seg_path", str(seg_path),
            "--defer_patch_size", "24",  # does NOT divide 64x48 -> shifted windows
            "--test_before_train",
            # Ample budgets: equivalence only holds when neither side's
            # compaction budget truncates (per-window and whole-image budgets
            # legitimately truncate different samples otherwise).
            "--max_samples_per_ray", "64",
        ]
        st = StyleTrainer(cfg, nargs)
        st.renderer._budget_bucket = 64  # == max_steps: no truncation possible
        trainable, frozen = st._split_params()
        _img, pose = st.train_set[0]
        pose_dev = jnp.asarray(pose)
        w, h = st.train_set.intr.size()
        cot = jax.random.normal(jax.random.PRNGKey(9), (h * w, 3))

        g_scan = st._pass2_grads(
            0, trainable, frozen, st.renderer.occ_field, pose_dev, cot
        )

        rays, _ = generate_rays(
            pose_dev, st.train_set.intr, None,
            camera_flip=st.settings.flip_camera,
        )
        plan = st.renderer.make_plan(h * w)

        def whole(tr):
            out = render_rays(
                st.field_spec, plan, {**tr, **frozen}, st.renderer.occ_field,
                st.train_set.bbox, rays, st.settings.t_thresh,
                st.settings.density_scale, st.compute_dtype,
            )
            return jnp.sum(out["rgb_map"] * cot)

        g_full = jax.grad(whole)(trainable)
        for k in g_scan:
            a, b = np.asarray(g_scan[k]), np.asarray(g_full[k])
            # fp reduction-order noise scales with the largest accumulated
            # magnitude, not the per-element value.
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=2e-3 * np.abs(b).max(),
            )

    def test_frozen_geom_cache_matches_two_pass(self, recon_ckpt):
        """The frozen-geometry fast path (style_geom_cache, eps=0) must
        produce the same loss and color-grid GRADS as the two-pass
        deferred-backprop scheme: with density frozen, caching the marched
        weights and re-evaluating only the color branch is an exact
        refactoring of the render (up to fp reduction order)."""
        root, data_cfg, ckpt, style_path, seg_path, tiny, _ = recon_ckpt
        import jax
        import jax.numpy as jnp
        from nerfstyle_tpu.config import BaseConfig
        from nerfstyle_tpu.training.style_trainer import StyleTrainer

        def make(extra, log_name):
            cfg = BaseConfig(
                log_dir=root / log_name, data_cfg=data_cfg,
                ckpt=ckpt, style_image=style_path,
            )
            nargs = list(tiny) + [
                "--style_seg_path", str(seg_path),
                "--style_matching", "0,1,2,3",  # fixed: identical loss masks
                "--defer_patch_size", "32",
                "--test_before_train",
                # No-truncation budgets: equality needs both schemes to
                # composite the same samples.
                "--max_samples_per_ray", "64",
            ] + extra
            st = StyleTrainer(cfg, nargs)
            st.renderer._budget_bucket = 64
            return st

        fast = make(["--style_geom_cache_eps", "0.0"], "fast_logs")
        slow = make(["--style_geom_cache"], "slow_logs")  # toggle true -> false
        assert fast.train_cfg.style_geom_cache
        assert not slow.train_cfg.style_geom_cache

        image, pose = slow.train_set[0]
        pose_dev = jnp.asarray(pose)
        w, h = slow.train_set.intr.size()
        trainable, frozen = slow._split_params()

        # --- two-pass grads (pass 1 render -> pixel cotangents -> pass 2) ---
        output = slow.renderer.render(
            slow.params, pose_dev, jnp.asarray(image), training=True
        )
        target_chw = output["target"][:, :3].T.reshape(3, h, w)
        preds = jnp.argmax(output["classes"], axis=1).reshape(h, w)
        (total_slow, _), pixel_grad = jax.value_and_grad(
            slow._image_losses, has_aux=True
        )(output["rgb_map"], target_chw, preds)
        g_slow = slow._pass2_grads(
            0, trainable, frozen, slow.renderer.occ_field, pose_dev, pixel_grad
        )

        # --- frozen-geometry fast path on the identical params ---
        cache = fast._build_geom_cache(0, image, pose_dev)
        total_fast, _, g_fast = fast._fast_step_fn(cache["xyz"].shape[0])(
            trainable, frozen, *fast._cache_args(cache),
            cache["target_chw"], cache["tgt_feat"],
        )

        np.testing.assert_allclose(
            float(total_fast), float(total_slow), rtol=1e-4
        )
        for k in g_slow:
            a, b = np.asarray(g_fast[k]), np.asarray(g_slow[k])
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=2e-3 * np.abs(b).max()
            )

        # --- scanned-window variant (the single-device HBM-bounded step)
        # must reproduce the monolithic step exactly: the image is linear in
        # the per-sample channels, so the pixel-boundary VJP split is the
        # chain rule.  Force ~4 windows on this small stream.
        S = cache["xyz"].shape[0]
        total_win, _, g_win = fast._fast_step_windowed_fn(S, 4)(
            trainable, frozen, *fast._cache_args(cache),
            cache["target_chw"], cache["tgt_feat"],
        )
        np.testing.assert_allclose(float(total_win), float(total_fast), rtol=1e-5)
        for k in g_fast:
            a, b = np.asarray(g_win[k]), np.asarray(g_fast[k])
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-5 * max(np.abs(b).max(), 1e-8),
                err_msg=k,
            )

        # The fast path end-to-end: runs, only the color grid moves.
        density_before = np.asarray(fast.params["x_density_embedder"]).copy()
        color_before = np.asarray(fast.params["x_color_embedder"]).copy()
        fast.run_iter()
        fast.run_iter()
        np.testing.assert_array_equal(
            density_before, np.asarray(fast.params["x_density_embedder"])
        )
        assert np.abs(
            np.asarray(fast.params["x_color_embedder"]) - color_before
        ).max() > 0

    def test_render_cli_from_ckpt(self, recon_ckpt, monkeypatch, capsys):
        root, data_cfg, ckpt, *_ = recon_ckpt
        import sys

        out_dir = root / "render_out"
        monkeypatch.setattr(
            sys, "argv",
            ["render.py", str(ckpt), "--out-dir", str(out_dir), "--max-count", "1"],
        )
        import render

        render.main()
        pngs = list(out_dir.glob("*.png"))
        assert len(pngs) == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
