"""Compile-shape pre-seeding and cross-regime bucket rescaling.

Every distinct train-step shape is a separate (multi-minute, on the remote
TPU helper) XLA compile, so the r5 knobs that let a run START at its
settled shapes must actually take effect:

  * ``two_phase_init_bucket`` pre-seeds the kept-prefix capacity so the
    first compiled step is already the two-phase shape;
  * ``window_init_bucket`` pre-seeds the two-stage march's candidate-window
    capacity instead of starting at the ladder max;
  * checkpoint bucket tuning recorded under one march regime (max_steps)
    rescales when loaded under another (fog-phase 256 -> production 1024,
    recon 1024 -> style 512) — see Renderer.state_dict_static.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nerfstyle_tpu.core.types import BBox, Intrinsics
from nerfstyle_tpu.models.fields import field_init, style_field_spec
from nerfstyle_tpu.ops.hashgrid import hashgrid_spec
from nerfstyle_tpu.render.renderer import (
    _WINDOW_BUCKETS,
    Renderer,
    RenderSettings,
)

from test_adaptive_batch import _make_trainer


def _mini_renderer(**settings_kw):
    grid = hashgrid_spec(4, 2, 8, per_level_scale=1.5, log2_hashmap_size=10)
    spec = style_field_spec(grid, class_dim=0)
    settings = RenderSettings(grid_size=16, max_steps=128, **settings_kw)
    intr = Intrinsics(h=8, w=8, fx=8.0, fy=8.0, cx=4.0, cy=4.0)
    return Renderer(spec, BBox.from_radius(1.0), settings, intr, 1.0)


class TestWindowInitBucket:
    def test_default_starts_at_ladder_max(self):
        r = _mini_renderer()
        assert r._window_bucket == max(_WINDOW_BUCKETS)

    def test_seed_snaps_up_to_ladder(self):
        r = _mini_renderer(window_init_bucket=50)
        assert r._window_bucket == 64  # next ladder rung >= 50

    def test_oversized_seed_clamps_to_ladder_max(self):
        r = _mini_renderer(window_init_bucket=10_000)
        assert r._window_bucket == max(_WINDOW_BUCKETS)


class TestCrossRegimeRescale:
    def test_same_regime_roundtrip_is_identity(self):
        r = _mini_renderer()
        r._budget_bucket = 48
        r._window_bucket = 96
        r._last_num_rays = 512
        sd = r.state_dict_static()
        r2 = _mini_renderer()
        r2.load_state_dict_static(sd)
        assert r2._budget_bucket == 48
        assert r2._window_bucket == 96

    def test_finer_march_scales_buckets_up(self):
        # Tuned at max_steps 128, loaded at 512: 4x lattice resolution means
        # ~4x samples AND windows per ray.
        r = _mini_renderer()
        r._budget_bucket = 24
        r._window_bucket = 32
        sd = r.state_dict_static()
        grid = hashgrid_spec(4, 2, 8, per_level_scale=1.5, log2_hashmap_size=10)
        spec = style_field_spec(grid, class_dim=0)
        settings = RenderSettings(
            grid_size=16, max_steps=512, max_samples_per_ray=1024
        )
        intr = Intrinsics(h=8, w=8, fx=8.0, fy=8.0, cx=4.0, cy=4.0)
        r2 = Renderer(spec, BBox.from_radius(1.0), settings, intr, 1.0)
        r2._mean_count_host = 100
        r2.load_state_dict_static(sd)
        assert r2._budget_bucket == 96  # 24 * 4 on the bucket ladder
        assert r2._window_bucket == 128  # 32 * 4 on the window ladder
        assert r2._mean_count_host == 400  # demand EMA rescaled too

    def test_coarser_march_scales_buckets_down(self):
        r = _mini_renderer()
        r._budget_bucket = 96
        r._window_bucket = 128
        sd = r.state_dict_static()
        grid = hashgrid_spec(4, 2, 8, per_level_scale=1.5, log2_hashmap_size=10)
        spec = style_field_spec(grid, class_dim=0)
        settings = RenderSettings(grid_size=16, max_steps=64)
        intr = Intrinsics(h=8, w=8, fx=8.0, fy=8.0, cx=4.0, cy=4.0)
        r2 = Renderer(spec, BBox.from_radius(1.0), settings, intr, 1.0)
        r2.load_state_dict_static(sd)
        assert r2._budget_bucket == 48  # 96 / 2 snapped on the ladder
        assert r2._window_bucket == 64

    def test_legacy_static_without_max_steps_is_scale_one(self):
        r = _mini_renderer()
        r._budget_bucket = 48
        r._window_bucket = 96
        sd = r.state_dict_static()
        del sd["max_steps"]  # reference-import / pre-r5 checkpoints
        r2 = _mini_renderer()
        r2.load_state_dict_static(sd)
        assert r2._budget_bucket == 48
        assert r2._window_bucket == 96


class TestTwoPhaseInitBucket:
    def test_preseed_sets_first_step_shape(self, tmp_path):
        t = _make_trainer(
            tmp_path,
            [
                "--adaptive_batch_budget", "32768",
                "--two_phase_init_bucket", "20",
            ],
        )
        # Snapped UP the bucket ladder (20 -> 24); the first _get_train_step
        # therefore builds the two-phase shape directly.
        assert t._sig_bucket_train == 24

    def test_default_tunes_from_demand(self, tmp_path):
        t = _make_trainer(tmp_path, ["--adaptive_batch_budget", "32768"])
        assert t._sig_bucket_train is None
