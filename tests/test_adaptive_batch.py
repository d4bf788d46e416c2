"""Adaptive ray batching: fixed sample budget, ladder-tuned ray count.

Under ``--adaptive_batch`` the train step's compacted-sample budget is a run
constant and the ray count adapts so demand * 1.25 always fits (truncation
can only bind when demand pins the controller at the ladder minimum, which
the trainer warns about; the reference instead sizes its point buffer at
mean_count and silently drops overflow rays, raymarching.py:233-236).  These
tests drive the real Trainer on a tiny scene and check the controller's
invariants.
"""

import shutil

import numpy as np
import pytest


def _make_trainer(root, extra_nargs):
    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.data.synthetic import generate_scene
    from nerfstyle_tpu.training.trainer import Trainer

    data_root = root / "scene"
    generate_scene(data_root, num_train=6, num_test=2, h=48, w=64)
    data_cfg = root / "data.yaml"
    data_cfg.write_text(
        f"root_path: {data_root}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n"
    )
    cfg = BaseConfig(log_dir=root / "logs", data_cfg=data_cfg)
    nargs = [
        "--num_iterations", "60",
        "--num_rays_per_batch", "256",
        "--pos_enc.n_lvls", "4",
        "--pos_enc.hashmap_size", "12",
        "--pos_enc.max_res_coeff", "16",
        "--grid_size", "32",
        "--max_steps", "128",
        "--update_thres", "4",
        "--update_iter", "4",
        "--max_eval_count", "1",
        "--intervals.print", "0",
        "--intervals.log", "0",
        "--intervals.test", "0",
        "--intervals.ckpt", "0",
        "--enable_amp",
        "--adaptive_batch",
    ] + extra_nargs
    return Trainer(cfg, nargs)


@pytest.fixture(scope="module")
def adaptive_trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("adaptive")
    # Budget sized so steady-state demand on this tiny scene (~15-25
    # samples/ray) leaves idle budget at 256 rays, forcing the controller to
    # grow the ray count once estimates stabilize.
    t = _make_trainer(
        root, ["--adaptive_batch_budget", "32768", "--adaptive_batch_max_rays", "1024"]
    )
    yield t
    shutil.rmtree(root, ignore_errors=True)


class TestAdaptiveBatch:
    def test_controller_tracks_demand_and_never_truncates(self, adaptive_trainer):
        t = adaptive_trainer
        seen_rays = set()
        rays_before = t.rays_trained
        expected_rays = 0
        for _ in range(40):
            t.run_iter()
            # Any retune happens at the TOP of run_iter, so _adaptive_rays
            # read here is the count the step just ran at.
            expected_rays += t._adaptive_rays
            seen_rays.add(t._adaptive_rays)
            # Invariant: the chosen ray count keeps 1.25x the estimated
            # demand within the fixed budget whenever an estimate exists
            # (after the first occupancy sync), unless already at the
            # ladder minimum.
            r = t.renderer
            if r._mean_count_host > 0 and t._adaptive_rays > t._ray_ladder[0]:
                demand = r._mean_count_host / max(1, r._last_num_rays)
                assert demand * 1.25 * t._adaptive_rays <= t._adaptive_budget * 1.05

        # The accumulator backing bench.py's rays/s metric must equal the
        # independently tracked per-iteration sum (catches double counting).
        assert t.rays_trained - rays_before == expected_rays
        assert 0 < t.rays_trained <= t.iter_ctr * t._ray_ladder[-1]
        # The tiny budget must have forced at least one ladder move.
        assert len(seen_rays) >= 2, seen_rays
        assert all(v in t._ray_ladder for v in seen_rays)

    def test_learns_under_adaptive_batch(self, adaptive_trainer):
        metrics = adaptive_trainer.test_networks()
        assert metrics["psnr"] > 10.0, metrics


def test_grow_is_debounced_and_shrink_immediate(tmp_path):
    t = _make_trainer(
        tmp_path,
        ["--adaptive_batch_budget", "65536", "--adaptive_batch_max_rays", "2048"],
    )
    try:
        r = t.renderer
        # Prime the trainer so renderer state exists.
        t.run_iter()
        # Force a known demand estimate: 16 samples/ray at the current count.
        r._mean_count_host = 16 * t._adaptive_rays
        r._last_num_rays = t._adaptive_rays
        cur = t._adaptive_rays
        # want = 65536 / (1.25 * 16) = 3276 -> ladder 2048 (max).
        t._retune_adaptive_rays()
        assert t._adaptive_rays == cur, "growth must be debounced"
        t._retune_adaptive_rays()
        assert t._adaptive_rays == 2048, "second agreeing retune grows"
        # Demand spike: 256 samples/ray -> want = 204 -> ladder min 256.
        r._mean_count_host = 256 * 2048
        r._last_num_rays = 2048
        t._retune_adaptive_rays()
        assert t._adaptive_rays == 256, "shrink must be immediate"

        # Monotone demand decay (occupancy pruning): the wanted ladder value
        # moves every retune, so the controller must NOT grow through the
        # intermediate octaves — each octave is a separate multi-minute XLA
        # compile of the train step.  Only when the want REPEATS does it jump.
        for demand in (128, 64, 32, 16):  # want: 409 -> 819 -> 1638 -> 3276
            r._mean_count_host = demand * t._adaptive_rays
            r._last_num_rays = t._adaptive_rays
            t._retune_adaptive_rays()
            assert t._adaptive_rays == 256, (
                f"moving demand (={demand}) must not grow"
            )
        r._mean_count_host = 16 * t._adaptive_rays
        r._last_num_rays = t._adaptive_rays
        t._retune_adaptive_rays()
        assert t._adaptive_rays == 2048, "settled demand grows directly to max"
    finally:
        shutil.rmtree(t.log_dir, ignore_errors=True)
