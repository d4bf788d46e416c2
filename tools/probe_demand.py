#!/usr/bin/env python
"""Demand-trajectory probe: train the bench scene and log sample demand.

The bench's timed window only measures steady state if the occupancy grid
has pruned free space by then; this probe records, every occupancy update,
the running mean sample demand (mean_count / rays), the active budget
bucket, and the recent per-iteration wall time — so the warmup length and
truncation-transient extent can be SIZED from data instead of guessed.

Usage:
    PROBE_ITERS=1200 python tools/probe_demand.py [workdir]
Prints one JSON line per report plus a final summary line.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    # Same persistent cache as bench.py: every compile here pre-warms the
    # driver's bench run (the bench dir is the one path that may persist).
    _cache = os.environ.get(
        "NERFSTYLE_BENCH_DIR",
        str(Path(__file__).resolve().parent.parent / ".bench_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", str(Path(_cache) / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Scene + regime setup is IMPORTED from bench.py so the probe always
# measures the exact bench regime (same scene env knobs, same train flags —
# including --adaptive_batch); a divergent copy here would size the bench's
# warmup from a different regime than the bench runs.
import bench
from nerfstyle_tpu.config import BaseConfig
from nerfstyle_tpu.training.trainer import Trainer


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerfstyle_probe")
    data_cfg, _ = bench.make_bench_scene(work)
    logs = work / "logs"
    import shutil

    shutil.rmtree(logs, ignore_errors=True)
    cfg = BaseConfig(log_dir=logs, data_cfg=data_cfg)
    nargs = [
        "--num_iterations", "100000",
    ] + bench.TRAIN_REGIME_FLAGS + os.environ.get(
        "NERFSTYLE_BENCH_EXTRA_ARGS", ""
    ).split()
    trainer = Trainer(cfg, nargs, assume_yes=True)
    iters = int(os.environ.get("PROBE_ITERS", "1200"))
    report = int(os.environ.get("PROBE_REPORT", "32"))

    t_last = time.perf_counter()
    rays_last = 0
    for i in range(1, iters + 1):
        trainer.run_iter()
        if i % report == 0:
            import numpy as np

            jax.block_until_ready(trainer.params["x_density_embedder"])
            # force a host sync the remote backend honors
            float(np.asarray(trainer.params["x_density_embedder"][0, 0]))
            now = time.perf_counter()
            r = trainer.renderer
            occ_frac = float(np.asarray(r.occ_state.bitfield.mean()))
            # Grid shape diagnostics: where the fog band sits relative to
            # the binarization threshold min(mean, density_thresh), and
            # whether the walls (the high quantiles) are learning.
            grid = np.asarray(r.occ_state.density_grid)
            pos = np.clip(grid, 0.0, None)
            mean_d = float(pos.mean())
            thresh = min(mean_d, r.settings.density_thresh)
            qs = {
                f"q{q}_c{c}": float(np.quantile(grid[c], q / 100.0))
                for c in range(grid.shape[0])
                for q in (50, 90, 99)
            }
            print(json.dumps({
                "iter": i,
                "s_per_iter": round((now - t_last) / report, 3),
                "rays_per_s": round(
                    (trainer.rays_trained - rays_last) / (now - t_last), 1
                ),
                "rays_now": (
                    trainer._adaptive_rays
                    if trainer.train_cfg.adaptive_batch
                    else trainer.train_cfg.num_rays_per_batch
                ),
                "demand_per_ray": round(
                    r._mean_count_host / max(1, r._last_num_rays), 1
                ),
                "bucket": r._budget_bucket,
                # Fit quality alongside the demand telemetry: an occupancy
                # equilibrium can be a good fit or a translucent-soup
                # underfit — PSNR is what tells them apart.
                "psnr": round(
                    float(np.asarray(trainer.last_losses["psnr"])), 2
                ) if getattr(trainer, "last_losses", None) else None,
                # Compiled-shape telemetry: every distinct train-step graph
                # is a multi-minute remote compile, so the bench's cold-path
                # cost is ~linear in step_graphs; window/sig are the two
                # bucket ladders that key it besides the ray count.
                "window_bucket": r._window_bucket,
                "sig_bucket": trainer._sig_bucket_train,
                "step_graphs": len(trainer._train_step_cache),
                "occ_frac": round(occ_frac, 4),
                "mean_density": round(mean_d, 6),
                "thresh": round(thresh, 6),
                **{k: round(v, 6) for k, v in qs.items()},
            }), flush=True)
            rays_last = trainer.rays_trained
            t_last = time.perf_counter()


if __name__ == "__main__":
    main()
