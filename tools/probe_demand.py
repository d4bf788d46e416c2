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
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from nerfstyle_tpu.config import BaseConfig
from nerfstyle_tpu.data.synthetic import generate_scene
from nerfstyle_tpu.training.trainer import Trainer


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerfstyle_probe")
    res = os.environ.get("NERFSTYLE_BENCH_RES", "378x504")
    h, w = (int(v) for v in res.split("x"))
    views = int(os.environ.get("NERFSTYLE_BENCH_VIEWS", "30"))
    variant = os.environ.get("NERFSTYLE_BENCH_SCENE", "room")
    scene = work / f"scene_{variant}_{h}x{w}_v{views}"
    generate_scene(
        scene, num_train=views, num_test=3, h=h, w=w, room=variant == "room"
    )
    data_cfg = work / "data.yaml"
    data_cfg.write_text(
        f"root_path: {scene}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n"
    )
    logs = work / "logs"
    import shutil

    shutil.rmtree(logs, ignore_errors=True)
    cfg = BaseConfig(log_dir=logs, data_cfg=data_cfg)
    nargs = [
        "--num_iterations", "100000",
        "--intervals.print", "0",
        "--intervals.log", "0",
        "--intervals.test", "0",
        "--intervals.ckpt", "0",
        "--update_thres", "64",
        "--max_samples_per_ray", "1024",
        "--sparsity_lambda", "0.001",
        "--sparsity_samples", "8192",
    ] + os.environ.get("NERFSTYLE_BENCH_EXTRA_ARGS", "").split()
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
                "occ_frac": round(occ_frac, 4),
            }), flush=True)
            rays_last = trainer.rays_trained
            t_last = time.perf_counter()


if __name__ == "__main__":
    main()
