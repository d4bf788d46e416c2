#!/usr/bin/env python
"""Benchmark: training throughput (rays/sec) of the flagship pipeline on the
attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference publishes no numbers (BASELINE.md).  Its
training schedule is 15,000 iters x 4,096 rays on an RTX 3090 (cfgs/training/
default.yaml); instant-ngp-class pipelines of this architecture typically
sustain ~150k rays/s end-to-end on that card, which we adopt as the nominal
reference throughput for the vs_baseline ratio until a measured reference
number exists.
"""

import json
import os
import sys
import time
from pathlib import Path

REFERENCE_RAYS_PER_SEC = 150_000.0  # nominal RTX 3090 figure (see docstring)


def main():
    import jax

    # Persistent compilation cache: the flagship graphs are large and the
    # remote TPU compile helper is slow; caching makes warmup near-free on
    # repeat runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import numpy as np

    work = Path(os.environ.get("NERFSTYLE_BENCH_DIR", "/tmp/nerfstyle_bench"))
    scene = work / "scene"
    logs = work / "logs"
    import shutil

    shutil.rmtree(logs, ignore_errors=True)

    from nerfstyle_tpu.data.synthetic import generate_scene

    generate_scene(scene, num_train=12, num_test=2, h=96, w=128)
    data_cfg = work / "data.yaml"
    data_cfg.write_text(f"root_path: {scene}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n")

    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.training.trainer import Trainer

    cfg = BaseConfig(log_dir=logs, data_cfg=data_cfg)
    nargs = [
        "--num_iterations", "200",
        "--intervals.print", "0",
        "--intervals.log", "0",
        "--intervals.test", "0",
        "--intervals.ckpt", "0",
        "--update_thres", "64",
        "--max_samples_per_ray", "64",
    ]
    trainer = Trainer(cfg, nargs)

    num_rays = trainer.train_cfg.num_rays_per_batch

    # Warmup must cover every graph the timed loop hits: the train step per
    # budget bucket AND the first random occupancy update, which fires at
    # local_step == update_thres (64) — a cold compile there lands minutes of
    # remote-compiler time inside the timed region.
    warmup = int(os.environ.get("NERFSTYLE_BENCH_WARMUP", "72"))
    iters = int(os.environ.get("NERFSTYLE_BENCH_ITERS", "100"))

    for _ in range(warmup):
        trainer.run_iter()

    import jax

    jax.block_until_ready(trainer.params["x_density_embedder"])
    t0 = time.perf_counter()
    for _ in range(iters):
        trainer.run_iter()
    jax.block_until_ready(trainer.params["x_density_embedder"])
    dt = time.perf_counter() - t0

    rays_per_sec = num_rays * iters / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # surface failures as a parseable line on stderr
        print(f"bench failed: {e}", file=sys.stderr)
        raise
