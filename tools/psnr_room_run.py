#!/usr/bin/env python
"""Long reconstruction run on the enclosed-room bench scene with held-out PSNR.

Round-3 evidence run (VERDICT r2 task 8): trains the flagship config on the
self-contained room scene at the bench-stability regime (30 views, 378x504,
sample cap that cannot bind, sparsity regularizer — the same nargs bench.py
uses), evaluates held-out PSNR every 500 iters, and saves a final checkpoint
that feeds tools/sweep_render.py and tools/style_full_run.py.

Reference schedule being validated: 15 000 iters x 4 096 rays
(/root/reference/cfgs/training/default.yaml); iterations are configurable via
PSNR_ITERS because the shared chip bounds feasible wall-clock.

Usage:
    PSNR_ITERS=2000 python tools/psnr_room_run.py [workdir]
"""
import json
import os
import shutil
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
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerfstyle_room_psnr")
    scene = work / "scene"
    generate_scene(scene, num_train=30, num_test=3, h=378, w=504, room=True)
    data_cfg = work / "data.yaml"
    data_cfg.write_text(
        f"root_path: {scene}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n"
    )
    logs = work / "logs"
    shutil.rmtree(logs, ignore_errors=True)

    iters = int(os.environ.get("PSNR_ITERS", "2000"))
    cfg = BaseConfig(log_dir=logs, data_cfg=data_cfg)
    nargs = [
        "--num_iterations", str(iters),
        "--intervals.print", "100",
        "--intervals.log", "0",
        "--intervals.test", "500",
        "--intervals.ckpt", "0",
        "--max_eval_count", "3",
        "--max_samples_per_ray", "1024",
        "--sparsity_lambda", "0.001",
        "--sparsity_samples", "8192",
    ] + os.environ.get("EXTRA", "").split()
    trainer = Trainer(cfg, nargs, assume_yes=True)
    t0 = time.perf_counter()
    trainer.run()
    dt = time.perf_counter() - t0
    metrics = trainer.test_networks()
    trainer.save_ckpt()
    print(
        json.dumps(
            {
                "iters": iters,
                "train_s": round(dt, 1),
                **{k: round(float(v), 3) for k, v in metrics.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
