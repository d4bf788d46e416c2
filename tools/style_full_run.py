#!/usr/bin/env python
"""Full (non-extrapolated) 200-iteration style-stage timing run.

Round-3 evidence run (VERDICT r2 task 3): times ALL 200 stylization
iterations directly (NERFSTYLE_BENCH_FULL=1 through bench.bench_style),
including the Hungarian-matching first iteration, bucket-retargeting
recompiles, and checkpointing — validating bench.py's default
extrapolated-from-4 measurement.

Expects a trained checkpoint produced by tools/psnr_room_run.py (or any
trainer run) in <workdir>/logs/.

Reference schedule: 200 iters, --max-steps 512
(/root/reference/cfgs/training/style.yaml, README.md:59).

Usage:
    python tools/style_full_run.py [workdir]
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["NERFSTYLE_BENCH_FULL"] = "1"

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

from bench import bench_style


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerfstyle_room_psnr")
    ckpts = sorted((work / "logs").glob("*.ckpt"))
    if not ckpts:
        sys.exit(f"no checkpoint under {work}/logs — run tools/psnr_room_run.py first")
    style_s, iters, how = bench_style(work, work / "data.yaml", ckpts[-1])
    print(
        json.dumps(
            {"style_wallclock_s": round(style_s, 1), "iters": iters, "how": how}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
