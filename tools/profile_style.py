#!/usr/bin/env python
"""Stage-level profiling of the frozen-geometry style step on the TPU.

Breaks the cached stylization iteration (training/style_trainer.py
_run_iter_cached) into stages: geometry-cache build, color-branch forward,
full fused step (fwd+bwd), and the VGG/loss head alone — so the style
wall-clock budget (BASELINE: 200 iters <= 120 s on v4-8) can be attributed.
Methodology per docs/PERFORMANCE.md: every timing forces a scalar host fetch;
the step's params vary per rep (optimizer updates) so memoization can't hide.

Expects a trained checkpoint (tools/psnr_room_run.py) in <workdir>/logs/.

Usage: python tools/profile_style.py [workdir] [--reps 6]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

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


def _force(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def timeit(name, fn, reps):
    out = fn(0)  # warmup/compile
    _force(out)
    ts = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(i)
        _force(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{name:44s} {med * 1e3:9.1f} ms   (min {min(ts) * 1e3:.1f})",
          flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/nerfstyle_room_psnr")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    work = Path(args.workdir)
    ckpts = sorted((work / "logs").glob("*.ckpt"))
    if not ckpts:
        sys.exit(f"no checkpoint under {work}/logs — run tools/psnr_room_run.py")

    from nerfstyle_tpu import utils
    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.training.style_trainer import StyleTrainer

    h, w = 192, 256
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    style_img = np.stack([yy, xx, 1 - yy], axis=-1).astype(np.float32)
    style_path = work / "style.png"
    utils.save_image(style_img, style_path)
    seg = (yy > 0.5).astype(np.int64) * 2 + (xx > 0.5).astype(np.int64)
    seg_path = work / "style_seg.npz"
    np.savez(seg_path, seg_map=seg)

    import shutil

    shutil.rmtree(work / "style_profile_logs", ignore_errors=True)
    st = StyleTrainer(
        BaseConfig(
            log_dir=work / "style_profile_logs", data_cfg=work / "data.yaml",
            ckpt=ckpts[-1], style_image=style_path,
        ),
        [
            "--max_steps", "512",
            "--style_seg_path", str(seg_path),
            "--intervals.print", "0", "--intervals.log", "0",
            "--intervals.test", "0", "--intervals.ckpt", "0",
            "--test_before_train",
        ],
    )

    image, pose = st.train_set[0]
    pose_dev = jnp.asarray(pose)

    # -- stage: geometry-cache build (cold: includes ladder growth) --
    t0 = time.perf_counter()
    cache = st._build_geom_cache(0, image, pose_dev)
    _force(cache["xyz"])
    print(f"{'cache build (cold, ladder growth)':44s} "
          f"{(time.perf_counter() - t0) * 1e3:9.1f} ms", flush=True)

    def rebuild(i):
        st._geom_cache.pop(0, None)
        c = st._build_geom_cache(0, image, pose_dev)
        return c["xyz"]

    timeit("cache build (warm)", rebuild, max(2, args.reps // 2))

    S = cache["xyz"].shape[0]
    hw = np.prod(st.train_set.intr.size())
    print(f"stream: {S} slots, {int(S) / hw:.1f}/ray x {hw} rays", flush=True)

    # -- stage: color-branch forward over the cached stream --
    fwd = st._fast_fwd_fn(S)

    def color_fwd(i):
        return fwd(st.params, *st._cache_args(cache))[0]

    timeit("color fwd + composite (render from cache)", color_fwd, args.reps)

    # -- stage: VGG + losses on a fixed rendered image (fwd only) --
    rgb_map, preds = fwd(st.params, *st._cache_args(cache))
    if st.style_loss.use_matching and st.style_loss.matching is None:
        wdt, hgt = st.train_set.intr.size()
        feats = st.fx(rgb_map.T.reshape(3, hgt, wdt))[st.style_loss.keys[0]][0]
        st.style_loss.update_matching(feats, preds)

    @jax.jit
    def vgg_loss(rgb):
        total, _ = st._image_losses(
            rgb, cache["target_chw"], preds, cache["tgt_feat"]
        )
        return total

    timeit("VGG + style/content losses (fwd)", lambda i: vgg_loss(rgb_map + i * 1e-6),
           args.reps)

    # -- stage: the full fused step (fwd + bwd + optimizer-free) --
    trainable, frozen = st._split_params()
    step = st._fast_step_fn(S)

    def full_step(i):
        nonlocal trainable
        total, _sc, g = step(
            trainable, frozen, *st._cache_args(cache),
            cache["target_chw"], cache["tgt_feat"],
        )
        # vary params between reps without a host sync
        trainable = jax.tree_util.tree_map(
            lambda p, gg: p - 1e-6 * gg, trainable, g
        )
        return total

    med = timeit("fused style step (fwd+bwd)", full_step, args.reps)

    # -- end-to-end iteration through run_iter (includes host logic) --
    def run_iter(i):
        st.run_iter()
        return st.params["x_color_embedder"]

    it = timeit("run_iter end-to-end", run_iter, args.reps)
    print(
        f"\nprojected 200-iter wall-clock: {200 * it:.0f} s "
        f"(+ per-pose cache builds, epoch 1)\n"
        f"fused-step share: {med / it * 100:.0f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
