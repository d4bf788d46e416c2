#!/usr/bin/env python
"""Sweep the incremental renderer's (infer_bucket, round_size, chunk) at a
target resolution against a trained checkpoint; print ms/frame + FPS +
evaluated sample counts per combo (VERDICT r2 task 6).

Usage:
    python tools/sweep_render.py --ckpt <path.ckpt> --data-cfg <data.yaml> \
        [--res 756x1008] [--frames 2]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path, required=True)
    ap.add_argument("--data-cfg", type=Path, required=True)
    ap.add_argument("--res", default="756x1008", help="HxW")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--buckets", default="512,2048,8192")
    ap.add_argument("--rounds", default="16,32,64")
    ap.add_argument("--chunks", default="8192,32768")
    ap.add_argument(
        "--early-k1", default="0",
        help="two_phase only: infer_early_k1 values (0 = single round)",
    )
    ap.add_argument(
        "--modes", default="two_phase,incremental",
        help="two_phase sweeps chunks only (bucket/round unused)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the per-combo chunk graphs are large and the
    # remote TPU compile helper is slow; caching makes repeat combos cheap.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from nerfstyle_tpu.config import (
        DatasetConfig, NetworkConfig, RendererConfig, TrainConfig, _from_dict,
    )
    from nerfstyle_tpu.core.types import DatasetSplit
    from nerfstyle_tpu.data import get_dataset
    from nerfstyle_tpu.models.fields import (
        field_init, make_grid_spec, style_field_spec, with_dedup,
    )
    from nerfstyle_tpu.ops.occupancy import occupancy_persistable, occupancy_restore
    from nerfstyle_tpu.render.renderer import Renderer, RenderSettings
    from nerfstyle_tpu.training import checkpoint as ckpt_lib

    meta, groups = ckpt_lib.load_checkpoint(args.ckpt)
    net_cfg = _from_dict(NetworkConfig, meta["net_cfg"])
    render_cfg = _from_dict(RendererConfig, meta["render_cfg"])
    train_cfg = _from_dict(TrainConfig, meta["train_cfg"])
    dataset_cfg = _from_dict(DatasetConfig, meta["dataset_cfg"])
    dataset_cfg.root_path = None  # force from --data-cfg
    import yaml

    for k, v in yaml.safe_load(args.data_cfg.read_text()).items():
        setattr(dataset_cfg, k, v)

    train_set = get_dataset(dataset_cfg, split=DatasetSplit.TRAIN)
    test_set = get_dataset(dataset_cfg, split=DatasetSplit.TEST, max_count=1)

    h, w = (int(v) for v in args.res.split("x"))
    intr = test_set.intr.scale(w, h)
    print(f"render at {intr.w}x{intr.h} ({intr.w * intr.h} rays/frame)")

    max_bound = float(np.max(np.asarray(train_set.bbox.size)))
    grid_spec = make_grid_spec(
        n_lvls=net_cfg.pos_enc.n_lvls,
        n_feats_per_lvl=net_cfg.pos_enc.n_feats_per_lvl,
        hashmap_size=net_cfg.pos_enc.hashmap_size,
        min_res=net_cfg.pos_enc.min_res,
        max_res_coeff=net_cfg.pos_enc.max_res_coeff,
        max_bound=max_bound,
        simplex_from=net_cfg.pos_enc.simplex_from,
    )
    field_spec = style_field_spec(
        grid_spec, class_dim=train_set.num_classes, use_dir=False,
        sh_degree=net_cfg.dir_enc_sh_deg,
        density_hidden_dims=net_cfg.density_hidden_dims,
        density_hidden_layers=net_cfg.density_hidden_layers,
        rgb_hidden_dims=net_cfg.rgb_hidden_dims,
        rgb_hidden_layers=net_cfg.rgb_hidden_layers,
        density_offset=net_cfg.density_offset,
    )
    field_spec = with_dedup(
        field_spec, render_cfg.max_steps, np.asarray(train_set.bbox.size)
    )
    params = field_init(jax.random.PRNGKey(0), field_spec)
    params = ckpt_lib.restore_tree(params, groups["params"])

    _, pose = test_set[0]
    pose_dev = jnp.asarray(pose)

    modes = args.modes.split(",")
    combos = []
    if "two_phase" in modes:
        # bucket/round are incremental-loop knobs; chunk + early_k1 matter.
        combos += [
            ("two_phase", 0, 0, c, k1)
            for c in (int(x) for x in args.chunks.split(","))
            for k1 in (int(x) for x in args.early_k1.split(","))
        ]
    if "incremental" in modes:
        combos += [
            ("incremental", b, r, c, 0)
            for b in (int(x) for x in args.buckets.split(","))
            for r in (int(x) for x in args.rounds.split(","))
            for c in (int(x) for x in args.chunks.split(","))
        ]
    print(f"{'mode':>12} {'bucket':>7} {'round':>6} {'chunk':>7} {'k1':>4} "
          f"{'ms/frame':>10} {'FPS':>7} {'Msamples':>9} {'Mmarched':>9} "
          f"{'Mlive':>7} {'Msig':>6} {'Mtail':>6}")
    results = []
    for mode, bucket, rnd, chunk, k1 in combos:
        settings = RenderSettings(
            grid_size=render_cfg.grid_size,
            update_iter=render_cfg.update_iter,
            min_near=render_cfg.min_near,
            t_thresh=render_cfg.t_thresh,
            use_ndc=render_cfg.use_ndc,
            flip_camera=render_cfg.flip_camera,
            max_steps=render_cfg.max_steps,
            update_thres=render_cfg.update_thres,
            density_scale=render_cfg.density_scale,
            density_thresh=render_cfg.density_thresh,
            density_decay=render_cfg.density_decay,
            max_samples_per_ray=render_cfg.max_samples_per_ray,
            max_budget_samples=render_cfg.max_budget_samples,
            infer_bucket=bucket or 512,
            infer_round_size=rnd or 32,
            infer_chunk=chunk,
            infer_two_phase=mode == "two_phase",
            infer_early_k1=k1,
        )
        renderer = Renderer(
            field_spec, train_set.bbox, settings, intr,
            float(dataset_cfg.bound),
            raymarch_channels=3 + train_set.num_classes,
            compute_dtype=jnp.bfloat16 if train_cfg.enable_amp else jnp.float32,
        )
        renderer.occ_state = occupancy_restore(
            ckpt_lib.restore_tree(
                occupancy_persistable(renderer.occ_state), groups["occ"]),
            settings.grid_size,
        )
        if "renderer_static" in meta:
            renderer.load_state_dict_static(meta["renderer_static"])
        try:
            out = renderer.render(params, pose_dev, training=False)
            npts = int(out["num_points"])  # forces the frame
            ts = []
            for _ in range(args.frames):
                t0 = time.perf_counter()
                out = renderer.render(params, pose_dev, training=False)
                npts = int(out["num_points"])
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3
            extra = ""
            for k, wd in (
                ("num_marched", 9), ("num_live", 7), ("num_sig", 6),
                ("num_tail", 6),
            ):
                v = out.get(k)
                extra += f" {'-' * 1:>{wd}}" if v is None else (
                    f" {int(v) / 1e6:>{wd}.1f}"
                )
            print(f"{mode:>12} {bucket:>7} {rnd:>6} {chunk:>7} {k1:>4} "
                  f"{ms:>10.0f} {1e3 / ms:>7.3f} {npts / 1e6:>9.1f}{extra}",
                  flush=True)
            results.append((mode, bucket, rnd, chunk, k1, ms))
        except Exception as e:  # OOM etc: report and continue
            print(f"{mode:>12} {bucket:>7} {rnd:>6} {chunk:>7} {k1:>4}   "
                  f"FAILED: {str(e)[:60]}", flush=True)
    if results:
        m, b, r, c, k1, ms = min(results, key=lambda t: t[-1])
        print(f"best: mode={m} bucket={b} round={r} chunk={c} k1={k1} "
              f"({ms:.0f} ms, {1e3 / ms:.3f} FPS)")


if __name__ == "__main__":
    main()
