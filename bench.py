#!/usr/bin/env python
"""Benchmark: ALL THREE BASELINE.json metrics on the attached accelerator.

  1. training throughput (rays/sec) — primary metric;
  2. 200-iteration stylization wall-clock at 504x378 with --max-steps 512
     (the reference README's recommended style config);
  3. novel-view render FPS at 1008x756 (reference render.py --out-dims path).

Prints JSON lines incrementally: the train line the moment the timed window
completes, then supersets with style/render fields as each later phase lands.
A parser that takes the LAST parseable line always sees the freshest record;
a timeout or a late-phase exception can no longer lose the earlier metrics.

Wall-clock discipline (the round-3 bench was killed by the driver's timeout
before emitting a single number, BENCH_r03.json rc=124):

  * NERFSTYLE_BENCH_DEADLINE_S (default 3600) is a soft global budget.  Each
    phase checks it and degrades gracefully — convergence stops early, the
    style epoch extrapolates from the poses it measured, the render times
    fewer frames — instead of dying silent.
  * The converged training checkpoint is persisted in NERFSTYLE_BENCH_DIR
    keyed by a regime hash (scene + flags + schedule).  A re-run resumes
    from it and skips the convergence phase entirely; together with the
    persistent XLA compile cache this makes repeat runs minutes, not hours.

Baseline context: the reference publishes no numbers (BASELINE.md).  Its
training schedule is 15,000 iters x 4,096 rays on an RTX 3090 (cfgs/training/
default.yaml); instant-ngp-class pipelines of this architecture typically
sustain ~150k rays/s end-to-end on that card, which we adopt as the nominal
reference throughput for the vs_baseline ratio until a measured reference
number exists.  Style/render targets (<=120 s, >=1 FPS) are driver-set for a
TPU v4-8 slice (BASELINE.json); this bench runs on ONE chip.
"""

import hashlib
import json
import os
import sys
import time
from pathlib import Path

REFERENCE_RAYS_PER_SEC = 150_000.0  # nominal RTX 3090 figure (see docstring)
STYLE_TARGET_S = 120.0
RENDER_TARGET_FPS = 1.0

# Bump when the checkpoint schema or the bench regime changes incompatibly:
# cached converged checkpoints with a different schema tag are ignored.
CKPT_SCHEMA = "r4"

T_START = time.perf_counter()
# Default sized against the observed driver budget: the r02 run (~1.5 h+)
# completed, the r03 run was killed — 3600 s leaves margin under the kill
# while giving convergence/style as much room as a cold run can afford.
DEADLINE_S = float(os.environ.get("NERFSTYLE_BENCH_DEADLINE_S", "3600"))

# Phase stop points as fractions of the deadline.  Convergence yields first
# (it is preparation, not a metric); the timed train window, style epoch and
# render each get a slice; anything that cannot start in its window is
# skipped with an explanatory field rather than dying at the driver's kill.
CONVERGE_STOP = 0.40
TRAIN_STOP = 0.55
STYLE_STOP = 0.82
RENDER_MIN_S = 40.0  # don't even start the render with less than this left


def _elapsed() -> float:
    return time.perf_counter() - T_START


def _remaining() -> float:
    return DEADLINE_S - _elapsed()


def emit(result: dict) -> None:
    """Print the CURRENT result record as one JSON line, immediately.

    Called after every phase (and after slow sub-steps) so the freshest
    record is always near the end of the captured output tail."""
    result = dict(result)
    result["bench_elapsed_s"] = round(_elapsed(), 1)
    print(json.dumps(result), flush=True)


def _force(x):
    import numpy as np
    import jax

    return np.asarray(jax.device_get(x))


# The train regime, shared with tools/probe_demand.py so the probe always
# measures the EXACT bench regime (iteration count excluded — callers set it).
TRAIN_REGIME_FLAGS = [
    "--intervals.print", "0",
    "--intervals.log", "0",
    "--intervals.test", "0",
    "--intervals.ckpt", "0",
    "--update_thres", "64",
    # A cap that CANNOT bind: max_samples_per_ray == max_steps (1024), so
    # demand can never exceed it (the marcher caps kept samples per ray at
    # max_steps).  A binding cap truncates exactly the samples whose
    # gradients would suppress low-density fog, which then compounds
    # (measured: occupancy 5% -> 18%, demand 30 -> 178 samples/ray,
    # training diverged at ~1.2k iters under a 64 cap).  The reference
    # sizes its buffer dynamically with NO cap (raymarching.py:233-236).
    "--max_samples_per_ray", "1024",
    # Fixed-sample-budget training with an adaptive ray count: the
    # production TPU mode.  Demand * 1.25 always fits the budget (the ray
    # count shrinks through the pre-pruning transient and grows as
    # occupancy prunes), so per-ray truncation cannot bind at the default
    # >=262k budget and the dominant compiled shape is a run constant.
    "--adaptive_batch",
    # Active free-space suppression (the reference's own lever,
    # /root/reference/config.py:419-426 + trainers/base.py:285-290):
    # keeps the few-view synthetic scene out of the fog-runaway regime
    # the round-2 driver bench hit (demand 782/ray).  8192 samples/iter
    # (not the 50k default): the regularizer is statistical, and the
    # extra fwd+bwd encode at 50k pts pushed the bucket-256 step compile
    # over the 15.75G HBM ceiling (measured OOM, 20.35G).
    "--sparsity_lambda", "0.001",
    "--sparsity_samples", "8192",
    # Start space EMPTY (sigma ~ exp(-4)) so geometry grows only where the
    # loss demands it.  Without this the enclosed room scene trained INSIDE
    # its init fog: no white-background signal suppresses sigma~1-2 fog fast,
    # the occupancy threshold (min(mean_density, 10)) sits exactly at the
    # fog level, and sample demand pinned at 550/ray for 1000+ iters
    # (measured: grid median sigma 2.0 everywhere at iter 1220, train at
    # 666 rays/s, inference demand so high the two-phase render graph OOMed
    # the remote compiler).  See NetworkConfig.density_offset.
    "--density_offset", "-4",
]


def make_bench_scene(work: Path):
    """Generate the bench scene + data.yaml per the NERFSTYLE_BENCH_* env
    knobs; returns ``(data_cfg, info_dict)``.  Shared with
    tools/probe_demand.py so both always describe the same regime."""
    from nerfstyle_tpu.data.synthetic import generate_scene

    # 504x378: the LLFF images_8 resolution class (BASELINE.md).
    # NERFSTYLE_BENCH_RES=HxW overrides for smoke runs on CPU.
    res = os.environ.get("NERFSTYLE_BENCH_RES", "378x504")
    h, w = (int(v) for v in res.split("x"))
    # 30 train views = LLFF-scale coverage (the PSNR-stable regime from the
    # round-2 long runs; 12 views overfits into few-view fog, which is what
    # blew up the round-2 driver bench).  Scene dir is versioned by view
    # count so cached 12-view scenes are never silently reused.
    views = int(os.environ.get("NERFSTYLE_BENCH_VIEWS", "30"))
    # Enclosed room by default (NERFSTYLE_BENCH_SCENE=spheres for the legacy
    # open scene): the reference's headline benchmark is the LLFF *room* —
    # enclosed, every ray terminates on a wall, so early termination and the
    # thin-shell occupancy regime actually engage.  The open sphere scene left
    # ~97% of rays unterminated (T~1 to the far AABB face), which inflated
    # inference sample demand ~20x and invited few-view fog during training.
    variant = os.environ.get("NERFSTYLE_BENCH_SCENE", "room")
    scene = work / f"scene_{variant}_{h}x{w}_v{views}"
    generate_scene(
        scene, num_train=views, num_test=3, h=h, w=w, room=variant == "room"
    )
    data_cfg = work / "data.yaml"
    data_cfg.write_text(
        f"root_path: {scene}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n"
    )
    return data_cfg, {"scene_res": f"{h}x{w}", "scene": variant, "views": views}


def _regime_key(scene_info: dict, warmup: int, converge: int) -> str:
    """Hash identifying the convergence regime a cached checkpoint was
    produced under.  Any change (scene, flags, schedule, schema) keys a
    fresh checkpoint instead of silently reusing a stale one."""
    payload = json.dumps(
        {
            "schema": CKPT_SCHEMA,
            "scene": scene_info,
            "flags": TRAIN_REGIME_FLAGS,
            "extra": os.environ.get("NERFSTYLE_BENCH_EXTRA_ARGS", ""),
            "schedule": [warmup, converge],
        },
        sort_keys=True,
    )
    return hashlib.sha1(payload.encode()).hexdigest()[:12]


def bench_train(work: Path, data_cfg: Path, scene_info: dict):
    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.training.trainer import Trainer

    warmup = int(os.environ.get("NERFSTYLE_BENCH_WARMUP", "120"))
    converge = int(os.environ.get("NERFSTYLE_BENCH_CONVERGE_ITERS", "1000"))
    iters = int(os.environ.get("NERFSTYLE_BENCH_ITERS", "100"))

    logs = work / "logs"
    cached_ckpt = work / f"converged_{_regime_key(scene_info, warmup, converge)}.ckpt"
    nargs = [
        "--num_iterations", "200",
    ] + TRAIN_REGIME_FLAGS + os.environ.get(
        "NERFSTYLE_BENCH_EXTRA_ARGS", ""
    ).split()

    # ---- resume path: a converged checkpoint for this exact regime skips
    # the whole convergence phase (VERDICT r03 #1b) ----
    trainer = None
    resumed = False
    if cached_ckpt.exists() and not os.environ.get("NERFSTYLE_BENCH_FRESH"):
        try:
            cfg = BaseConfig(log_dir=logs, data_cfg=data_cfg, ckpt=cached_ckpt)
            trainer = Trainer(cfg, list(nargs), assume_yes=True)
            resumed = True
            print(f"bench: resumed converged checkpoint {cached_ckpt}", flush=True)
        except Exception as e:  # stale schema — retrain from scratch
            print(f"bench: cached checkpoint unusable ({e}); training fresh",
                  flush=True)
            trainer = None
            cached_ckpt.unlink(missing_ok=True)

    converge_s = 0.0
    converge_done = 0
    if trainer is None:
        import shutil

        shutil.rmtree(logs, ignore_errors=True)
        cfg = BaseConfig(log_dir=logs, data_cfg=data_cfg)
        trainer = Trainer(cfg, list(nargs), assume_yes=True)

        # Structure: converge FIRST, then time.  The timed window must sit in
        # steady state (occupancy pruned, budget/ray ladders settled, adaptive
        # ray count grown back) — that is the regime the nominal 150k rays/s
        # reference figure describes, and it is also what the downstream style
        # and render stages need: a crisp checkpoint.  The pre-prune transient
        # is real one-time cost but not a throughput statement; convergence
        # wall-clock is reported separately.  Deadline-guarded: the loop
        # yields once CONVERGE_STOP of the budget is spent (the occupancy
        # sync every 16 iters keeps dispatch skew bounded, so the clock check
        # tracks real progress within a chunk).
        target = warmup + converge
        t_conv = time.perf_counter()
        rays_mark, t_mark = 0, t_conv
        while converge_done < target:
            n = min(25, target - converge_done)
            for _ in range(n):
                trainer.run_iter()
            converge_done += n
            if converge_done % 100 == 0:
                _force(trainer.params["x_density_embedder"][0, 0])
                now = time.perf_counter()
                print(
                    f"bench: converge {converge_done}/{target} iters,"
                    f" {now - t_conv:.0f}s, bucket"
                    f" {trainer.renderer._budget_bucket}/ray,"
                    f" {(trainer.rays_trained - rays_mark) / (now - t_mark):.0f}"
                    " rays/s over last chunk", flush=True,
                )
                rays_mark, t_mark = trainer.rays_trained, now
            if _elapsed() > CONVERGE_STOP * DEADLINE_S:
                break
        _force(trainer.params["x_density_embedder"][0, 0])
        converge_s = time.perf_counter() - t_conv
        if converge_done < target:
            print(
                f"bench: convergence stopped early at {converge_done}/{target} "
                f"iters (deadline {DEADLINE_S:.0f}s)", flush=True,
            )
    else:
        # Short re-settle: one occupancy sync so the adaptive ladders retune
        # on fresh counters before the clock starts.
        for _ in range(int(os.environ.get("NERFSTYLE_BENCH_RESUME_WARMUP", "24"))):
            trainer.run_iter()
        _force(trainer.params["x_density_embedder"][0, 0])

    # ---- timed window ----
    rays0 = trainer.rays_trained
    timed_done = 0
    t0 = time.perf_counter()
    while timed_done < iters:
        n = min(20, iters - timed_done)
        for _ in range(n):
            trainer.run_iter()
        timed_done += n
        if _elapsed() > TRAIN_STOP * DEADLINE_S and timed_done >= 20:
            break
    _force(trainer.params["x_density_embedder"][0, 0])
    dt = time.perf_counter() - t0
    rays_done = trainer.rays_trained - rays0

    trainer.save_ckpt()
    ckpt = sorted(logs.glob("*.ckpt"))[-1]
    converged = resumed or converge_done >= warmup + converge
    if not resumed and converged:
        # Persist under the regime key for future runs (the driver's run
        # after the builder's evidence run hits this path).  A PARTIAL
        # convergence is never cached: resuming a half-converged (foggy,
        # high-demand) checkpoint would poison every later run's style and
        # render phases (measured: the r4 evidence run cached an iter-220
        # checkpoint at 897 samples/ray demand; style and render both
        # RESOURCE_EXHAUSTED against it).
        import shutil

        shutil.copyfile(ckpt, cached_ckpt)

    stats = {
        "train_resumed": resumed,
        "train_converge_iters_done": converge_done,
        "train_converge_s": round(converge_s, 1),
        "train_timed_iters": timed_done,
    }
    return rays_done / dt, ckpt, stats, converged


def bench_style(work: Path, data_cfg: Path, ckpt: Path, result: dict):
    """Stylization wall-clock (504x378 scene, --max-steps 512).

    Epoch 1 is measured pose-by-pose: under style_geom_cache each pose pays a
    one-time geometry-cache build on first visit, so steady-state timing
    alone would skip that cost.  Deadline-guarded: if the pose loop must stop
    early, the epoch cost extrapolates from the measured poses and the
    steady-state window re-times an ALREADY-CACHED pose (cycling the data
    iterator), never an unbuilt one."""
    import itertools

    import numpy as np

    from nerfstyle_tpu import utils
    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.training.style_trainer import StyleTrainer

    # Synthetic style assets: gradient painting + 4-quadrant segment map
    # (class count matches the synthetic scene's 3 spheres + background).
    h, w = 192, 256
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    style_img = np.stack([yy, xx, 1 - yy], axis=-1).astype(np.float32)
    style_path = work / "style.png"
    utils.save_image(style_img, style_path)
    seg = (yy > 0.5).astype(np.int64) * 2 + (xx > 0.5).astype(np.int64)
    seg_path = work / "style_seg.npz"
    np.savez(seg_path, seg_map=seg)

    style_logs = work / "style_logs"
    import shutil

    shutil.rmtree(style_logs, ignore_errors=True)
    cfg = BaseConfig(
        log_dir=style_logs, data_cfg=data_cfg, ckpt=ckpt, style_image=style_path,
    )
    nargs = [
        "--max_steps", "512",  # reference README.md:59 recommendation
        "--style_seg_path", str(seg_path),
        "--intervals.print", "0",
        "--intervals.log", "0",
        "--intervals.test", "0",
        "--intervals.ckpt", "0",
        "--test_before_train",  # toggle default true -> false
    ] + os.environ.get("NERFSTYLE_BENCH_EXTRA_ARGS", "").split()
    st = StyleTrainer(cfg, nargs)
    total_iters = st.train_cfg.num_iterations  # 200 from style.yaml

    if os.environ.get("NERFSTYLE_BENCH_FULL"):
        t0 = time.perf_counter()
        st.run()
        _force(st.params["x_color_embedder"][0, 0])
        return time.perf_counter() - t0, total_iters, "measured_200"

    # Epoch 1, pose by pose.  The data iterator is a per-epoch permutation,
    # so len(train_set) iterations cover every pose (all builds + compiles)
    # once.  Re-emit the running record after each pose so the freshest JSON
    # line stays near the output tail even if the process is killed here.
    n_poses = min(len(st.train_set), total_iters)
    pose_times = []
    first_pose_idx = None
    for i in range(n_poses):
        t0 = time.perf_counter()
        st.run_iter()
        _force(st.params["x_color_embedder"][0, 0])
        pose_times.append(time.perf_counter() - t0)
        if first_pose_idx is None:
            first_pose_idx = next(iter(st._geom_cache))
        if i % 5 == 4:
            emit(result)
        if _elapsed() > STYLE_STOP * DEADLINE_S and len(pose_times) >= 2:
            print(
                f"bench: style epoch stopped early at {len(pose_times)}/"
                f"{n_poses} poses (deadline)", flush=True,
            )
            break
    measured = len(pose_times)
    epoch1_s = sum(pose_times) * n_poses / measured

    # Steady state: time iterations on a pose whose geometry cache already
    # exists (if the epoch was cut short, the iterator's next pose would pay
    # a build and poison the estimate — cycle a cached one instead).
    timed = int(os.environ.get("NERFSTYLE_BENCH_STYLE_ITERS", "4"))
    timed = min(timed, max(1, total_iters - n_poses))
    if measured < n_poses:
        st._data_iter = itertools.cycle(
            [(first_pose_idx, st.train_set[first_pose_idx])]
        )
    t0 = time.perf_counter()
    for _ in range(timed):
        st.run_iter()
    _force(st.params["x_color_embedder"][0, 0])
    per_iter = (time.perf_counter() - t0) / timed
    total_s = epoch1_s + per_iter * (total_iters - n_poses)
    how = (
        f"epoch1_{measured}of{n_poses}_poses_{sum(pose_times):.1f}s"
        f"_plus_{timed}_steady_iters_{per_iter:.1f}s_each"
    )
    return total_s, total_iters, how


def bench_render(work: Path, data_cfg: Path, ckpt: Path, out_w=1008, out_h=756):
    """Novel-view FPS at out_w x out_h (reference render.py:80-84 path)."""
    import jax.numpy as jnp
    import numpy as np

    from nerfstyle_tpu.config import (
        DatasetConfig, NetworkConfig, RendererConfig, TrainConfig, _from_dict,
    )
    from nerfstyle_tpu.core.types import DatasetSplit
    from nerfstyle_tpu.data import get_dataset
    from nerfstyle_tpu.models.fields import field_init, make_grid_spec, style_field_spec
    from nerfstyle_tpu.ops.occupancy import occupancy_persistable, occupancy_restore
    from nerfstyle_tpu.render.renderer import Renderer, RenderSettings
    from nerfstyle_tpu.training import checkpoint as ckpt_lib
    import jax

    meta, groups = ckpt_lib.load_checkpoint(ckpt)
    dataset_cfg = _from_dict(DatasetConfig, meta["dataset_cfg"])
    net_cfg = _from_dict(NetworkConfig, meta["net_cfg"])
    render_cfg = _from_dict(RendererConfig, meta["render_cfg"])
    train_cfg = _from_dict(TrainConfig, meta["train_cfg"])

    train_set = get_dataset(dataset_cfg, split=DatasetSplit.TRAIN)
    test_set = get_dataset(dataset_cfg, split=DatasetSplit.TEST, max_count=3)
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
    from nerfstyle_tpu.models.fields import with_dedup

    field_spec = with_dedup(
        field_spec, render_cfg.max_steps, np.asarray(train_set.bbox.size)
    )
    params = field_init(jax.random.PRNGKey(0), field_spec)
    params = ckpt_lib.restore_tree(params, groups["params"])

    intr = test_set.intr.scale(out_w, out_h)
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
        infer_bucket=int(os.environ.get("NERFSTYLE_INFER_BUCKET", "512")),
        infer_two_phase=(
            os.environ.get("NERFSTYLE_RENDER_MODE", "two_phase") != "incremental"
        ),
        infer_early_k1=int(
            os.environ.get(
                "NERFSTYLE_EARLY_K1", str(RenderSettings.infer_early_k1)
            )
        ),
    )
    renderer = Renderer(
        field_spec, train_set.bbox, settings, intr, float(dataset_cfg.bound),
        raymarch_channels=3 + train_set.num_classes,
        compute_dtype=jnp.bfloat16 if train_cfg.enable_amp else jnp.float32,
    )
    renderer.occ_state = occupancy_restore(
        ckpt_lib.restore_tree(occupancy_persistable(renderer.occ_state), groups["occ"]),
        settings.grid_size,
    )
    renderer._mean_count_host = int(renderer.occ_state.mean_count)
    if "renderer_static" in meta:
        renderer.load_state_dict_static(meta["renderer_static"])
    renderer.update_occ = False

    poses = [test_set[i][1] for i in range(min(3, len(test_set)))]
    # warmup frame (compiles)
    out = renderer.render(params, jnp.asarray(poses[0]), None, training=False)
    _force(out["rgb_map"][0])
    t0 = time.perf_counter()
    frames = 0
    for pose in poses[1:]:
        out = renderer.render(params, jnp.asarray(pose), None, training=False)
        _force(out["rgb_map"][0])
        frames += 1
        if _remaining() < 15.0:
            break
    dt = time.perf_counter() - t0
    counters = {
        k: int(out[k]) for k in ("num_marched", "num_live", "num_sig", "num_tail")
        if k in out
    }
    counters["mode"] = "two_phase" if settings.infer_two_phase else "incremental"
    counters["frames_timed"] = frames
    return frames / dt if dt > 0 else 0.0, (intr.w, intr.h), counters


def main():
    import jax

    # CPU smoke runs (the ambient JAX_PLATFORMS=axon plugin ignores the env
    # var, so the platform must be forced through jax.config).
    plat = os.environ.get("NERFSTYLE_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # Persistent compilation cache: the flagship graphs are large and the
    # remote TPU compile helper is slow; caching makes warmup near-free on
    # repeat runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    work = Path(os.environ.get("NERFSTYLE_BENCH_DIR", "/tmp/nerfstyle_bench"))
    data_cfg, scene_info = make_bench_scene(work)

    rays_per_sec, ckpt, train_stats, converged = bench_train(
        work, data_cfg, scene_info
    )
    result = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
        # Self-description: regime parameters so round-over-round numbers
        # are comparable without reading the script.
        "train_views": scene_info["views"],
        "scene_res": scene_info["scene_res"],
        "scene": scene_info["scene"],
        "deadline_s": DEADLINE_S,
    }
    result.update(train_stats)
    emit(result)  # the primary metric is now on record, whatever happens next

    if not converged:
        # A half-converged checkpoint is in the foggy high-demand regime:
        # its style/render graphs are oversized (measured OOM at 897
        # samples/ray) and the numbers would describe a state no user runs
        # in.  Record why and stop — the train line above is the datum.
        result["style_skipped"] = "convergence_incomplete"
        result["render_skipped"] = "convergence_incomplete"
        emit(result)
        return

    if not os.environ.get("NERFSTYLE_BENCH_SKIP_STYLE"):
        if _remaining() < 60.0:
            result["style_skipped"] = "deadline"
        else:
            try:
                style_s, style_iters, how = bench_style(work, data_cfg, ckpt, result)
                result["style_wallclock_s"] = round(style_s, 1)
                result["style_iters"] = style_iters
                result["style_measurement"] = how
                result["style_vs_target"] = round(STYLE_TARGET_S / style_s, 3)
                # Record whether the VGG ran with pretrained or random
                # filters — the style-loss-parity BASELINE row is only
                # falsifiable under pretrained weights (models/vgg.py).
                from nerfstyle_tpu.models.vgg import _find_weights

                result["style_weights"] = (
                    "pretrained" if _find_weights("vgg16") is not None else "random"
                )
            except Exception as e:  # keep the earlier metrics alive
                result["style_error"] = str(e)[:200]
        emit(result)

    if not os.environ.get("NERFSTYLE_BENCH_SKIP_RENDER"):
        if _remaining() < RENDER_MIN_S:
            result["render_skipped"] = "deadline"
        else:
            try:
                dims = os.environ.get("NERFSTYLE_BENCH_RENDER_DIMS", "1008x756")
                rw, rh = (int(v) for v in dims.split("x"))
                fps, (w, h), rc = bench_render(work, data_cfg, ckpt, out_w=rw, out_h=rh)
                result[f"render_fps_{w}x{h}"] = round(fps, 4)
                result["render_vs_target"] = round(fps / RENDER_TARGET_FPS, 4)
                result["render_counters"] = rc
            except Exception as e:
                result["render_error"] = str(e)[:200]
        emit(result)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # surface failures as a parseable line on stderr
        print(f"bench failed: {e}", file=sys.stderr)
        raise
