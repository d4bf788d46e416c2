#!/usr/bin/env python
"""Novel-view rendering from a checkpoint.

Mirrors the reference CLI (``/root/reference/render.py:20-113``): every config
is read from the checkpoint; optional ``--out-dims W H`` re-renders at a scaled
resolution (common.py:92-114 law); ``--max-count`` caps the number of frames.

    python render.py logs/room/iter_15000.ckpt --out-dims 1008 756
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from nerfstyle_tpu import utils
from nerfstyle_tpu.config import (
    DatasetConfig,
    NetworkConfig,
    RendererConfig,
    TrainConfig,
    _from_dict,
)
from nerfstyle_tpu.core.types import DatasetSplit
from nerfstyle_tpu.data import get_dataset
from nerfstyle_tpu.models.fields import (
    field_init, make_grid_spec, style_field_spec, with_dedup,
)
from nerfstyle_tpu.render.renderer import Renderer, RenderSettings
from nerfstyle_tpu.training import checkpoint as ckpt_lib

logger = utils.create_logger("render")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt_path", type=Path)
    parser.add_argument("--out-dir", type=Path, default=None)
    parser.add_argument("--out-dims", type=int, nargs=2, default=None,
                        help="render resolution W H (rescales intrinsics)")
    parser.add_argument("--max-count", type=int, default=None)
    parser.add_argument("--depth", action="store_true", help="also save depth maps")
    parser.add_argument("--yes", action="store_true",
                        help="assume yes for confirmation prompts")
    args = parser.parse_args()

    meta, groups = ckpt_lib.load_checkpoint(args.ckpt_path)
    dataset_cfg = _from_dict(DatasetConfig, meta["dataset_cfg"])
    net_cfg = _from_dict(NetworkConfig, meta["net_cfg"])
    render_cfg = _from_dict(RendererConfig, meta["render_cfg"])
    train_cfg = _from_dict(TrainConfig, meta["train_cfg"])

    out_dir = args.out_dir
    if out_dir is None:
        out_dir = Path(meta["log_dir"]) / f"render_{args.ckpt_path.stem}"
    out_dir.mkdir(parents=True, exist_ok=True)
    # Overwrite guard for a non-empty output dir (reference render.py:51-57).
    if next(out_dir.iterdir(), None) is not None:
        if utils.prompt_bool(
            f'Output directory "{out_dir}" is not empty. Clean directory?',
            assume_yes=args.yes,
        ):
            utils.rmtree(out_dir)
            out_dir.mkdir()
        else:
            logger.info("Keeping existing files; renders may mix with them.")

    # Train split only for num_classes (render.py:60-65), then the test poses.
    train_set = get_dataset(dataset_cfg, split=DatasetSplit.TRAIN)
    test_set = get_dataset(dataset_cfg, split=DatasetSplit.TEST, max_count=args.max_count)
    logger.info("Loaded %s", str(test_set))

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
        grid_spec,
        class_dim=train_set.num_classes,
        use_dir=False,
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
    import jax

    params = field_init(jax.random.PRNGKey(0), field_spec)
    params = ckpt_lib.restore_tree(params, groups["params"])

    intr = test_set.intr
    if args.out_dims is not None:
        intr = intr.scale(*args.out_dims)  # aspect-preserving (common.py:92-114)
        logger.info("Rendering at %dx%d", intr.w, intr.h)

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
    )
    renderer = Renderer(
        field_spec, train_set.bbox, settings, intr, float(dataset_cfg.bound),
        raymarch_channels=3 + train_set.num_classes,
        compute_dtype=jnp.bfloat16 if train_cfg.enable_amp else jnp.float32,
    )
    from nerfstyle_tpu.ops.occupancy import occupancy_persistable, occupancy_restore

    renderer.occ_state = occupancy_restore(
        ckpt_lib.restore_tree(occupancy_persistable(renderer.occ_state), groups["occ"]),
        settings.grid_size,
    )
    renderer._mean_count_host = int(renderer.occ_state.mean_count)
    renderer._local_step_host = int(renderer.occ_state.local_step)
    if "renderer_static" in meta:
        renderer.load_state_dict_static(meta["renderer_static"])
    renderer.update_occ = False
    if jax.device_count() > 1:
        # Shard each render chunk's rays across the slice (parallel/mesh.py).
        from nerfstyle_tpu.parallel.mesh import make_mesh

        renderer.mesh = make_mesh()
        logger.info("Rendering data-parallel over %d devices", jax.device_count())

    import time

    h, w = intr.h, intr.w
    t_total = 0.0
    for i in range(len(test_set)):
        _, pose = test_set[i]
        t0 = time.perf_counter()
        output = renderer.render(params, jnp.asarray(pose), None, training=False)
        rgb = np.asarray(output["rgb_map"])  # sync
        t_total += time.perf_counter() - t0
        utils.save_image(rgb.reshape(h, w, 3), out_dir / f"{test_set.fns[i]}.png")
        if args.depth:
            depth = np.asarray(output["trans_map"]).reshape(h, w)
            utils.save_image(depth[..., None].repeat(3, -1), out_dir / f"{test_set.fns[i]}_depth.png")
        logger.info("Rendered %s", test_set.fns[i])

    fps = len(test_set) / t_total if t_total > 0 else 0.0
    logger.info("Done: %d frames, %.2f FPS at %dx%d -> %s", len(test_set), fps, w, h, out_dir)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        pass
