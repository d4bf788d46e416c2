#!/usr/bin/env python
"""Import a reference ``iter_*.pth`` checkpoint into a framework ``.ckpt``.

The reference trainer saves (``/root/reference/trainers/base.py:231-249``) a
torch pickle holding config objects (SAVE_KEYS) plus state dicts
(SD_SAVE_KEYS), of which ``renderer`` carries everything the render path
needs (``/root/reference/renderer.py:78-91``): the model tensors, the
Morton-ordered occupancy ``density_grid`` / packed ``density_bitfield``, and
the marching statistics.  This tool converts all of it to this framework's
layout:

* hash-grid tables (``x_density_embedder.embeddings`` /
  ``x_color_embedder.embeddings``): copied directly — the torch-ngp
  GridEncoder (``/root/reference/gridencoder/grid.py``) stores
  ``[total_rows, level_dim]`` with the same level offsets and index laws this
  framework transcribes (ops/hashgrid.py; parity-tested), so rows align 1:1.
* occupancy state: Morton -> linear cell order and bit-unpacking via
  ``nerfstyle_tpu.interop``; skip distances are rebuilt on restore.
* configs: the reference config objects' fields are re-serialized into this
  framework's meta dict (field names are compatible by design, config.py).
* MLP heads: tcnn FullyFusedMLP parameter blobs are packed layouts internal
  to tiny-cuda-nn and are NOT convertible offline (padded 16-wide row tiles,
  device-dependent).  Heads are freshly initialized unless ``--mlp-npz``
  supplies layer-wise matrices exported on the reference side, named
  ``<net>.<i>`` with shapes ``[d_in, d_out]`` for nets ``density_net``,
  ``color1_net``, ``color2_net``, ``class_net``.

Loading the pickle does NOT require the reference package: unresolvable
classes (its config dataclasses) are materialized as attribute-bag stubs.

Usage:
    python tools/import_reference_ckpt.py iter_060000.pth --out imported.ckpt \
        [--mlp-npz heads.npz] [--root-path /data/llff/room]

The output renders with ``render.py imported.ckpt ...`` and seeds the style
stage (``train.py --ckpt imported.ckpt --style-image ...``); training resume
starts with a fresh optimizer (no optimizer state is convertible).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _Stub:
    """Attribute bag standing in for an unimportable pickled class."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # pragma: no cover - exotic __reduce__ protocols
            self.__dict__["__state__"] = state


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


class _PickleShim:
    """pickle_module for torch.load with tolerant class resolution."""

    Unpickler = _TolerantUnpickler

    @staticmethod
    def load(f, **kw):
        return _TolerantUnpickler(f, **kw).load()


def load_reference_ckpt(path: Path):
    import torch

    return torch.load(
        path, map_location="cpu", pickle_module=_PickleShim, weights_only=False
    )


def _plain(obj):
    """Recursively convert config stubs / objects to JSON-able values."""
    import torch

    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, torch.Tensor):
        return obj.tolist()
    if isinstance(obj, Path):
        return str(obj)
    if hasattr(obj, "__dict__") and not isinstance(
        obj, (int, float, str, bool, type(None))
    ):
        return {k: _plain(v) for k, v in obj.__dict__.items() if not k.startswith("_")}
    return obj


def _cfg_dict(ref_cfg, target_cls):
    """Intersect a reference config object's fields with ``target_cls``'s."""
    import dataclasses

    plain = _plain(ref_cfg) or {}
    ours = {f.name for f in dataclasses.fields(target_cls)}
    return {k: v for k, v in plain.items() if k in ours}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("pth", type=Path, help="reference iter_*.pth checkpoint")
    ap.add_argument("--out", type=Path, required=True, help="output .ckpt path")
    ap.add_argument("--mlp-npz", type=Path, default=None,
                    help="layer-wise MLP head export (<net>.<i> arrays)")
    ap.add_argument("--root-path", type=Path, default=None,
                    help="override the dataset root recorded in the ckpt")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host work
    import jax.numpy as jnp

    from nerfstyle_tpu.config import (
        DatasetConfig, NetworkConfig, RendererConfig, TrainConfig, _from_dict,
    )
    from nerfstyle_tpu.core.types import BBox
    from nerfstyle_tpu.interop import import_reference_grid_state
    from nerfstyle_tpu.models.fields import (
        field_init, make_grid_spec, style_field_spec,
    )
    from nerfstyle_tpu.ops.occupancy import PersistedOccupancy
    from nerfstyle_tpu.training import checkpoint as ckpt_lib
    from nerfstyle_tpu.training.ema import ema_init

    sd = load_reference_ckpt(args.pth)
    ren = sd["renderer"]
    model = ren["model"]

    net_d = _cfg_dict(sd.get("net_cfg"), NetworkConfig)
    train_d = _cfg_dict(sd.get("train_cfg"), TrainConfig)
    render_d = _cfg_dict(sd.get("render_cfg"), RendererConfig)
    data_d = _cfg_dict(sd.get("dataset_cfg"), DatasetConfig)
    if args.root_path is not None:
        data_d["root_path"] = str(args.root_path)

    net_cfg = _from_dict(NetworkConfig, net_d)
    render_cfg = _from_dict(RendererConfig, render_d)

    bound = float(ren["bound"])
    # The reference derives max_bound from the dataset bbox (style_nerf.py:28);
    # ``bound`` is the marching cube half-extent, which equals it for the
    # bbox-from-radius datasets this importer targets.
    grid_spec = make_grid_spec(
        n_lvls=net_cfg.pos_enc.n_lvls,
        n_feats_per_lvl=net_cfg.pos_enc.n_feats_per_lvl,
        hashmap_size=net_cfg.pos_enc.hashmap_size,
        min_res=net_cfg.pos_enc.min_res,
        max_res_coeff=net_cfg.pos_enc.max_res_coeff,
        max_bound=2.0 * bound,
    )

    def _t2n(key):
        t = model[key]
        return np.asarray(t.detach().float().numpy(), np.float32)

    emb_d = _t2n("x_density_embedder.embeddings")
    emb_c = _t2n("x_color_embedder.embeddings")
    # class_dim is not recoverable from the tcnn class_net blob (flat packed
    # layout); the renderer records raymarch_channels = 3 + class_dim.
    rm_ch = int(ren.get("raymarch_channels", 3))
    class_dim = max(0, rm_ch - 3)

    spec = style_field_spec(
        grid_spec,
        class_dim=class_dim,
        use_dir=False,
        sh_degree=net_cfg.dir_enc_sh_deg,
        density_hidden_dims=net_cfg.density_hidden_dims,
        density_hidden_layers=net_cfg.density_hidden_layers,
        rgb_hidden_dims=net_cfg.rgb_hidden_dims,
        rgb_hidden_layers=net_cfg.rgb_hidden_layers,
        density_offset=net_cfg.density_offset,
    )
    params = field_init(jax.random.PRNGKey(net_cfg.network_seed or 0), spec)

    want = tuple(params["x_density_embedder"].shape)
    for name, emb in (("x_density_embedder", emb_d), ("x_color_embedder", emb_c)):
        if tuple(emb.shape) != want:
            raise SystemExit(
                f"{name}: reference table shape {emb.shape} != framework "
                f"{want} — pos_enc config mismatch (check hashmap_size / "
                f"n_lvls / min_res / max_res_coeff / bound)"
            )
        params[name] = jnp.asarray(emb)

    heads_loaded = []
    if args.mlp_npz is not None:
        with np.load(args.mlp_npz) as z:
            for net in ("density_net", "color1_net", "color2_net", "class_net"):
                keys = sorted(
                    (k for k in z.files if k.startswith(net + ".")),
                    key=lambda k: int(k.split(".")[1]),
                )
                if not keys:
                    continue
                mats = [jnp.asarray(np.asarray(z[k], np.float32)) for k in keys]
                have = [tuple(w.shape) for w in params[net]]
                got = [tuple(m.shape) for m in mats]
                if have != got:
                    raise SystemExit(f"{net}: npz shapes {got} != expected {have}")
                params[net] = mats
                heads_loaded.append(net)

    grid_size = int(render_cfg.grid_size)
    dg, bits = import_reference_grid_state(
        np.asarray(ren["density_grid"], np.float32),
        np.asarray(ren["density_bitfield"], np.uint8),
        grid_size,
    )
    occ = PersistedOccupancy(
        density_grid=dg,
        bitfield=bits,
        mean_density=jnp.float32(float(ren.get("mean_density", 0.0))),
        mean_count=jnp.int32(int(ren.get("mean_count", 0))),
        local_step=jnp.int32(int(ren.get("local_step", 0))),
    )

    meta = {
        "version": _plain(sd.get("version", "imported")),
        "log_dir": str(args.out.parent),
        "iter_ctr": int(sd.get("iter_ctr", 0)),
        "cfg": _plain(sd.get("cfg")) or {},
        "dataset_cfg": data_d,
        "train_cfg": train_d,
        "net_cfg": net_d,
        "render_cfg": render_d,
        "imported_from": str(args.pth),
        "imported_mlp_heads": heads_loaded,
    }
    trees = {"params": params, "occ": occ, "ema": ema_init(params)}
    args.out.parent.mkdir(parents=True, exist_ok=True)
    ckpt_lib.save_checkpoint(args.out, meta, trees)
    fresh = [n for n in ("density_net", "color1_net", "color2_net", "class_net")
             if n not in heads_loaded]
    print(f"Wrote {args.out}")
    print(f"  grid tables: imported ({want[0]} rows x {want[1]})")
    print(f"  occupancy:   imported (grid {grid_size}, "
          f"{int(np.asarray(bits).sum())} occupied cells)")
    if heads_loaded:
        print(f"  MLP heads:   imported from {args.mlp_npz}: {heads_loaded}")
    if fresh:
        print(f"  MLP heads:   FRESH INIT (tcnn blobs not convertible): {fresh}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
