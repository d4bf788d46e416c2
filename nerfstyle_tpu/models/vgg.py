"""VGG16/19 feature extractor in pure JAX.

TPU-native rebuild of the reference's torchvision-based extractor
(``/root/reference/networks/fx.py:11-96``): same node-key grammar
(``conv3_1`` / ``relu3`` — block-level keys concatenate all sublayers),
same ImageNet normalization, fp32 forward.

Weights: torchvision is unavailable in this environment and there is no
network egress, so the extractor loads pretrained weights from a local file
when present (``NERFSTYLE_VGG16_WEIGHTS`` env var, or
``~/.cache/nerfstyle/vgg16.npz``; both torchvision ``.pth`` state dicts and
``.npz`` exports are accepted — see :func:`load_torch_weights`).  Without
weights it falls back to a fixed-seed He initialization and logs a warning:
style losses remain fully functional (features are still a deep filter bank),
but stylization quality will differ from the VGG-pretrained reference until
weights are supplied.

Conv layout is NHWC internally (TPU-preferred); the public interface speaks
[N, C, H, W] like the reference.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils

logger = utils.create_logger(__name__, exit_on_error=False)

# Channel plan per block (torchvision VGG16/19 'features').
_VGG16_BLOCKS = [[64, 64], [128, 128], [256, 256, 256], [512, 512, 512], [512, 512, 512]]
_VGG19_BLOCKS = [[64, 64], [128, 128], [256, 256, 256, 256], [512, 512, 512, 512],
                 [512, 512, 512, 512]]

# torchvision 'features.N' indices of each conv layer (fx.py:90,95).
VGG16_LAYERS = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
VGG19_LAYERS = [[0, 2], [5, 7], [10, 12, 14, 16], [19, 21, 23, 25], [28, 30, 32, 34]]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _init_params(blocks: Sequence[Sequence[int]], seed: int = 7) -> List[Tuple]:
    """Deterministic He-normal fallback weights, HWIO layout."""
    key = jax.random.PRNGKey(seed)
    params = []
    c_in = 3
    for block in blocks:
        for c_out in block:
            key, k = jax.random.split(key)
            std = (2.0 / (9 * c_in)) ** 0.5
            w = jax.random.normal(k, (3, 3, c_in, c_out), jnp.float32) * std
            b = jnp.zeros((c_out,), jnp.float32)
            params.append((w, b))
            c_in = c_out
    return params


def load_manifest(kind: str) -> Dict[str, object]:
    """The committed weight manifest: required array keys, shapes, dtypes,
    and (when stamped by tools/export_vgg_weights.py on a weight-bearing
    machine) per-array SHA256 of the raw float bytes."""
    import json

    with open(Path(__file__).parent / "vgg_manifest.json") as f:
        return json.load(f)[kind]


def validate_weights(
    kind: str, raw: Dict[str, np.ndarray], layers=None, sidecar=None
) -> None:
    """Validate loaded arrays against the manifest (keys, shapes, dtypes, and
    SHA256 checksums when stamped).  ``layers`` restricts validation to the
    listed torchvision indices (truncated extractors load partial files);
    ``sidecar`` is an optional ``<weights>.manifest.json`` written by
    tools/export_vgg_weights.py carrying per-array checksums.

    Raises ValueError with a precise message on any mismatch — a silently
    wrong weight file would produce plausible-looking but non-VGG features,
    which is exactly the failure the stylization-parity BASELINE row cannot
    tolerate (ref loads torchvision directly, networks/fx.py:29-63).
    """
    import hashlib
    import json

    man = load_manifest(kind)["arrays"]
    stamped = {}
    if sidecar is not None and Path(sidecar).exists():
        with open(sidecar) as f:
            stamped = json.load(f).get("sha256", {})
    want = set(man)
    if layers is not None:
        idxs = {i for block in layers for i in block}
        want = {k for k in want if int(k.split(".")[1]) in idxs}
    missing = sorted(want - set(raw))
    if missing:
        raise ValueError(f"{kind} weight file is missing arrays: {missing[:4]}")
    for key in sorted(want):
        arr = np.asarray(raw[key])
        spec = man[key]
        if list(arr.shape) != list(spec["shape"]) or str(arr.dtype) != spec["dtype"]:
            raise ValueError(
                f"{kind} weight {key}: got {list(arr.shape)}/{arr.dtype}, "
                f"manifest says {spec['shape']}/{spec['dtype']}"
            )
        sha = stamped.get(key) or spec.get("sha256")
        if sha:
            got = hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()
            if got != sha:
                raise ValueError(f"{kind} weight {key}: SHA256 mismatch")


def load_torch_weights(path: Union[str, Path], blocks, layers, kind=None) -> List[Tuple]:
    """Convert torchvision VGG weights to HWIO conv params.

    Accepts a ``.pth`` torchvision state dict (loaded via torch-cpu) or an
    ``.npz`` with arrays named ``features.N.weight`` / ``features.N.bias``.
    When ``kind`` is given, arrays are validated against the committed
    manifest (vgg_manifest.json) before use; a sidecar
    ``<path>.manifest.json`` written by tools/export_vgg_weights.py adds
    per-array SHA256 verification.
    """
    path = Path(path)
    if path.suffix == ".npz":
        raw = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        raw = {k: v.numpy() for k, v in sd.items()}

    if kind is not None:
        validate_weights(
            kind, raw, layers=layers, sidecar=Path(str(path) + ".manifest.json")
        )

    params = []
    for block in layers:
        for idx in block:
            w = raw[f"features.{idx}.weight"]  # OIHW
            b = raw[f"features.{idx}.bias"]
            params.append((jnp.asarray(np.transpose(w, (2, 3, 1, 0))), jnp.asarray(b)))
    return params


def _find_weights(kind: str) -> Union[Path, None]:
    """Locate pretrained weights for ``kind`` ("vgg16"/"vgg19").

    Search order: NERFSTYLE_VGG16_WEIGHTS env var, ~/.cache/nerfstyle/
    (the export-tool drop point), then the standard torch hub checkpoint
    cache (where a plain ``torchvision.models.vgg16(weights=...)`` run
    leaves its download, e.g. ~/.cache/torch/hub/checkpoints/
    vgg16-397923af.pth).  Any hit is manifest-validated at load time
    (validate_weights), so a wrong or corrupt file fails loudly rather
    than stylizing with silently-wrong features."""
    env = os.environ.get(f"NERFSTYLE_{kind.upper()}_WEIGHTS")
    if env and Path(env).exists():
        return Path(env)
    for suffix in (".npz", ".pth"):
        p = Path.home() / ".cache" / "nerfstyle" / f"{kind}{suffix}"
        if p.exists():
            return p
    torch_home = Path(
        os.environ.get("TORCH_HOME", Path.home() / ".cache" / "torch")
    )
    hits = sorted((torch_home / "hub" / "checkpoints").glob(f"{kind}-*.pth"))
    if hits:
        return hits[0]
    return None


class VGGFeatureExtractor:
    """Feature extractor with the reference's key grammar (fx.py:19-57)."""

    kind = "vgg16"
    blocks = _VGG16_BLOCKS
    layers = VGG16_LAYERS

    def __init__(self, keys: Union[str, List[str]]):
        if isinstance(keys, str):
            keys = [keys]

        # Parse requested keys into (out_key, [taps]) where a tap is
        # (block_idx, layer_idx_in_block, want_relu).
        import re

        self.keys: List[Tuple[str, List[Tuple[int, int, bool]]]] = []
        pattern = r"^(conv|relu)([1-5])(?:_([1-4]))?$"
        for kname in keys:
            m = re.match(pattern, kname)
            if not m:
                raise ValueError(f'"{kname}" is an invalid identifier')
            op, block_s, layer_s = m.groups()
            want_relu = op == "relu"
            b = int(block_s) - 1
            if layer_s is None:
                taps = [(b, i, want_relu) for i in range(len(self.layers[b]))]
            else:
                taps = [(b, int(layer_s) - 1, want_relu)]
            self.keys.append((kname, taps))

        self._max_block = max(b for _, taps in self.keys for b, _, _ in taps)

        # Only the blocks up to the deepest requested tap are ever run, so
        # only those weights are loaded (a relu3-only extractor works with a
        # weight file holding just blocks 1-3; the reference's
        # create_feature_extractor truncates the graph the same way).
        used_blocks = self.blocks[: self._max_block + 1]
        used_layers = self.layers[: self._max_block + 1]
        weights_path = _find_weights(self.kind)
        self.pretrained = weights_path is not None
        if weights_path is not None:
            self.params = load_torch_weights(
                weights_path, used_blocks, used_layers, kind=self.kind
            )
            logger.info("Loaded %s weights from %s", self.kind, weights_path)
        else:
            self.params = _init_params(used_blocks)
            logger.warning(
                "No pretrained %s weights found (set NERFSTYLE_%s_WEIGHTS); "
                "using fixed-seed random filters — style losses remain "
                "functional but differ from VGG-pretrained behavior.",
                self.kind, self.kind.upper(),
            )

        self._fn = jax.jit(self._forward)

    def _forward(self, x_nchw: jnp.ndarray) -> Dict[Tuple[int, int, bool], jnp.ndarray]:
        """Run the conv stack, returning every needed tap (NHWC internally)."""
        x = jnp.moveaxis(x_nchw.astype(jnp.float32), 1, -1)  # NHWC
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)
        x = (x - mean) / std

        needed = {(b, i, r) for _, taps in self.keys for b, i, r in taps}
        taps: Dict[Tuple[int, int, bool], jnp.ndarray] = {}
        p = 0
        for b, block in enumerate(self.blocks):
            if b > self._max_block:
                break
            for i, _c in enumerate(block):
                w, bias = self.params[p]
                p += 1
                x = jax.lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = x + bias
                if (b, i, False) in needed:
                    taps[(b, i, False)] = x
                x = jnp.maximum(x, 0.0)
                if (b, i, True) in needed:
                    taps[(b, i, True)] = x
            # 2x2 max pool stride 2
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        return taps

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: [C, H, W] or [N, C, H, W] in [0, 1] -> {key: [N, C', H', W']}
        (fx.py:64-86)."""
        if x.ndim == 3:
            x = x[None]
        taps = self._fn(x)
        out = {}
        for kname, tap_list in self.keys:
            feats = [jnp.moveaxis(taps[t], -1, 1) for t in tap_list]
            out[kname] = jnp.concatenate(feats, axis=1)
        return out


class VGG16FeatureExtractor(VGGFeatureExtractor):
    kind = "vgg16"
    blocks = _VGG16_BLOCKS
    layers = VGG16_LAYERS


class VGG19FeatureExtractor(VGGFeatureExtractor):
    kind = "vgg19"
    blocks = _VGG19_BLOCKS
    layers = VGG19_LAYERS


def test_fx(fx_type: str, h: int = 224, w: int = 224):
    """Manual smoke harness (parity with fx.py:99-122)."""
    cls = {"vgg16": VGG16FeatureExtractor, "vgg19": VGG19FeatureExtractor}[fx_type]
    all_layers = [
        f"conv{i + 1}_{j + 1}" for i, lvl in enumerate(cls.layers) for j in range(len(lvl))
    ] + [f"conv{i + 1}" for i in range(len(cls.layers))]
    fx = cls(all_layers)
    out = fx(jnp.zeros((1, 3, h, w)))
    for k, v in out.items():
        print(f"Feature: {k}, size: {tuple(v.shape)}")


if __name__ == "__main__":
    import sys

    test_fx(sys.argv[1] if len(sys.argv) > 1 else "vgg16")
