#!/usr/bin/env python
"""Export torchvision VGG16/19 pretrained weights to the npz format the
framework's feature extractor loads.

Run this ONCE on any machine with torchvision + network access, then copy the
npz next to the training host:

    python tools/export_vgg_weights.py vgg16 ~/.cache/nerfstyle/vgg16.npz

The extractor looks for weights at ``$NERFSTYLE_VGG16_WEIGHTS`` or
``~/.cache/nerfstyle/vgg16.npz`` (nerfstyle_tpu/models/vgg.py:_find_weights).
Raw torchvision ``.pth`` state dicts are also accepted directly — this export
just drops the classifier head (528 MB -> 56 MB) and removes the torch
dependency at load time.

Numerical parity of the load path is guarded by tests/test_vgg_golden.py.
"""

import sys
from pathlib import Path

import numpy as np


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "vgg16"
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path.home() / ".cache" / "nerfstyle" / f"{kind}.npz"
    )
    import torchvision

    model = getattr(torchvision.models, kind)(weights="IMAGENET1K_V1")
    arrays = {}
    for name, p in model.features.state_dict().items():
        arrays[f"features.{name}"] = p.numpy()
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **arrays)
    print(f"wrote {len(arrays)} arrays to {out}")

    # SHA256 sidecar: validate_weights() (models/vgg.py) verifies every
    # array's raw-byte digest against this at load time, so a corrupt or
    # wrong-provenance file fails loudly instead of stylizing with
    # silently-wrong features.
    import hashlib
    import json

    sidecar = Path(str(out) + ".manifest.json")
    digests = {
        k: hashlib.sha256(np.ascontiguousarray(v).tobytes()).hexdigest()
        for k, v in arrays.items()
    }
    sidecar.write_text(json.dumps({"kind": kind, "sha256": digests}, indent=1))
    print(f"wrote checksum sidecar {sidecar}")


if __name__ == "__main__":
    main()
