#!/usr/bin/env python
"""Training entry point.

Mirrors the reference CLI (``/root/reference/train.py:5-18``):

    python train.py --log-dir logs/room --data-cfg cfgs/dataset/llff_room.yaml
    python train.py --ckpt logs/room/iter_15000.ckpt \\
        --style-image style.jpg --style_seg_path style_seg.npz --max-steps 512

Any (nested) config field is overridable on the command line; unconsumed flags
chain through Dataset/Train/Network/Renderer configs and must end empty.
"""

import jax

from nerfstyle_tpu.config import BaseConfig
from nerfstyle_tpu.training.trainer import get_trainer


def train() -> None:
    cfg, nargs = BaseConfig.read_nargs()
    trainer = get_trainer(cfg, nargs)

    try:
        trainer.run()
    except KeyboardInterrupt:
        pass
    finally:
        trainer.close()


if __name__ == "__main__":
    train()
