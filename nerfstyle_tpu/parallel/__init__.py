from .mesh import (
    build_sharded_render_loss,
    build_sharded_train_step,
    make_mesh,
)

__all__ = [
    "build_sharded_render_loss",
    "build_sharded_train_step",
    "make_mesh",
]
