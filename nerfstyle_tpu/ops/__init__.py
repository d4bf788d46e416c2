from .aabb import near_far_from_aabb
from .compositing import composite_rays
from .hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init, hashgrid_spec
from .marching import MarchPlan, march_rays
from .mlp import mlp_apply, mlp_init, trunc_exp
from .morton import morton3d, morton3d_invert
from .occupancy import OccupancyState, occupancy_init, packbits, unpackbits
from .sh import sh_encode

__all__ = [
    "HashGridSpec",
    "MarchPlan",
    "OccupancyState",
    "composite_rays",
    "hashgrid_encode",
    "hashgrid_init",
    "hashgrid_spec",
    "march_rays",
    "mlp_apply",
    "mlp_init",
    "morton3d",
    "morton3d_invert",
    "near_far_from_aabb",
    "occupancy_init",
    "packbits",
    "sh_encode",
    "trunc_exp",
    "unpackbits",
]
