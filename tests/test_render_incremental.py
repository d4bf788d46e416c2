"""Incremental (alive-ray) inference renderer vs the budgeted pipeline.

The reference's inference loop (renderer.py:237-293) never truncates a ray's
samples; our incremental path must reproduce the budgeted render_rays output
exactly whenever the budget is ample, and must keep working when the budget
WOULD have truncated.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfstyle_tpu.core.types import BBox, make_rays
from nerfstyle_tpu.models.fields import field_init, style_field_spec
from nerfstyle_tpu.ops.hashgrid import hashgrid_spec
from nerfstyle_tpu.ops.marching import MarchPlan, OccField
from nerfstyle_tpu.ops.occupancy import skipdist_from_bitfield
from nerfstyle_tpu.render.renderer import (
    make_incremental_renderer,
    render_rays,
)


@pytest.fixture(scope="module")
def setup():
    grid = hashgrid_spec(4, 2, 8, per_level_scale=1.5, log2_hashmap_size=10)
    spec = style_field_spec(grid, class_dim=3)
    params = field_init(jax.random.PRNGKey(0), spec)
    plan = MarchPlan(
        bound=1.0, cascade=1, grid_size=16, max_steps=128,
        num_rays=32, budget=32 * 128, min_near=0.05,
    )
    bbox = BBox.from_radius(1.0)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.random(plan.cascade * 16**3) < 0.4)
    sd = skipdist_from_bitfield(bits, 16)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 2.0, jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    rays = make_rays(o, d)
    return spec, params, plan, bbox, bits, sd, rays


class TestIncrementalRender:
    def test_matches_budgeted_render(self, setup):
        spec, params, plan, bbox, bits, sd, rays = setup
        full = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        render_inc = make_incremental_renderer(
            spec, plan, 1e-4, 1.0, round_size=16, bucket=8
        )
        inc = render_inc(params, OccField(bits, sd), bbox, rays, 6)
        np.testing.assert_allclose(
            np.asarray(full["rgb_map"]), np.asarray(inc["rgb_map"]),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(full["weights_sum"]), np.asarray(inc["weights_sum"]),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(full["classes"]), np.asarray(inc["classes"]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(full["trans_map"]), np.asarray(inc["trans_map"]),
            rtol=2e-4, atol=2e-5,
        )

    def test_sharded_incremental_matches_unsharded(self, setup):
        """The shard_map-wrapped chunk renderer (per-device alive loops) must
        reproduce the single-device incremental output."""
        from nerfstyle_tpu.parallel.mesh import make_mesh

        spec, params, plan, bbox, bits, sd, rays = setup
        base = make_incremental_renderer(spec, plan, 1e-4, 1.0, round_size=16, bucket=8)
        sharded = make_incremental_renderer(
            spec, plan, 1e-4, 1.0, round_size=16, bucket=8, mesh=make_mesh(8)
        )
        a = base(params, OccField(bits, sd), bbox, rays, 6)
        b = sharded(params, OccField(bits, sd), bbox, rays, 6)
        assert int(a["num_points"]) == int(b["num_points"])
        for key in ("rgb_map", "weights_sum", "classes", "trans_map"):
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]), rtol=2e-4, atol=2e-5
            )

    def test_no_truncation_under_tiny_budget(self, setup):
        """With a starved budget the budgeted path drops late rays' samples;
        the incremental path defaults its march budget to max_steps/ray (the
        per-ray cap itself) and so can never truncate."""
        spec, params, plan, bbox, bits, sd, rays = setup
        starved = MarchPlan(
            bound=plan.bound, cascade=plan.cascade, grid_size=plan.grid_size,
            max_steps=plan.max_steps, num_rays=plan.num_rays,
            budget=64, min_near=plan.min_near,
        )
        full_ample = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        render_inc = make_incremental_renderer(
            spec, starved, 1e-4, 1.0, round_size=16, bucket=8
        )
        inc = render_inc(params, OccField(bits, sd), bbox, rays, 6)
        np.testing.assert_allclose(
            np.asarray(full_ample["rgb_map"]), np.asarray(inc["rgb_map"]),
            rtol=2e-4, atol=2e-5,
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
