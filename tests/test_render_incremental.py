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
    make_two_phase_renderer,
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


    def test_skewed_deep_ray_not_cut_by_loop_bound(self, setup):
        """The while_loop termination bound must cover the marcher's per-ray
        cap (max_steps), not just the mean-demand bucket: a chunk whose total
        fits the budget can still hold ONE max_steps-deep ray.  With
        samples_per_ray=8 (mean bucket) and one ray marching ~max_steps
        samples through fully-occupied space, a bound derived from the bucket
        alone exits mid-composite and silently truncates that pixel."""
        spec, params, plan, bbox, _bits, _sd, _rays = setup
        bits = jnp.ones((plan.cascade * plan.grid_size**3,), bool)
        sd = skipdist_from_bitfield(bits, plan.grid_size)
        # Ray 0 traverses the volume end to end; the rest miss the AABB
        # entirely (0 samples), so total demand fits budget = 32 * 8.
        o = np.tile(np.array([[0.0, 0.0, 10.0]], np.float32), (32, 1))
        d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (32, 1))
        o[0] = (-0.9, -0.9, -0.9)
        d[0] = (1.0, 1.0, 1.0)
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        full = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        render_inc = make_incremental_renderer(
            spec, plan, 1e-4, 1.0, round_size=8, bucket=8, samples_per_ray=8
        )
        inc = render_inc(params, OccField(bits, sd), bbox, rays, 6)
        np.testing.assert_allclose(
            np.asarray(full["rgb_map"]), np.asarray(inc["rgb_map"]),
            rtol=2e-4, atol=2e-5,
        )


class TestTwoPhaseRender:
    """Two-phase inference (density on all, color on weight-significant
    samples) vs the budgeted pipeline — see make_two_phase_renderer."""

    def test_eps_zero_matches_budgeted_render(self, setup):
        """At sig_eps=0 every w > 0 sample is color-evaluated, so the output
        equals render_rays up to fp reduction order."""
        spec, params, plan, bbox, bits, sd, rays = setup
        full = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        render_tp = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_eps=0.0, sig_per_ray=plan.max_steps
        )
        tp = render_tp(params, OccField(bits, sd), bbox, rays, 6)
        assert int(tp["num_sig"]) <= 32 * plan.max_steps
        for key, atol in (
            ("rgb_map", 2e-5), ("weights_sum", 2e-5),
            ("classes", 2e-4), ("trans_map", 2e-5),
        ):
            np.testing.assert_allclose(
                np.asarray(full[key]), np.asarray(tp[key]),
                rtol=2e-4, atol=atol, err_msg=key,
            )

    def test_default_eps_error_bounded(self, setup):
        """At the 1e-5 default, per-pixel error is bounded by
        eps * samples/ray on rgb/classes; weights_sum and depth stay exact
        (computed from the full stream)."""
        spec, params, plan, bbox, bits, sd, rays = setup
        full = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        render_tp = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_eps=1e-5, sig_per_ray=plan.max_steps
        )
        tp = render_tp(params, OccField(bits, sd), bbox, rays, 6)
        bound = 1e-5 * plan.max_steps  # eps * samples/ray
        assert (
            np.abs(np.asarray(full["rgb_map"]) - np.asarray(tp["rgb_map"])).max()
            < bound
        )
        np.testing.assert_allclose(
            np.asarray(full["weights_sum"]), np.asarray(tp["weights_sum"]),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(full["trans_map"]), np.asarray(tp["trans_map"]),
            rtol=2e-4, atol=2e-5,
        )

    def test_sharded_matches_unsharded(self, setup):
        from nerfstyle_tpu.parallel.mesh import make_mesh

        spec, params, plan, bbox, bits, sd, rays = setup
        base = make_two_phase_renderer(spec, plan, 1e-4, 1.0, sig_per_ray=64)
        sharded = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_per_ray=64, mesh=make_mesh(8)
        )
        a = base(params, OccField(bits, sd), bbox, rays, 6)
        b = sharded(params, OccField(bits, sd), bbox, rays, 6)
        for counter in ("num_points", "num_marched", "num_sig"):
            assert int(a[counter]) == int(b[counter]), counter
        for key in ("rgb_map", "weights_sum", "classes", "trans_map"):
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]), rtol=2e-4, atol=2e-5
            )

    def test_early_round_matches_single_round(self, setup):
        """2-round phase A (early_k1) is EXACT: every sample it skips has
        entering T < t_thresh (weight identically zero under the
        compositor's early-stop mask), so the output matches the
        single-round two-phase renderer."""
        spec, params, plan, bbox, bits, sd, rays = setup
        one = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_eps=0.0, sig_per_ray=plan.max_steps
        )
        two = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_eps=0.0, sig_per_ray=plan.max_steps,
            early_k1=4, tail_per_ray=plan.max_steps,
        )
        a = one(params, OccField(bits, sd), bbox, rays, 6)
        b = two(params, OccField(bits, sd), bbox, rays, 6)
        assert int(a["num_marched"]) == int(b["num_marched"])
        assert int(a["num_sig"]) == int(b["num_sig"])
        assert int(b["num_tail"]) >= 0
        # The tail round only evaluates live rays' samples past k1, so the
        # total evaluation count cannot exceed the single-round count.
        assert int(b["num_points"]) <= int(a["num_points"])
        for key in ("rgb_map", "weights_sum", "classes", "trans_map"):
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]),
                rtol=2e-4, atol=2e-5, err_msg=key,
            )

    def test_early_round_tail_overflow_reports_demand(self, setup):
        """An undersized tail capacity truncates but reports the exact
        num_tail demand; regrowing to cover it reproduces the reference
        output."""
        spec, params, plan, bbox, bits, sd, rays = setup
        small = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_per_ray=plan.max_steps,
            early_k1=2, tail_per_ray=1,
        )
        out_small = small(params, OccField(bits, sd), bbox, rays, 6)
        n_tail = int(out_small["num_tail"])
        assert n_tail > 32 * 1  # the fixture scene has deep live rays
        big = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_per_ray=plan.max_steps,
            early_k1=2, tail_per_ray=-(-n_tail // 32) + 1,
        )
        out_big = big(params, OccField(bits, sd), bbox, rays, 6)
        assert int(out_big["num_tail"]) == n_tail
        full = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        np.testing.assert_allclose(
            np.asarray(full["rgb_map"]), np.asarray(out_big["rgb_map"]),
            rtol=2e-4, atol=1e-3,  # 1e-5 default eps x 128 steps
        )

    def test_early_round_sharded_matches_unsharded(self, setup):
        from nerfstyle_tpu.parallel.mesh import make_mesh

        spec, params, plan, bbox, bits, sd, rays = setup
        kw = dict(
            sig_per_ray=64, early_k1=4, tail_per_ray=plan.max_steps,
        )
        base = make_two_phase_renderer(spec, plan, 1e-4, 1.0, **kw)
        sharded = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, mesh=make_mesh(8), **kw
        )
        a = base(params, OccField(bits, sd), bbox, rays, 6)
        b = sharded(params, OccField(bits, sd), bbox, rays, 6)
        for counter in ("num_points", "num_marched", "num_sig", "num_tail"):
            assert int(a[counter]) == int(b[counter]), counter
        for key in ("rgb_map", "weights_sum", "classes", "trans_map"):
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]), rtol=2e-4, atol=2e-5
            )

    def test_sig_overflow_reports_exact_demand(self, setup):
        """An undersized sig capacity truncates but reports the true count so
        the caller's ladder can grow; the grown render matches."""
        spec, params, plan, bbox, bits, sd, rays = setup
        small = make_two_phase_renderer(spec, plan, 1e-4, 1.0, sig_per_ray=1)
        out_small = small(params, OccField(bits, sd), bbox, rays, 6)
        n_sig = int(out_small["num_sig"])
        assert n_sig > 32 * 1  # the fixture scene has >1 significant/ray
        big = make_two_phase_renderer(
            spec, plan, 1e-4, 1.0, sig_per_ray=-(-n_sig // 32) + 1
        )
        out_big = big(params, OccField(bits, sd), bbox, rays, 6)
        assert int(out_big["num_sig"]) == n_sig
        full = render_rays(
            spec, plan, params, OccField(bits, sd), bbox, rays,
            t_thresh=1e-4, density_scale=1.0,
        )
        np.testing.assert_allclose(
            np.asarray(full["rgb_map"]), np.asarray(out_big["rgb_map"]),
            rtol=2e-4, atol=1e-3,  # 1e-5 default eps x 128 steps
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
