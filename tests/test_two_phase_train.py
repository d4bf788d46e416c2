"""Two-phase training evaluation vs the single-phase pipeline.

The masked scan compositor (ops/compositing.py) gives samples with entering
transmittance < t_thresh weight AND gradient exactly zero (the per-ray
exclusion set is a suffix), so evaluating the differentiable field only on
the kept prefix (render/pipeline.py) must reproduce the single-phase loss
and gradients exactly — not approximately.  These tests pin that claim, the
demand counter, and truncation behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfstyle_tpu.core.types import BBox, make_rays
from nerfstyle_tpu.models.fields import field_init, style_field_spec
from nerfstyle_tpu.ops.aabb import near_far_from_aabb
from nerfstyle_tpu.ops.compositing import segment_exclusive_cumsum
from nerfstyle_tpu.ops.hashgrid import hashgrid_spec
from nerfstyle_tpu.ops.marching import MarchPlan, OccField, march_rays
from nerfstyle_tpu.ops.occupancy import skipdist_from_bitfield
from nerfstyle_tpu.render.renderer import render_rays


DENSITY_SCALE = 25.0  # strong enough that rays saturate mid-march


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
    bits = jnp.asarray(rng.random(plan.cascade * 16**3) < 0.6)
    sd = skipdist_from_bitfield(bits, 16)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 2.0, jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    rays = make_rays(o, d)
    return spec, params, plan, bbox, OccField(bits, sd), rays


def _loss(out, target):
    return jnp.mean((out["rgb_map"] - target) ** 2) + 0.1 * jnp.mean(
        out["classes"] ** 2
    )


class TestTwoPhaseTrain:
    def test_saturation_actually_occurs(self, setup):
        """The fixture must exercise real tail-dropping, or the equality
        tests below are vacuous."""
        spec, params, plan, bbox, occ, rays = setup
        full = render_rays(
            spec, plan, params, occ, bbox, rays, 1e-4, DENSITY_SCALE,
        )
        two = render_rays(
            spec, plan, params, occ, bbox, rays, 1e-4, DENSITY_SCALE,
            sig_budget=plan.budget,
        )
        n_marched = int(full["num_points"])
        n_sig = int(two["num_sig"])
        assert n_sig < n_marched * 0.8, (n_sig, n_marched)
        assert n_sig > 0

    def test_loss_and_grads_match_single_phase(self, setup):
        spec, params, plan, bbox, occ, rays = setup
        target = jnp.zeros((plan.num_rays, 3))

        def loss_single(p):
            return _loss(
                render_rays(spec, plan, p, occ, bbox, rays, 1e-4, DENSITY_SCALE),
                target,
            )

        def loss_two(p):
            return _loss(
                render_rays(
                    spec, plan, p, occ, bbox, rays, 1e-4, DENSITY_SCALE,
                    sig_budget=plan.budget,
                ),
                target,
            )

        l1, g1 = jax.value_and_grad(loss_single)(params)
        l2, g2 = jax.value_and_grad(loss_two)(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            ),
            g1, g2,
        )

    def test_num_sig_matches_transcription(self, setup):
        """num_sig == #samples with entering T >= thresh, computed here from
        the single-phase stream."""
        spec, params, plan, bbox, occ, rays = setup
        from nerfstyle_tpu.models.fields import field_density

        nears, fars = near_far_from_aabb(
            rays.origins, rays.dirs, plan.aabb, plan.min_near
        )
        samples = march_rays(plan, occ, rays, nears, fars)
        sig = field_density(spec, params, bbox, samples.xyz) * DENSITY_SCALE
        sdt = jnp.where(samples.valid, jnp.minimum(sig * plan.dt, 100.0), 0.0)
        excl = segment_exclusive_cumsum(sdt, samples.ray_id, plan.num_rays)
        expect = int(jnp.sum((jnp.exp(-excl) >= 1e-4) & samples.valid))

        two = render_rays(
            spec, plan, params, occ, bbox, rays, 1e-4, DENSITY_SCALE,
            sig_budget=plan.budget,
        )
        assert int(two["num_sig"]) == expect

    def test_truncation_is_finite_and_reports_demand(self, setup):
        """An undersized kept capacity must not NaN and must report the true
        demand so the trainer's ladder can grow."""
        spec, params, plan, bbox, occ, rays = setup
        ample = render_rays(
            spec, plan, params, occ, bbox, rays, 1e-4, DENSITY_SCALE,
            sig_budget=plan.budget,
        )
        demand = int(ample["num_sig"])
        tiny = max(8, demand // 4)
        out = render_rays(
            spec, plan, params, occ, bbox, rays, 1e-4, DENSITY_SCALE,
            sig_budget=tiny,
        )
        assert int(out["num_sig"]) == demand  # demand is pre-truncation
        assert bool(jnp.all(jnp.isfinite(out["rgb_map"])))
        g = jax.grad(
            lambda p: _loss(
                render_rays(
                    spec, plan, p, occ, bbox, rays, 1e-4, DENSITY_SCALE,
                    sig_budget=tiny,
                ),
                jnp.zeros((plan.num_rays, 3)),
            )
        )(params)
        jax.tree_util.tree_map(
            lambda a: np.testing.assert_(bool(jnp.all(jnp.isfinite(a)))), g
        )

    def test_thresh_zero_keeps_everything(self, setup):
        """t_thresh == 0 keeps every valid sample: two-phase must degenerate
        to an exact permutation-free copy of the marched stream."""
        spec, params, plan, bbox, occ, rays = setup
        full = render_rays(
            spec, plan, params, occ, bbox, rays, 0.0, DENSITY_SCALE,
        )
        two = render_rays(
            spec, plan, params, occ, bbox, rays, 0.0, DENSITY_SCALE,
            sig_budget=plan.budget,
        )
        assert int(two["num_sig"]) == int(full["num_points"])
        np.testing.assert_allclose(
            np.asarray(full["rgb_map"]), np.asarray(two["rgb_map"]),
            rtol=1e-6, atol=1e-7,
        )


class TestShardedTwoPhase:
    def test_sharded_terms_match_single_device(self, setup):
        """build_sharded_loss_terms with sig_budget == single-device
        two-phase loss terms (8 virtual CPU devices)."""
        spec, params, plan, bbox, occ, rays = setup
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from nerfstyle_tpu.parallel.mesh import (
            build_sharded_loss_terms, make_mesh,
        )

        mesh = make_mesh(8)
        terms_fn = build_sharded_loss_terms(
            mesh, spec, plan, 1e-4, DENSITY_SCALE,
            sig_budget=plan.budget,
        )
        targets = jnp.zeros((plan.num_rays, 4))
        sparse = jnp.zeros((8, 3))
        terms = jax.jit(terms_fn)(
            params, occ, bbox, rays.origins, rays.dirs, targets, sparse
        )
        ref = render_rays(
            spec, plan, params, occ, bbox, rays, 1e-4, DENSITY_SCALE,
            sig_budget=plan.budget,
        )
        np.testing.assert_allclose(
            float(terms["sq"]),
            float(jnp.sum(ref["rgb_map"] ** 2)),
            rtol=2e-4,
        )
        assert int(terms["num_sig"]) == int(ref["num_sig"])
