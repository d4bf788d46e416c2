"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerfstyle_tpu.core.types import BBox, make_rays
from nerfstyle_tpu.models.fields import field_init, style_field_spec
from nerfstyle_tpu.ops.hashgrid import hashgrid_spec
from nerfstyle_tpu.ops.marching import MarchPlan
from nerfstyle_tpu.parallel.mesh import (
    build_sharded_render_loss,
    build_sharded_train_step,
    make_mesh,
    shard_ray_arrays,
)


@pytest.fixture(scope="module")
def tiny_setup():
    grid = hashgrid_spec(3, 2, 8, per_level_scale=1.5, log2_hashmap_size=8)
    spec = style_field_spec(grid, class_dim=3)
    params = field_init(jax.random.PRNGKey(0), spec)
    plan = MarchPlan(
        bound=1.0, cascade=1, grid_size=8, max_steps=16,
        num_rays=64, budget=64 * 8, min_near=0.05,
    )
    bbox = BBox.from_radius(1.0)
    bitfield = jnp.asarray(
        np.random.default_rng(0).random(plan.cascade * 8**3) < 0.6
    )
    key = jax.random.PRNGKey(1)
    o = jax.random.normal(key, (plan.num_rays, 3)) * 2.0
    d = jax.random.normal(jax.random.PRNGKey(2), (plan.num_rays, 3))
    rays = make_rays(o, d)
    targets = jax.random.uniform(jax.random.PRNGKey(3), (plan.num_rays, 4))
    targets = targets.at[:, 3].set(jnp.floor(targets[:, 3] * 3))
    return spec, params, plan, bbox, bitfield, rays, targets


class TestSharded:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_sharded_loss_matches_single_device(self, tiny_setup):
        spec, params, plan, bbox, bitfield, rays, targets = tiny_setup

        mesh8 = make_mesh(8)
        mesh1 = make_mesh(1)
        loss8 = build_sharded_render_loss(mesh8, spec, plan, 1e-4, 1.0, 0.001)
        loss1 = build_sharded_render_loss(mesh1, spec, plan, 1e-4, 1.0, 0.001)

        v8 = float(loss8(params, bitfield, bbox, rays.origins, rays.dirs, targets))
        v1 = float(loss1(params, bitfield, bbox, rays.origins, rays.dirs, targets))
        # Same math; shard-local compaction budgets can differ only if a shard
        # overflows its budget — sized here so none do.
        np.testing.assert_allclose(v8, v1, rtol=1e-5)

    def test_sharded_grads_match(self, tiny_setup):
        spec, params, plan, bbox, bitfield, rays, targets = tiny_setup
        mesh8 = make_mesh(8)
        mesh1 = make_mesh(1)
        loss8 = build_sharded_render_loss(mesh8, spec, plan, 1e-4, 1.0, 0.0)
        loss1 = build_sharded_render_loss(mesh1, spec, plan, 1e-4, 1.0, 0.0)
        g8 = jax.grad(loss8)(params, bitfield, bbox, rays.origins, rays.dirs, targets)
        g1 = jax.grad(loss1)(params, bitfield, bbox, rays.origins, rays.dirs, targets)
        for k in ("x_density_embedder", "x_color_embedder"):
            np.testing.assert_allclose(
                np.asarray(g8[k]), np.asarray(g1[k]), rtol=1e-4, atol=1e-8
            )

    def test_sharded_train_step_runs(self, tiny_setup):
        spec, params, plan, bbox, bitfield, rays, targets = tiny_setup
        mesh = make_mesh(8)
        optim = optax.adam(1e-2, eps=1e-15)
        opt_state = optim.init(params)
        step = build_sharded_train_step(mesh, spec, plan, optim, class_lambda=0.001)
        o, d, t = shard_ray_arrays(mesh, rays.origins, rays.dirs, targets)
        p2, os2, loss = step(params, opt_state, bitfield, bbox, o, d, t)
        assert np.isfinite(float(loss))
        # params actually changed
        delta = np.abs(
            np.asarray(p2["x_density_embedder"]) - np.asarray(params["x_density_embedder"])
        ).max()
        assert delta > 0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
