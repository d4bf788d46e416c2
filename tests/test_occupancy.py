"""Occupancy-grid maintenance + packbits + stratified-sampling oracle tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.core.types import BBox, RotatedBBox, VoxelOccupancyMap, make_rays
from nerfstyle_tpu.ops.occupancy import (
    all_cell_coords,
    cell_linear_index,
    occupancy_init,
    occupancy_update_full,
    occupancy_update_random,
    packbits,
    unpackbits,
    update_mean_count,
)
from nerfstyle_tpu.ops.stratified import integrate_points, sample_points


class TestPackbits:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.random(1024) < 0.3)
        packed = packbits(bits)
        assert packed.shape == (128,) and packed.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(unpackbits(packed)), np.asarray(bits))

    def test_lsb_first(self):
        bits = jnp.asarray([True] + [False] * 7)
        assert int(packbits(bits)[0]) == 1
        bits = jnp.asarray([False] * 7 + [True])
        assert int(packbits(bits)[0]) == 128


class TestCellIndexing:
    def test_linear_index_matches_order(self):
        coords = jnp.asarray(all_cell_coords(4))
        idx = cell_linear_index(coords, 4)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(64))


def _const_sigma_fn(value):
    def f(pts):
        return jnp.full(pts.shape[:1], value)

    return f


class TestOccupancyUpdate:
    def test_full_update_marks_occupied(self):
        state = occupancy_init(cascade=1, grid_size=8)
        state = occupancy_update_full(
            state, _const_sigma_fn(100.0), jax.random.PRNGKey(0),
            bound=1.0, density_scale=1.0, density_decay=0.95, density_thresh=10.0,
            chunk=64,
        )
        assert float(state.mean_density) > 0
        assert bool(jnp.all(state.bitfield))

    def test_full_update_empty_scene(self):
        state = occupancy_init(cascade=1, grid_size=8)
        state = occupancy_update_full(
            state, _const_sigma_fn(0.0), jax.random.PRNGKey(0),
            bound=1.0, density_scale=1.0, density_decay=0.95, density_thresh=10.0,
            chunk=64,
        )
        assert not bool(jnp.any(state.bitfield))

    def test_decay_max_merge(self):
        """grid <- max(grid*decay, new): occupied cells decay when re-probed lower."""
        state = occupancy_init(cascade=1, grid_size=8)
        kwargs = dict(bound=1.0, density_scale=1.0, density_decay=0.5,
                      density_thresh=10.0, chunk=64)
        state = occupancy_update_full(state, _const_sigma_fn(100.0), jax.random.PRNGKey(0), **kwargs)
        d0 = float(state.density_grid.max())
        state = occupancy_update_full(state, _const_sigma_fn(0.0), jax.random.PRNGKey(1), **kwargs)
        d1 = float(state.density_grid.max())
        np.testing.assert_allclose(d1, d0 * 0.5, rtol=1e-5)

    def test_random_update_runs(self):
        state = occupancy_init(cascade=2, grid_size=8)
        state = occupancy_update_full(
            state, _const_sigma_fn(50.0), jax.random.PRNGKey(0),
            bound=2.0, density_scale=1.0, density_decay=0.95, density_thresh=10.0,
            chunk=64,
        )
        state2 = occupancy_update_random(
            state, _const_sigma_fn(50.0), jax.random.PRNGKey(1),
            bound=2.0, density_scale=1.0, density_decay=0.95, density_thresh=10.0,
        )
        assert float(state2.mean_density) > 0

    def test_mean_count_ema(self):
        state = occupancy_init(1, 8)
        state = update_mean_count(state, jnp.asarray(1000))
        assert int(state.mean_count) == 1000  # first sample adopts value
        state = update_mean_count(state, jnp.asarray(0))
        assert 0 < int(state.mean_count) < 1000


class TestStratifiedOracle:
    """The legacy dense path doubles as a correctness oracle for the
    segment-scan compositor (SURVEY.md section 4(b))."""

    def test_sample_points_in_range(self):
        rays = make_rays(jnp.zeros((4, 3)), jnp.ones((4, 3)))
        pts, dists = sample_points(rays, 0.5, 2.0, 16, jax.random.PRNGKey(0))
        assert pts.shape == (4, 16, 3)
        t = jnp.linalg.norm(pts, axis=-1)
        assert float(t.min()) >= 0.5 - 1e-5
        assert float(t.max()) <= 2.0 + 1e-5
        assert float(dists[:, -1].min()) == 1e10

    def test_integrate_matches_composite(self):
        """Dense integration == segment compositor on identical samples."""
        from nerfstyle_tpu.ops.compositing import composite_rays
        from nerfstyle_tpu.ops.marching import SampleBatch

        rng = np.random.default_rng(0)
        n, k = 4, 8
        dt = 0.1
        sig = jnp.asarray(rng.random((n, k)) * 5, jnp.float32)
        rgb = jnp.asarray(rng.random((n, k, 3)), jnp.float32)

        dists = jnp.full((n, k), dt)
        rgb_map, acc, _ = integrate_points(
            dists, rgb, sig,
            jnp.zeros((n, 3)), jnp.zeros((n, 1)), jnp.ones((n, 1)),
        )

        batch = SampleBatch(
            xyz=jnp.zeros((n * k, 3)), dirs=jnp.zeros((n * k, 3)),
            tau=jnp.zeros(n * k),
            ray_id=jnp.repeat(jnp.arange(n, dtype=jnp.int32), k),
            valid=jnp.ones(n * k, bool), num_kept=jnp.asarray(n * k),
            num_cand=jnp.zeros((), jnp.int32),
        )
        out = composite_rays(sig.reshape(-1), rgb.reshape(-1, 3), batch, n, dt, t_thresh=0.0)
        np.testing.assert_allclose(np.asarray(out.image), np.asarray(rgb_map), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.weights_sum), np.asarray(acc)[:, 0], rtol=1e-4, atol=1e-5
        )


class TestGeometryTypes:
    def test_rotated_bbox_containment(self):
        # axis-aligned unit cube; winding chosen so face normals point inward
        # (the convention the containment test expects: v3 above v4)
        pts = np.array([
            [0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1],
            [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 0],
        ], dtype=np.float32)
        box = RotatedBBox.from_corners(pts)
        inside = box.contains(jnp.asarray([[0.5, 0.5, 0.5]]))
        outside = box.contains(jnp.asarray([[1.5, 0.5, 0.5]]))
        assert bool(inside[0]) != bool(outside[0])

    def test_voxel_map_query(self):
        grid = np.zeros((4, 4, 4), bool)
        grid[1, 2, 3] = True
        m = VoxelOccupancyMap.from_dense(grid, np.zeros(3), np.ones(3) * 4)
        hit = m.query(jnp.asarray([[1.5, 2.5, 3.5]]))
        miss = m.query(jnp.asarray([[0.5, 0.5, 0.5]]))
        oob = m.query(jnp.asarray([[9.0, 0.0, 0.0]]))
        assert bool(hit[0]) and not bool(miss[0]) and not bool(oob[0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestPersistedOccupancy:
    def test_skipdist_not_persisted_and_rebuilt(self):
        """Checkpoints carry exactly the reference's occupancy fields
        (renderer.py:78-91); skipdist is derived and must be rebuilt
        identically on restore."""
        import jax
        from nerfstyle_tpu.ops.occupancy import (
            OccupancyState,
            occupancy_init,
            occupancy_persistable,
            occupancy_restore,
            skipdist_from_bitfield,
        )

        h = 16
        state = occupancy_init(1, h)
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.random(h**3) < 0.2)
        state = state._replace(
            bitfield=bits, skipdist=skipdist_from_bitfield(bits, h)
        )
        p = occupancy_persistable(state)
        leaves = jax.tree_util.tree_leaves(p)
        assert len(leaves) == 5  # format parity: no skipdist leaf
        restored = occupancy_restore(p, h)
        np.testing.assert_array_equal(
            np.asarray(restored.skipdist), np.asarray(state.skipdist)
        )
        np.testing.assert_array_equal(
            np.asarray(restored.bitfield), np.asarray(state.bitfield)
        )
