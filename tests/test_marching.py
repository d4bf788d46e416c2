"""Ray marching + compositing tests against slow per-ray numpy references."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.core.types import make_rays
from nerfstyle_tpu.ops.aabb import near_far_from_aabb
from nerfstyle_tpu.ops.compositing import composite_rays, segment_exclusive_cumsum
from nerfstyle_tpu.ops.marching import MarchPlan, SampleBatch, march_rays, occupancy_lookup

SQRT3 = math.sqrt(3.0)


def _ref_march_one_ray(o, d, near, far, bitfield, bound, cascade, h, max_steps, mip_dt):
    """Scalar transcription of the march loop semantics with dt_gamma=0
    (raymarching.cu:449-501): advance on the uniform lattice, keep occupied."""
    dt = 2 * SQRT3 / max_steps
    kept = []
    t = near
    steps = 0
    while t < far and steps < max_steps:
        x = np.clip(o + t * d, -bound, bound)
        mx = np.max(np.abs(x))
        e = np.frexp(mx)[1] if mx > 0 else 0
        level = min(cascade - 1, max(0, max(e, mip_dt)))
        mip_bound = min(2.0**level, bound)
        c = np.clip((0.5 * (x / mip_bound + 1) * h).astype(np.int64), 0, h - 1)
        idx = level * h**3 + (c[0] * h + c[1]) * h + c[2]
        if bitfield[idx]:
            kept.append(t)
            steps += 1
        t += dt  # voxel skip also advances on the lattice (cu:497-499)
    return kept


def _make_plan(n, bound=1.0, h=16, max_steps=64, budget=None):
    cascade = 1 + max(0, math.ceil(math.log2(bound)))
    return MarchPlan(
        bound=bound, cascade=cascade, grid_size=h, max_steps=max_steps,
        num_rays=n, budget=budget or n * max_steps, min_near=0.05,
    )


class TestMarch:
    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(0)
        plan = _make_plan(8, bound=1.0, h=16, max_steps=64)
        bitfield = rng.random(plan.cascade * 16**3) < 0.3

        o = rng.normal(size=(8, 3)).astype(np.float32) * 2
        d = rng.normal(size=(8, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)
        batch = march_rays(plan, jnp.asarray(bitfield), rays, nears, fars)

        nears_np, fars_np = np.asarray(nears), np.asarray(fars)
        got_by_ray = {r: [] for r in range(8)}
        for i in range(plan.budget):
            if bool(batch.valid[i]):
                got_by_ray[int(batch.ray_id[i])].append(float(batch.tau[i]))

        for r in range(8):
            if nears_np[r] > 1e30:
                assert got_by_ray[r] == []
                continue
            want_t = _ref_march_one_ray(
                o[r], np.asarray(rays.dirs)[r], nears_np[r], fars_np[r],
                bitfield, plan.bound, plan.cascade, plan.grid_size,
                plan.max_steps, plan.mip_dt_level,
            )
            want_tau = [t + plan.dt - nears_np[r] for t in want_t]
            np.testing.assert_allclose(got_by_ray[r], want_tau, rtol=1e-4, atol=1e-5)

    def test_empty_grid_no_samples(self):
        plan = _make_plan(4, h=8, max_steps=32)
        bitfield = jnp.zeros(plan.cascade * 8**3, jnp.bool_)
        rays = make_rays(jnp.asarray([[0.0, 0.0, -3.0]] * 4), jnp.asarray([[0.0, 0.0, 1.0]] * 4))
        nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)
        batch = march_rays(plan, bitfield, rays, nears, fars)
        assert int(batch.num_kept) == 0
        assert not bool(jnp.any(batch.valid))

    def test_full_grid_respects_max_steps(self):
        plan = _make_plan(2, h=8, max_steps=16)
        bitfield = jnp.ones(plan.cascade * 8**3, jnp.bool_)
        rays = make_rays(jnp.asarray([[0.0, 0.0, -3.0]] * 2), jnp.asarray([[0.0, 0.0, 1.0]] * 2))
        nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)
        batch = march_rays(plan, bitfield, rays, nears, fars)
        counts = np.bincount(np.asarray(batch.ray_id)[np.asarray(batch.valid)], minlength=3)
        assert np.all(counts[:2] <= plan.max_steps)

    def test_ray_major_ordering(self):
        rng = np.random.default_rng(1)
        plan = _make_plan(16, h=8, max_steps=32)
        bitfield = jnp.asarray(rng.random(plan.cascade * 8**3) < 0.5)
        o = rng.normal(size=(16, 3)).astype(np.float32) * 2
        d = rng.normal(size=(16, 3)).astype(np.float32)
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)
        batch = march_rays(plan, bitfield, rays, nears, fars)
        rid = np.asarray(batch.ray_id)
        valid = np.asarray(batch.valid)
        assert np.all(np.diff(rid) >= 0)  # sorted, padding (=N) at end
        assert np.all(rid[~valid] == 16)


def _ref_composite(sigmas, rgbs, taus, ray_ids, n, dt, t_thresh):
    """Scalar transcription of the compositor forward (raymarching.cu:840-878)."""
    c = rgbs.shape[1]
    image = np.zeros((n, c))
    ws = np.zeros(n)
    depth = np.zeros(n)
    for r in range(n):
        T = 1.0
        sel = [i for i in range(len(ray_ids)) if ray_ids[i] == r]
        for i in sel:
            alpha = 1.0 - math.exp(-sigmas[i] * dt)
            w = alpha * T
            image[r] += w * rgbs[i]
            depth[r] += w * taus[i]
            ws[r] += w
            T *= 1.0 - alpha
            if T < t_thresh:
                break
    return image, ws, depth


class TestComposite:
    def _random_batch(self, seed, n=6, m=64, c=5):
        rng = np.random.default_rng(seed)
        counts = rng.integers(0, 12, n)
        ray_ids, taus = [], []
        for r, k in enumerate(counts):
            ray_ids += [r] * int(k)
            taus += list(np.sort(rng.random(int(k)) * 2))
        pad = m - len(ray_ids)
        assert pad >= 0
        valid = np.array([True] * len(ray_ids) + [False] * pad)
        ray_ids = np.array(ray_ids + [n] * pad, np.int32)
        taus = np.array(taus + [0.0] * pad, np.float32)
        sigmas = (rng.random(m) * 50).astype(np.float32)
        rgbs = rng.random((m, c)).astype(np.float32)
        batch = SampleBatch(
            xyz=jnp.zeros((m, 3)), dirs=jnp.zeros((m, 3)),
            tau=jnp.asarray(taus), ray_id=jnp.asarray(ray_ids),
            valid=jnp.asarray(valid), num_kept=jnp.asarray(int(valid.sum())),
            num_cand=jnp.zeros((), jnp.int32),
        )
        return sigmas, rgbs, taus, ray_ids, valid, batch

    def test_matches_scalar_reference(self):
        dt, t_thresh, n = 0.05, 1e-4, 6
        sigmas, rgbs, taus, ray_ids, valid, batch = self._random_batch(0)
        out = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs), batch, n, dt, t_thresh)
        mask = valid
        want_img, want_ws, want_d = _ref_composite(
            sigmas[mask], rgbs[mask], taus[mask], ray_ids[mask], n, dt, t_thresh
        )
        np.testing.assert_allclose(np.asarray(out.image), want_img, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights_sum), want_ws, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), want_d, rtol=1e-4, atol=1e-5)

    def test_early_stop_dense(self):
        """Very dense media: T crosses t_thresh mid-ray; late samples excluded."""
        dt, n, m = 0.5, 1, 16
        sigmas = np.full(m, 30.0, np.float32)  # alpha ~ 1 each step
        rgbs = np.ones((m, 3), np.float32)
        taus = np.arange(m, dtype=np.float32)
        ray_ids = np.zeros(m, np.int32)
        batch = SampleBatch(
            xyz=jnp.zeros((m, 3)), dirs=jnp.zeros((m, 3)), tau=jnp.asarray(taus),
            ray_id=jnp.asarray(ray_ids), valid=jnp.ones(m, bool), num_kept=jnp.asarray(m),
            num_cand=jnp.zeros((), jnp.int32),
        )
        out = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs), batch, n, dt, 1e-4)
        want_img, want_ws, want_d = _ref_composite(sigmas, rgbs, taus, ray_ids, n, dt, 1e-4)
        np.testing.assert_allclose(np.asarray(out.weights_sum), want_ws, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.image), want_img, rtol=1e-5)

    def test_gradients_match_fd(self):
        import jax

        dt, t_thresh, n = 0.1, 1e-4, 4
        sigmas, rgbs, taus, ray_ids, valid, batch = self._random_batch(3, n=4, m=32, c=3)
        sigmas = np.clip(sigmas / 10, 0.1, 3.0).astype(np.float32)

        def loss(s):
            out = composite_rays(s, jnp.asarray(rgbs), batch, n, dt, t_thresh)
            return jnp.sum(out.image**2) + jnp.sum(out.weights_sum)

        g = np.asarray(jax.grad(loss)(jnp.asarray(sigmas)))
        base = float(loss(jnp.asarray(sigmas)))
        rng = np.random.default_rng(0)
        checked = 0
        for _ in range(12):
            i = int(rng.integers(0, 32))
            if not valid[i]:
                continue
            h = 1e-3
            s2 = jnp.asarray(sigmas).at[i].add(h)
            fd = (float(loss(s2)) - base) / h
            np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=1e-3)
            checked += 1
        assert checked >= 4

    def test_segment_exclusive_cumsum(self):
        x = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        rid = jnp.asarray([0, 0, 1, 1, 1, 3])
        out = np.asarray(segment_exclusive_cumsum(x, rid, 4))
        np.testing.assert_allclose(out, [0, 1, 0, 3, 7, 0])


class TestOccLookup:
    def test_level_selection(self):
        h, cascade, bound = 8, 2, 2.0
        bitfield = np.zeros(cascade * h**3, bool)
        # occupy everything at level 1 only
        bitfield[h**3 :] = True
        pts_inner = jnp.asarray([[0.1, 0.1, 0.1]])  # |x| < 0.5 -> level 0
        pts_outer = jnp.asarray([[1.5, 0.0, 0.0]])  # level 1
        occ_i = occupancy_lookup(pts_inner, jnp.asarray(bitfield), bound=bound, cascade=cascade, grid_size=h)
        occ_o = occupancy_lookup(pts_outer, jnp.asarray(bitfield), bound=bound, cascade=cascade, grid_size=h)
        assert not bool(occ_i[0])
        assert bool(occ_o[0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestAdaptiveMarch:
    """The skip-distance while_loop marcher must emit EXACTLY the dense
    marcher's samples (empty-space skipping is an optimization, not a
    semantic change)."""

    @pytest.mark.parametrize("bound,h,density", [
        (1.0, 16, 0.3), (2.0, 16, 0.05), (2.0, 32, 0.5), (1.0, 16, 0.0),
    ])
    def test_matches_dense(self, bound, h, density):
        from nerfstyle_tpu.ops.marching import OccField
        from nerfstyle_tpu.ops.occupancy import skipdist_from_bitfield

        rng = np.random.default_rng(42)
        plan = _make_plan(16, bound=bound, h=h, max_steps=64)
        bits = jnp.asarray(rng.random(plan.cascade * h**3) < density)
        sd = skipdist_from_bitfield(bits, h)

        o = rng.normal(size=(16, 3)).astype(np.float32) * (1.5 * bound)
        d = rng.normal(size=(16, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)

        dense = march_rays(plan, bits, rays, nears, fars)
        adapt = march_rays(plan, OccField(bits, sd), rays, nears, fars)

        np.testing.assert_array_equal(np.asarray(dense.valid), np.asarray(adapt.valid))
        np.testing.assert_array_equal(np.asarray(dense.ray_id), np.asarray(adapt.ray_id))
        np.testing.assert_allclose(
            np.asarray(dense.xyz), np.asarray(adapt.xyz), rtol=1e-6, atol=1e-6
        )
        assert int(dense.num_kept) == int(adapt.num_kept)

    def test_window_budget_overflow_is_observable(self):
        """A starved window_budget truncates samples (graceful) but num_cand
        must still report the EXACT candidate count, so the renderer can grow
        the capacity instead of spiraling the sample budget down (round-2
        divergence root cause)."""
        from nerfstyle_tpu.ops.marching import OccField
        from nerfstyle_tpu.ops.occupancy import skipdist_from_bitfield
        import dataclasses

        rng = np.random.default_rng(7)
        plan = _make_plan(16, bound=2.0, h=16, max_steps=64)
        bits = jnp.asarray(rng.random(plan.cascade * 16**3) < 0.5)  # dense occ
        sd = skipdist_from_bitfield(bits, 16)
        o = rng.normal(size=(16, 3)).astype(np.float32) * 3.0
        d = rng.normal(size=(16, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        nears, fars = near_far_from_aabb(rays.origins, rays.dirs, plan.aabb, plan.min_near)

        ample = march_rays(plan, OccField(bits, sd), rays, nears, fars)
        n_cand = int(ample.num_cand)
        assert n_cand > 16  # dense occupancy -> many candidate windows

        starved_plan = dataclasses.replace(plan, window_budget=8)
        starved = march_rays(starved_plan, OccField(bits, sd), rays, nears, fars)
        # truncated kept count, but the candidate count stays exact
        assert int(starved.num_kept) < int(ample.num_kept)
        assert int(starved.num_cand) == n_cand

    def test_renderer_window_bucket_grows_on_pressure(self):
        from nerfstyle_tpu.render.renderer import (
            _WINDOW_BUCKETS, RenderSettings, Renderer,
        )
        from nerfstyle_tpu.models.fields import style_field_spec
        from nerfstyle_tpu.ops.hashgrid import hashgrid_spec
        from nerfstyle_tpu.core.types import BBox, Intrinsics

        spec = style_field_spec(
            hashgrid_spec(2, 2, 8, per_level_scale=1.5, log2_hashmap_size=8),
            class_dim=0,
        )
        r = Renderer(
            spec, BBox.from_radius(1.0), RenderSettings(grid_size=16),
            Intrinsics(w=8, h=8, fx=4, fy=4, cx=4, cy=4), 1.0,
        )
        r._window_bucket = min(_WINDOW_BUCKETS)
        r._retune_window_bucket(cand=100 * 64, num_rays=64)  # 100/ray observed
        assert r._window_bucket >= 128  # jumped up immediately
        # shrink is debounced: one low observation does nothing, two
        # consecutive jump DIRECTLY to the wanted bucket (each bucket value
        # is a recompile, so step-by-step descents are avoided)
        before = r._window_bucket
        r._retune_window_bucket(cand=2 * 64, num_rays=64)
        assert r._window_bucket == before
        r._retune_window_bucket(cand=2 * 64, num_rays=64)
        assert r._window_bucket == min(_WINDOW_BUCKETS)
        # monotone DECLINE must also shrink: each retune wanting a DIFFERENT
        # smaller bucket (early-training occupancy pruning) previously never
        # satisfied an equal-want debounce and pinned the bucket at max
        # (measured: 60+ iters at 3.5 s/step) — now two below-current
        # observations jump to the latest want
        r._retune_window_bucket(cand=100 * 64, num_rays=64)
        assert r._window_bucket >= 128
        r._retune_window_bucket(cand=60 * 64, num_rays=64)
        r._retune_window_bucket(cand=30 * 64, num_rays=64)
        assert r._window_bucket == 48  # 30 * 1.25 -> 38 -> bucket 48

    def test_composite_survives_infinite_sigma(self):
        """A transient sigma=inf sample (exp overflow in the unclamped
        trunc_exp forward — the reference's activation is unclamped too) must
        NOT produce NaN: the sdt cap makes alpha==1 / T==0 exactly, matching
        the reference's sequential loop, and gradients stay finite (the
        GradScaler-parity skip never needs to fire for this case)."""
        import jax

        n, m, c = 2, 8, 5
        sigmas = jnp.full((m,), 5.0).at[3].set(jnp.inf)
        rgbs = jnp.full((m, c), 0.5)
        batch = SampleBatch(
            xyz=jnp.zeros((m, 3)), dirs=jnp.zeros((m, 3)),
            tau=jnp.arange(m, dtype=jnp.float32),
            ray_id=jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32),
            valid=jnp.ones((m,), bool), num_kept=jnp.asarray(m),
            num_cand=jnp.zeros((), jnp.int32),
        )
        out = composite_rays(sigmas, rgbs, batch, n, dt=0.05, t_thresh=1e-4)
        assert np.all(np.isfinite(np.asarray(out.image)))
        assert np.all(np.isfinite(np.asarray(out.weights_sum)))

        def loss(s):
            o = composite_rays(s, rgbs, batch, n, dt=0.05, t_thresh=1e-4)
            return jnp.sum(o.image) + jnp.sum(o.weights_sum)

        g = np.asarray(jax.grad(loss)(sigmas))
        # the inf sample's own grad may be nan/0 (it saturates), but every
        # other sample's gradient must stay finite
        assert np.all(np.isfinite(np.delete(g, 3)))

    def test_skipdist_semantics(self):
        from nerfstyle_tpu.ops.occupancy import SKIP_DMAX, skipdist_from_bitfield

        h = 16
        bits = np.zeros((h, h, h), bool)
        bits[8, 8, 8] = True
        sd = np.asarray(skipdist_from_bitfield(jnp.asarray(bits.reshape(-1)), h)).reshape(h, h, h)
        assert sd[8, 8, 8] == 0
        assert sd[8, 8, 9] == 1 and sd[9, 9, 9] == 1  # L-inf metric
        assert sd[8, 8, 11] == 3
        assert sd[0, 0, 0] == min(8, SKIP_DMAX)
