"""Hash-grid encoder tests: index law vs a literal numpy reference, interpolation
properties, gradient behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.ops.hashgrid import (
    _MAX_STYLES,
    _PRIMES,
    hashgrid_encode,
    hashgrid_init,
    hashgrid_spec,
)


def _ref_grid_index(pos_grid, resolution, table_size, style=0):
    """Literal transcription of get_grid_index semantics (gridencoder.cu:56-80)
    as slow scalar numpy for cross-checking."""
    index = 0
    stride = 1
    for d in range(3):
        if stride <= table_size:
            index += int(pos_grid[d]) * stride
            stride *= resolution + 1
        else:
            break
    if stride <= table_size:
        index += style * stride
        stride *= _MAX_STYLES
    if stride > table_size:  # gridtype == hash
        index = 0
        for d in range(3):
            index ^= (int(pos_grid[d]) * _PRIMES[d]) & 0xFFFFFFFF
        index ^= (style * _PRIMES[3]) & 0xFFFFFFFF
        index &= 0xFFFFFFFF
    return index % table_size


def _ref_encode(spec, emb, x, style=0):
    """Slow numpy re-implementation of the forward kernel (gridencoder.cu:84-187)."""
    emb = np.asarray(emb)
    b = x.shape[0]
    out = np.zeros((b, spec.num_levels, spec.level_dim), np.float32)
    for i in range(b):
        if np.any((x[i] < 0) | (x[i] > 1)):
            continue
        for lvl in range(spec.num_levels):
            res = spec.resolutions[lvl]
            scale = float(res)  # align_corners
            pos = x[i] * scale
            pg = np.minimum(np.floor(pos), res - 1)
            frac = pos - pg
            acc = np.zeros(spec.level_dim, np.float32)
            for c in range(8):
                w = 1.0
                corner = np.zeros(3, np.int64)
                for d in range(3):
                    if (c >> d) & 1:
                        w *= frac[d]
                        corner[d] = pg[d] + 1
                    else:
                        w *= 1 - frac[d]
                        corner[d] = pg[d]
                idx = _ref_grid_index(corner, res, spec.table_sizes[lvl], style)
                acc += w * emb[spec.offsets[lvl] + idx]
            out[i, lvl] = acc
    return out.reshape(b, -1)


class TestSpec:
    def test_default_spec_tables(self):
        spec = hashgrid_spec(16, 2, 16, log2_hashmap_size=19, desired_resolution=4096)
        assert spec.num_levels == 16
        assert spec.resolutions[0] == 16
        assert spec.resolutions[-1] in (4095, 4096)  # fp32 floor law
        # level 0 table: 16^3 = 4096 (already mult of 8)
        assert spec.table_sizes[0] == 4096
        # capped levels hit 2^19
        assert spec.table_sizes[-1] == 2**19
        assert spec.offsets[-1] == sum(spec.table_sizes)

    def test_per_level_scale_from_desired(self):
        spec = hashgrid_spec(16, 2, 16, desired_resolution=4096)
        np.testing.assert_allclose(spec.per_level_scale, 2 ** (8 / 15), rtol=1e-6)


class TestEncode:
    @pytest.mark.parametrize("levels,base", [(4, 4), (6, 16)])
    def test_matches_numpy_reference(self, levels, base):
        spec = hashgrid_spec(levels, 2, base, per_level_scale=1.5, log2_hashmap_size=10)
        key = jax.random.PRNGKey(0)
        emb = hashgrid_init(key, spec)
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (32, 3)))
        got = np.asarray(hashgrid_encode(spec, emb, jnp.asarray(x)))
        want = _ref_encode(spec, emb, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8)

    def test_oob_zeros(self):
        spec = hashgrid_spec(2, 2, 4, per_level_scale=2.0, log2_hashmap_size=8)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
        out = np.asarray(hashgrid_encode(spec, emb, x))
        np.testing.assert_array_equal(out, 0.0)

    def test_interpolation_continuity(self):
        """Encoding must be continuous: nearby points give nearby features."""
        spec = hashgrid_spec(4, 2, 8, per_level_scale=2.0, log2_hashmap_size=12)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x0 = jnp.asarray([[0.3, 0.4, 0.5]])
        eps = 1e-5
        x1 = x0 + eps
        f0 = np.asarray(hashgrid_encode(spec, emb, x0))
        f1 = np.asarray(hashgrid_encode(spec, emb, x1))
        assert np.max(np.abs(f1 - f0)) < 1e-3

    def test_style_slot_changes_features(self):
        spec = hashgrid_spec(2, 2, 16, per_level_scale=2.0, log2_hashmap_size=10)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        f0 = np.asarray(hashgrid_encode(spec, emb, x, style=0))
        f1 = np.asarray(hashgrid_encode(spec, emb, x, style=1))
        assert np.abs(f0 - f1).max() > 0


class TestGridInitialize:
    def test_each_written_row_holds_a_colliding_corner_value(self):
        """For every table row and style, the initialized value must equal the
        style-0 reference value of SOME corner hashing to that row — exactly
        the guarantee of the CUDA kernel's unordered per-corner writes
        (gridencoder.cu:495-571; collisions pick an arbitrary survivor)."""
        from nerfstyle_tpu.ops.hashgrid import _level_indices, grid_initialize

        spec = hashgrid_spec(2, 2, 4, per_level_scale=1.5, log2_hashmap_size=7)
        ref = hashgrid_init(jax.random.PRNGKey(0), spec)
        out = grid_initialize(spec, spec, ref, num_styles=3)
        ref_np, out_np = np.asarray(ref), np.asarray(out)

        for lvl in range(spec.num_levels):
            res = spec.resolutions[lvl]
            side = res + 1
            ids = np.arange(side**3)
            pos = np.stack(
                [ids // (side * side), (ids // side) % side, ids % side], -1
            ).astype(np.int32)
            idx0 = np.asarray(
                _level_indices(jnp.asarray(pos), res, spec.table_sizes[lvl], 0)
            ) + spec.offsets[lvl]
            # All styles write into the SAME table rows (the style only
            # perturbs the hash), so a row's survivor may come from any
            # (corner, style) pair mapping to it — as in the CUDA kernel.
            idx_by_style = [
                np.asarray(
                    _level_indices(jnp.asarray(pos), res, spec.table_sizes[lvl], s)
                ) + spec.offsets[lvl]
                for s in range(3)
            ]
            all_rows = np.unique(np.concatenate(idx_by_style))
            for row in all_rows:
                sources = np.concatenate(
                    [ref_np[idx0[idxs == row]] for idxs in idx_by_style]
                )
                got = out_np[row]
                assert any(
                    np.allclose(got, src, atol=1e-7) for src in sources
                ), (lvl, row)

    def test_hashed_levels_populate_rows(self):
        """Hashed levels collide (arbitrary survivor, like the CUDA kernel's
        unordered writes) but every written row must hold SOME style-0 corner
        value."""
        from nerfstyle_tpu.ops.hashgrid import grid_initialize

        spec = hashgrid_spec(2, 2, 8, per_level_scale=1.5, log2_hashmap_size=8)
        ref = hashgrid_init(jax.random.PRNGKey(2), spec)
        out = grid_initialize(spec, spec, ref, num_styles=2)
        ref_np = np.asarray(ref)
        out_np = np.asarray(out)
        assert np.abs(out_np).sum() > 0
        # every nonzero output row equals some reference row
        ref_set = {tuple(np.round(r, 7)) for r in ref_np}
        nz = out_np[np.abs(out_np).sum(axis=1) > 0]
        for row in nz[:: max(1, len(nz) // 50)]:
            assert tuple(np.round(row, 7)) in ref_set


class TestGrad:
    def test_embedding_grad_matches_fd(self):
        spec = hashgrid_spec(2, 2, 4, per_level_scale=2.0, log2_hashmap_size=6)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))

        def loss(e):
            return jnp.sum(hashgrid_encode(spec, e, x) ** 2)

        g = np.asarray(jax.grad(loss)(emb))
        # finite differences on a few entries
        rng = np.random.default_rng(0)
        base = float(loss(emb))
        for _ in range(5):
            i = int(rng.integers(0, emb.shape[0]))
            j = int(rng.integers(0, emb.shape[1]))
            h = 1e-3
            e2 = emb.at[i, j].add(h)
            fd = (float(loss(e2)) - base) / h
            np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=1e-4)

    def test_input_grad_matches_fd(self):
        """Position gradients require the full-autodiff path (fast_vjp=False);
        the fast path intentionally returns zero d/dx (positions are never
        differentiated in the render pipeline)."""
        spec = hashgrid_spec(3, 2, 8, per_level_scale=1.7, log2_hashmap_size=10)
        emb = jax.random.normal(jax.random.PRNGKey(2), (spec.total_params, 2)) * 0.1
        x = jnp.asarray([[0.33, 0.41, 0.57]])

        def loss(pt):
            return jnp.sum(hashgrid_encode(spec, emb, pt, fast_vjp=False))

        g = np.asarray(jax.grad(loss)(x))
        for d in range(3):
            h = 1e-4
            x2 = x.at[0, d].add(h)
            fd = (float(loss(x2)) - float(loss(x))) / h
            np.testing.assert_allclose(g[0, d], fd, rtol=5e-2, atol=1e-3)

    def test_fast_bwd_matches_autodiff(self):
        """The sort-compact-scatter backward must equal the plain autodiff
        scatter-add backward."""
        spec = hashgrid_spec(4, 2, 8, per_level_scale=1.6, log2_hashmap_size=9)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (777, 3))
        g_out = jax.random.normal(jax.random.PRNGKey(2), (777, spec.output_dim))

        def loss(e, fast):
            return jnp.sum(hashgrid_encode(spec, e, x, fast_vjp=fast) * g_out)

        g_fast = np.asarray(jax.grad(lambda e: loss(e, True))(emb))
        g_slow = np.asarray(jax.grad(lambda e: loss(e, False))(emb))
        np.testing.assert_allclose(g_fast, g_slow, rtol=1e-3, atol=5e-5)

    def test_fast_bwd_fused_channels(self):
        """Backward also correct for a fused [T, 4] operand (dual-encoder)."""
        spec = hashgrid_spec(3, 2, 8, per_level_scale=1.5, log2_hashmap_size=9)
        emb4 = jax.random.normal(jax.random.PRNGKey(3), (spec.total_params, 4)) * 0.01
        x = jax.random.uniform(jax.random.PRNGKey(4), (123, 3))
        g_out = jax.random.normal(jax.random.PRNGKey(5), (123, spec.num_levels * 4))

        def loss(e, fast):
            return jnp.sum(hashgrid_encode(spec, e, x, fast_vjp=fast) * g_out)

        g_fast = np.asarray(jax.grad(lambda e: loss(e, True))(emb4))
        g_slow = np.asarray(jax.grad(lambda e: loss(e, False))(emb4))
        np.testing.assert_allclose(g_fast, g_slow, rtol=1e-3, atol=5e-5)

    def test_packed_bwd_close_to_exact(self):
        """bf16-packed sort payloads (bwd_pack=True) round each contribution
        to bf16 before the exact fp32 run accumulation — grads must stay
        within bf16 relative error of the exact path (precision comparable to
        the reference's fp16 atomicAdd, gridencoder.cu:313-326)."""
        spec = hashgrid_spec(3, 2, 8, per_level_scale=1.5, log2_hashmap_size=9)
        emb4 = jax.random.normal(jax.random.PRNGKey(3), (spec.total_params, 4)) * 0.01
        x = jax.random.uniform(jax.random.PRNGKey(4), (555, 3))
        g_out = jax.random.normal(jax.random.PRNGKey(5), (555, spec.num_levels * 4))

        def loss(e, packed):
            return jnp.sum(hashgrid_encode(spec, e, x, bwd_pack=packed) * g_out)

        g_exact = np.asarray(jax.grad(lambda e: loss(e, False))(emb4))
        g_packed = np.asarray(jax.grad(lambda e: loss(e, True))(emb4))
        # bf16 has ~2^-8 relative precision per contribution.
        scale = np.abs(g_exact).max()
        np.testing.assert_allclose(g_packed, g_exact, atol=2e-2 * scale, rtol=2e-2)
        assert np.abs(g_packed - g_exact).max() > 0  # packing is actually on

    def test_grad_deterministic(self):
        """Unlike the CUDA atomicAdd backward, grads are bit-reproducible."""
        spec = hashgrid_spec(4, 2, 8, per_level_scale=2.0, log2_hashmap_size=8)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

        def loss(e):
            return jnp.sum(hashgrid_encode(spec, e, x) ** 2)

        g1 = np.asarray(jax.grad(loss)(emb))
        g2 = np.asarray(jax.grad(loss)(emb))
        np.testing.assert_array_equal(g1, g2)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def _marched_stream(n_rays=64, steps=96, seed=0, dt=2 * 3**0.5 / 1024):
    """Ray-marched-like positions in [0,1]^3: t-ordered, ray-major."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(0.3, 0.7, (n_rays, 3))
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # random gaps emulate occupancy skipping
    ks = np.cumsum(rng.integers(1, 4, (n_rays, steps)), axis=1)
    pts = o[:, None, :] + d[:, None, :] * (ks[..., None] * dt)
    return jnp.asarray(np.clip(pts.reshape(-1, 3), 0.0, 1.0), jnp.float32)


class TestCornerDedup:
    def _spec(self):
        return hashgrid_spec(8, 2, 16, per_level_scale=1.5, log2_hashmap_size=12)

    def _plan(self, spec, nlv=5, margin=1.6):
        from nerfstyle_tpu.ops.hashgrid import DedupPlan

        # generous fractions so the test streams exercise the DEDUP branch
        # (asserted below), not the overflow fallback
        nlv -= nlv % 2  # pairs
        groups = tuple((2 * g, 2 * g + 1) for g in range(nlv // 2))
        fracs = tuple(
            min(1.0, (spec.resolutions[a] + spec.resolutions[b]) / 50.0)
            for a, b in groups
        )
        return DedupPlan(groups=groups, cap_fracs=fracs, margin=margin)

    def _assert_dedup_branch(self, spec, plan, x):
        from nerfstyle_tpu.ops.hashgrid import _dedup_structure

        _, _, ok = _dedup_structure(spec, plan, x)
        assert bool(ok), "test stream unexpectedly overflowed the dedup cap"

    def test_dedup_fwd_identical(self):
        """Same gathers, same weights — identical up to XLA's FMA
        reassociation inside the cond branch (~1 ulp)."""
        spec = self._spec()
        emb = jax.random.normal(jax.random.PRNGKey(0), (spec.total_params, 2))
        x = _marched_stream()
        base = np.asarray(hashgrid_encode(spec, emb, x))
        for nlv in (2, 4, 8):
            plan = self._plan(spec, nlv)
            self._assert_dedup_branch(spec, plan, x)
            out = hashgrid_encode(spec, emb, x, dedup=plan)
            np.testing.assert_allclose(np.asarray(out), base, rtol=1e-6, atol=2e-6)

    def test_dedup_fwd_fused_channels(self):
        spec = self._spec()
        emb = jax.random.normal(jax.random.PRNGKey(1), (spec.total_params, 4))
        x = _marched_stream(seed=3)
        plan = self._plan(spec)
        self._assert_dedup_branch(spec, plan, x)
        base = np.asarray(hashgrid_encode(spec, emb, x))
        out = hashgrid_encode(spec, emb, x, dedup=plan)
        np.testing.assert_allclose(np.asarray(out), base, rtol=1e-6, atol=2e-6)

    def test_dedup_overflow_falls_back_exactly(self):
        """A cap far below the true run-start count must take the cond's
        naive branch and still produce the exact output."""
        from nerfstyle_tpu.ops.hashgrid import DedupPlan

        spec = self._spec()
        emb = jax.random.normal(jax.random.PRNGKey(2), (spec.total_params, 2))
        x = jax.random.uniform(jax.random.PRNGKey(3), (2048, 3))  # incoherent
        tiny = DedupPlan(groups=((0, 1),), cap_fracs=(1e-4,), margin=1.0)
        base = np.asarray(hashgrid_encode(spec, emb, x))
        out = hashgrid_encode(spec, emb, x, dedup=tiny)
        np.testing.assert_allclose(np.asarray(out), base, rtol=1e-6, atol=2e-6)

    def test_dedup_oob_rows_zero(self):
        spec = self._spec()
        emb = jax.random.normal(jax.random.PRNGKey(4), (spec.total_params, 2))
        x = np.array(_marched_stream(seed=5))
        x[::7] = x[::7] + 1.5  # out of [0,1]
        out = np.asarray(hashgrid_encode(spec, emb, jnp.asarray(x), dedup=self._plan(spec)))
        assert (out[::7] == 0.0).all()

    def test_dedup_bwd_matches_naive_fast(self):
        spec = self._spec()
        emb = jax.random.normal(jax.random.PRNGKey(5), (spec.total_params, 2)) * 0.01
        x = _marched_stream(n_rays=32, steps=64, seed=7)
        g_out = jax.random.normal(jax.random.PRNGKey(6), (x.shape[0], spec.output_dim))
        plan = self._plan(spec)

        def loss(e, dd):
            return jnp.sum(hashgrid_encode(spec, e, x, dedup=dd) * g_out)

        g_d = np.asarray(jax.grad(lambda e: loss(e, plan))(emb))
        g_n = np.asarray(jax.grad(lambda e: loss(e, None))(emb))
        np.testing.assert_allclose(g_d, g_n, rtol=1e-3, atol=5e-5)

    def test_dedup_bwd_fused_and_autodiff(self):
        spec = self._spec()
        emb4 = jax.random.normal(jax.random.PRNGKey(7), (spec.total_params, 4)) * 0.01
        x = _marched_stream(n_rays=24, steps=48, seed=9)
        g_out = jax.random.normal(jax.random.PRNGKey(8), (x.shape[0], spec.num_levels * 4))
        plan = self._plan(spec)

        def loss(e, dd, fast=True):
            return jnp.sum(hashgrid_encode(spec, e, x, fast_vjp=fast, dedup=dd) * g_out)

        g_d = np.asarray(jax.grad(lambda e: loss(e, plan))(emb4))
        g_auto = np.asarray(jax.grad(lambda e: loss(e, None, fast=False))(emb4))
        np.testing.assert_allclose(g_d, g_auto, rtol=1e-3, atol=5e-5)

    def test_dedup_bwd_overflow_branch(self):
        from nerfstyle_tpu.ops.hashgrid import DedupPlan

        spec = self._spec()
        emb = jax.random.normal(jax.random.PRNGKey(9), (spec.total_params, 2)) * 0.01
        x = jax.random.uniform(jax.random.PRNGKey(10), (1024, 3))
        g_out = jax.random.normal(jax.random.PRNGKey(11), (1024, spec.output_dim))
        tiny = DedupPlan(groups=((0, 1),), cap_fracs=(1e-4,), margin=1.0)

        def loss(e, dd):
            return jnp.sum(hashgrid_encode(spec, e, x, dedup=dd) * g_out)

        g_d = np.asarray(jax.grad(lambda e: loss(e, tiny))(emb))
        g_n = np.asarray(jax.grad(lambda e: loss(e, None))(emb))
        np.testing.assert_allclose(g_d, g_n, rtol=1e-3, atol=5e-5)

    def test_dedup_plan_builders(self):
        from nerfstyle_tpu.ops.hashgrid import dedup_plan, dedup_plan_for_grid_probes

        spec = hashgrid_spec(16, 2, 16, per_level_scale=1.447, log2_hashmap_size=19)
        plan = dedup_plan(spec, dt_world=2 * 3**0.5 / 1024, scene_size=(4.0, 4.0, 4.0))
        assert plan is not None
        assert plan.levels == tuple(range(len(plan.levels)))  # contiguous prefix
        assert all(f < 0.6 for f in plan.cap_fracs)
        assert 0 < plan.cap(4096) <= len(plan.levels) * 4096
        probe = dedup_plan_for_grid_probes(spec, 128)
        assert probe is not None and probe.levels == tuple(range(len(probe.levels)))
        # too-coarse scene: no level qualifies
        assert dedup_plan(spec, dt_world=1.0, scene_size=(1.0, 1.0, 1.0)) is None


class TestSimplex:
    """Freudenthal-simplex interpolation (HashGridSpec.simplex_from): 4
    gathered rows/sample on fine levels, C0 field, exact fast/slow parity."""

    def _spec(self, simplex_from, levels=6, hm=12):
        return hashgrid_spec(
            num_levels=levels, level_dim=2, base_resolution=16,
            per_level_scale=1.61, log2_hashmap_size=hm,
            simplex_from=simplex_from,
        )

    def _ref_encode_simplex(self, spec, emb, x, style=0):
        """Scalar numpy reference: sort fractions descending (ties x<y<z),
        walk vertices v0=floor, v_k = v_{k-1} + e_{k-th largest axis},
        barycentric weights (1-s1, s1-s2, s2-s3, s3)."""
        emb = np.asarray(emb)
        b = x.shape[0]
        out = np.zeros((b, spec.num_levels, emb.shape[1]), np.float32)
        for i in range(b):
            if np.any((x[i] < 0) | (x[i] > 1)):
                continue
            for lvl in range(spec.num_levels):
                res = spec.resolutions[lvl]
                pos = x[i] * float(res)
                pg = np.minimum(np.floor(pos), res - 1)
                frac = (pos - pg).astype(np.float32)
                if lvl < spec.simplex_start:
                    acc = np.zeros(emb.shape[1], np.float32)
                    for c in range(8):
                        w = 1.0
                        corner = np.zeros(3, np.int64)
                        for d in range(3):
                            if (c >> d) & 1:
                                w *= frac[d]
                                corner[d] = pg[d] + 1
                            else:
                                w *= 1 - frac[d]
                                corner[d] = pg[d]
                        idx = _ref_grid_index(corner, res, spec.table_sizes[lvl], style)
                        acc += w * emb[spec.offsets[lvl] + idx]
                    out[i, lvl] = acc
                    continue
                # stable argsort descending with axis-order tie-break
                order = sorted(range(3), key=lambda d: (-frac[d], d))
                s = [frac[order[0]], frac[order[1]], frac[order[2]]]
                ws = [1.0 - s[0], s[0] - s[1], s[1] - s[2], s[2]]
                corner = pg.astype(np.int64).copy()
                acc = np.zeros(emb.shape[1], np.float32)
                for k in range(4):
                    if k > 0:
                        corner[order[k - 1]] += 1
                    idx = _ref_grid_index(corner, res, spec.table_sizes[lvl], style)
                    acc += np.float32(ws[k]) * emb[spec.offsets[lvl] + idx]
                out[i, lvl] = acc
        return out.reshape(b, -1)

    @pytest.mark.parametrize("simplex_from", [0, 3])
    def test_matches_scalar_reference(self, simplex_from):
        spec = self._spec(simplex_from)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = np.array(jax.random.uniform(jax.random.PRNGKey(1), (64, 3)))
        # include exact-integer / tied-fraction points (tie-break coverage)
        x[:8] = np.round(x[:8] * 16) / 16.0
        x[8:12, 0] = x[8:12, 1]
        x[12:16, 1] = x[12:16, 2]
        got = hashgrid_encode(spec, emb, jnp.asarray(x), fast_vjp=True)
        want = self._ref_encode_simplex(spec, emb, x)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_fast_matches_slow_path(self):
        spec = self._spec(2)
        emb = hashgrid_init(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
        fast = hashgrid_encode(spec, emb, x, fast_vjp=True)
        slow = hashgrid_encode(spec, emb, x, fast_vjp=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-6)

    def test_partition_of_unity_and_nonneg(self):
        spec = self._spec(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
        ones = jnp.ones((spec.total_params, 2))
        out = hashgrid_encode(spec, ones, x, fast_vjp=True)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_continuity_across_boundaries(self):
        """C0 across cell faces AND tetra faces: epsilon pairs straddling a
        z-integer plane and the fx==fy diagonal produce near-equal features."""
        spec = self._spec(0, levels=4)
        emb = jax.random.normal(jax.random.PRNGKey(0), (spec.total_params, 2))
        eps = 1e-6
        res = spec.resolutions[-1]
        pairs = []
        for zc in (3, 7, 11):
            z = zc / res
            pairs += [[0.31, 0.47, z - eps], [0.31, 0.47, z + eps]]
        u = (5 + 0.3) / res
        pairs += [[u - eps, u, 0.21], [u + eps, u, 0.21]]  # fx==fy tetra face
        pairs += [[0.41, u - eps, u], [0.41, u + eps, u]]  # fy==fz tetra face
        out = np.asarray(hashgrid_encode(spec, emb, jnp.asarray(pairs), fast_vjp=True))
        for i in range(0, len(pairs), 2):
            # bound the jump by slope*2eps with generous headroom
            assert np.abs(out[i] - out[i + 1]).max() < res * eps * 50, i

    def test_grad_matches_fd(self):
        spec = self._spec(1)
        emb = jax.random.normal(jax.random.PRNGKey(0), (spec.total_params, 2))
        x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))

        def loss(e):
            out = hashgrid_encode(spec, e, x, fast_vjp=True)
            return (out**2).sum() / out.size

        g = jax.grad(loss)(emb)
        v = jax.random.normal(jax.random.PRNGKey(3), emb.shape) * 1e-3
        fd = (loss(emb + v) - loss(emb - v)) / 2.0
        an = (g * v).sum()
        assert abs(float(fd - an)) / abs(float(fd)) < 1e-3

    def test_dedup_clamped_and_equal(self):
        """Dedup plans never cover simplex levels; dedup'd encode matches the
        naive mixed encode to reassociation tolerance, fwd and bwd."""
        from nerfstyle_tpu.ops.hashgrid import dedup_plan

        spec = hashgrid_spec(
            num_levels=8, level_dim=2, base_resolution=16,
            per_level_scale=1.45, log2_hashmap_size=13, simplex_from=4,
        )
        plan = dedup_plan(spec, 2 * np.sqrt(3) / 1024, np.array([4.0, 4.0, 4.0]))
        assert plan is not None and max(plan.levels) < 4
        emb = jax.random.normal(jax.random.PRNGKey(0), (spec.total_params, 2))
        t = jnp.linspace(0.2, 0.8, 1024)
        o = jnp.array([0.1, 0.2, 0.3])
        d = jnp.array([0.5, 0.6, 0.62])
        x = jnp.clip(o[None] + t[:, None] * d[None] / jnp.linalg.norm(d), 0, 1)
        naive = hashgrid_encode(spec, emb, x, fast_vjp=True, dedup=None)
        dd = hashgrid_encode(spec, emb, x, fast_vjp=True, dedup=plan)
        np.testing.assert_allclose(np.asarray(naive), np.asarray(dd), atol=1e-5)

        def loss(e, dedup):
            out = hashgrid_encode(spec, e, x, fast_vjp=True, dedup=dedup)
            return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()

        g1 = jax.grad(lambda e: loss(e, None))(emb)
        g2 = jax.grad(lambda e: loss(e, plan))(emb)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
