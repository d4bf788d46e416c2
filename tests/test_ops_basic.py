"""Unit tests for basic ops: morton, SH, MLP/trunc_exp, AABB."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.ops import (
    mlp_apply,
    mlp_init,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    sh_encode,
    trunc_exp,
)


def _morton_ref(x, y, z):
    """Bit-by-bit reference Morton encoding."""
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 128, size=(256, 3)).astype(np.int32)
        codes = morton3d(jnp.asarray(coords))
        back = morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), coords)

    def test_against_bitwise_reference(self):
        rng = np.random.default_rng(1)
        coords = rng.integers(0, 1024, size=(64, 3))
        codes = np.asarray(morton3d(jnp.asarray(coords.astype(np.int32))))
        expect = [_morton_ref(int(x), int(y), int(z)) for x, y, z in coords]
        np.testing.assert_array_equal(codes.astype(np.uint32), np.array(expect, np.uint32))


class TestSH:
    def test_constant_term(self):
        d = jnp.asarray([[0.7, 0.2, 0.9]])
        out = sh_encode(d, degree=1)
        assert out.shape == (1, 1)
        np.testing.assert_allclose(out[0, 0], 0.28209479177387814, rtol=1e-6)

    def test_output_dims(self):
        d = jnp.ones((5, 3)) * 0.5
        for deg in (1, 2, 3, 4):
            assert sh_encode(d, deg).shape == (5, deg**2)

    def test_degree2_matches_formula(self):
        rng = np.random.default_rng(2)
        dirs = rng.normal(size=(16, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs01 = (dirs + 1.0) / 2.0
        out = np.asarray(sh_encode(jnp.asarray(dirs01, jnp.float32), degree=2))
        c = 0.48860251190291987
        np.testing.assert_allclose(out[:, 1], -c * dirs[:, 1], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 2], c * dirs[:, 2], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 3], -c * dirs[:, 0], rtol=2e-5, atol=1e-6)

    def test_rotation_invariant_norm(self):
        # Sum of squares of all 16 SH values is direction-independent.
        rng = np.random.default_rng(3)
        dirs = rng.normal(size=(32, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = np.asarray(sh_encode(jnp.asarray((dirs + 1) / 2, jnp.float32), degree=4))
        norms = np.sum(out**2, axis=-1)
        np.testing.assert_allclose(norms, norms[0], rtol=1e-4)


class TestMLP:
    def test_shapes_and_bias_free(self):
        key = jax.random.PRNGKey(0)
        ws = mlp_init(key, 32, 64, 2, 3)
        assert [w.shape for w in ws] == [(32, 64), (64, 64), (64, 3)]
        x = jnp.zeros((7, 32))
        out = mlp_apply(ws, x)
        # bias-free: zero input -> zero output
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_sigmoid_activation(self):
        key = jax.random.PRNGKey(1)
        ws = mlp_init(key, 8, 16, 1, 3)
        out = mlp_apply(ws, jax.random.normal(key, (5, 8)), output_activation="sigmoid")
        assert np.all(np.asarray(out) > 0) and np.all(np.asarray(out) < 1)

    def test_bf16_close_to_f32(self):
        key = jax.random.PRNGKey(2)
        ws = mlp_init(key, 32, 64, 1, 4)
        x = jax.random.normal(key, (64, 32))
        f32 = mlp_apply(ws, x)
        bf16 = mlp_apply(ws, x, compute_dtype=jnp.bfloat16)
        assert bf16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(f32), np.asarray(bf16), atol=0.15, rtol=0.1)


class TestTruncExp:
    def test_forward(self):
        x = jnp.asarray([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([-2.0, 0.0, 3.0]), rtol=1e-5)

    def test_grad_clamped(self):
        g = jax.grad(lambda v: trunc_exp(v).sum())(jnp.asarray([20.0]))
        np.testing.assert_allclose(np.asarray(g), np.exp(15.0), rtol=1e-5)
        g2 = jax.grad(lambda v: trunc_exp(v).sum())(jnp.asarray([2.0]))
        np.testing.assert_allclose(np.asarray(g2), np.exp(2.0), rtol=1e-5)


class TestAABB:
    def test_axis_ray(self):
        o = jnp.asarray([[-5.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(np.asarray(near), [4.0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(far), [6.0], rtol=1e-6)

    def test_miss(self):
        o = jnp.asarray([[-5.0, 3.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        assert np.asarray(near)[0] > 1e30 and np.asarray(far)[0] > 1e30

    def test_inside_min_near(self):
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(np.asarray(near), [0.2], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(far), [1.0], rtol=1e-6)

    def test_diagonal_brute_force(self):
        rng = np.random.default_rng(4)
        o = rng.normal(size=(64, 3)) * 3
        d = rng.normal(size=(64, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        aabb = jnp.asarray([-2.0, -2.0, -2.0, 2.0, 2.0, 2.0])
        near, far = near_far_from_aabb(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), aabb, 0.05)
        near, far = np.asarray(near), np.asarray(far)
        # Brute force: dense t sweep; points inside box imply near <= t <= far
        ts = np.linspace(0.01, 12, 4000)
        for i in range(64):
            pts = o[i] + ts[:, None] * d[i]
            inside = np.all(np.abs(pts) < 2.0 - 1e-3, axis=-1)
            if inside.any():
                t_in = ts[inside]
                # near is floored at min_near for rays starting inside the box
                assert near[i] <= max(t_in.min(), 0.05) + 1e-2
                assert far[i] >= t_in.max() - 1e-2
            else:
                # ray misses (or only clips edge): near clamp or FLT_MAX
                assert near[i] >= 0.05


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestCompactIndices:
    """ops/compact.py: sort-based drop-in for flatnonzero(size=, fill_value=)."""

    def test_matches_flatnonzero(self):
        import numpy as np
        import jax.numpy as jnp
        from nerfstyle_tpu.ops.compact import compact_indices

        rng = np.random.default_rng(0)
        for dom, frac, size in [(64, 0.5, 32), (1000, 0.05, 200),
                                (4096, 0.9, 512), (333, 0.0, 16), (128, 1.0, 256)]:
            mask = jnp.asarray(rng.random(dom) < frac)
            for fill in (dom, dom + 7):
                want = jnp.flatnonzero(mask, size=size, fill_value=fill)
                got = compact_indices(mask, size, fill)
                np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_jit_and_truncation_order(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from nerfstyle_tpu.ops.compact import compact_indices

        mask = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 1, 1], bool))
        out = jax.jit(lambda m: compact_indices(m, 3, 8))(mask)
        # truncates to the FIRST `size` set positions, ascending
        np.testing.assert_array_equal(np.asarray(out), [0, 2, 3])
