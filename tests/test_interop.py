"""Reference-checkpoint occupancy interop: Morton/packed -> linear/bool."""

import numpy as np
import jax.numpy as jnp
import pytest

from nerfstyle_tpu.interop import (
    import_reference_grid_state,
    linear_grid_to_morton,
    morton_grid_to_linear,
    reference_bitfield_to_linear,
)
from nerfstyle_tpu.ops.morton import morton3d
from nerfstyle_tpu.ops.occupancy import packbits


def _ref_morton_scalar(x, y, z):
    """Scalar transcription of the CUDA Morton encode (raymarching.cu:56-71)."""
    def expand(v):
        v = (v * 0x00010001) & 0xFF0000FF
        v = (v * 0x00000101) & 0x0F00F00F
        v = (v * 0x00000011) & 0xC30C30C3
        v = (v * 0x00000005) & 0x49249249
        return v

    return expand(x) | (expand(y) << 1) | (expand(z) << 2)


class TestInterop:
    def test_morton_roundtrip(self):
        h = 8
        rng = np.random.default_rng(0)
        lin = jnp.asarray(rng.normal(size=(h**3,)).astype(np.float32))
        mor = linear_grid_to_morton(lin, h)
        back = morton_grid_to_linear(mor, h)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(lin))

    def test_morton_grid_maps_cells_correctly(self):
        """A single hot cell at (x, y, z) must land at its linear index."""
        h = 8
        x, y, z = 3, 5, 1
        code = _ref_morton_scalar(x, y, z)
        mor = np.zeros(h**3, np.float32)
        mor[code] = 7.0
        lin = np.asarray(morton_grid_to_linear(jnp.asarray(mor), h))
        assert lin[(x * h + y) * h + z] == 7.0
        assert lin.sum() == 7.0

    def test_reference_bitfield_import(self):
        h, cascade = 8, 2
        rng = np.random.default_rng(1)
        lin_bits = rng.random(cascade * h**3) < 0.3
        # Build the reference form: per cascade, Morton-order then pack.
        mor_bits = np.concatenate([
            np.asarray(linear_grid_to_morton(
                jnp.asarray(lin_bits[c * h**3:(c + 1) * h**3]), h))
            for c in range(cascade)
        ])
        packed = np.asarray(packbits(jnp.asarray(mor_bits)))
        back = reference_bitfield_to_linear(jnp.asarray(packed), h, cascade)
        np.testing.assert_array_equal(np.asarray(back), lin_bits)

    def test_import_grid_state(self):
        h, cascade = 8, 2
        rng = np.random.default_rng(2)
        lin_grid = rng.normal(size=(cascade, h**3)).astype(np.float32)
        mor_grid = np.stack([
            np.asarray(linear_grid_to_morton(jnp.asarray(lin_grid[c]), h))
            for c in range(cascade)
        ])
        lin_bits = lin_grid.reshape(-1) > 0
        mor_bits = np.concatenate([
            np.asarray(linear_grid_to_morton(
                jnp.asarray(lin_bits[c * h**3:(c + 1) * h**3]), h))
            for c in range(cascade)
        ])
        packed = np.asarray(packbits(jnp.asarray(mor_bits)))

        grid_out, bits_out = import_reference_grid_state(mor_grid, packed, h)
        np.testing.assert_array_equal(np.asarray(grid_out), lin_grid)
        np.testing.assert_array_equal(np.asarray(bits_out), lin_bits)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
