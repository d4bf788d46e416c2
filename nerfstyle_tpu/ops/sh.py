"""Spherical-harmonics direction encoding, closed form.

TPU-native equivalent of the tiny-cuda-nn ``SphericalHarmonics`` encoding used
by the reference (``/root/reference/networks/style_nerf.py:33-42``,
``networks/tcnn_nerf.py:87-95``; config ``dir_enc_sh_deg: 4``).  Pure
polynomial evaluation — fuses entirely into neighbouring elementwise ops under
XLA; no kernel needed.

Convention matches tcnn: inputs are directions mapped to [0, 1] (the model does
``(dirs + 1) / 2`` first, style_nerf.py:134), and the encoder maps back to
[-1, 1] internally.  Output dim = degree**2.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs01: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate real SH basis values for directions.

    Args:
        dirs01: [..., 3] directions in [0, 1] (tcnn convention).
        degree: SH degree in [1, 4]; output has degree**2 channels.

    Returns:
        [..., degree**2] basis values.
    """
    assert 1 <= degree <= 4, "sh_encode supports degrees 1..4"
    d = dirs01 * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    out = [jnp.full_like(x, 0.28209479177387814)]

    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * x * y * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]

    return jnp.stack(out, axis=-1)
