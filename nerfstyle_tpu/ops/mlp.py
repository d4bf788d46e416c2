"""Small fused-style MLP stacks for neural fields.

TPU-native equivalent of the tiny-cuda-nn ``FullyFusedMLP`` networks used by the
reference model (``/root/reference/networks/style_nerf.py:44-98``).  tcnn's
fully-fused MLPs are 64-wide, ReLU, **bias-free** matmul chains in fp16; on TPU
the same structure maps directly onto the MXU as a chain of
``[M, 64] x [64, 64]`` matmuls in bf16 with fp32 accumulation, which XLA fuses
with the surrounding elementwise ops.  A hand-written Pallas kernel is layered
in later only if profiling shows the XLA schedule leaving MXU idle.

Also hosts ``trunc_exp``: exp with a gradient-clamped backward
(``networks/tcnn_nerf.py:55-69``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def mlp_init(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    hidden_layers: int,
    out_dim: int,
    dtype: jnp.dtype = jnp.float32,
) -> List[jnp.ndarray]:
    """Initialize a bias-free MLP: in -> [hidden]*hidden_layers -> out.

    He-uniform fan-in init (tcnn initializes similarly for ReLU nets).
    Returns a list of weight matrices [d_in, d_out].
    """
    dims = [in_dim] + [hidden_dim] * hidden_layers + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    ws = []
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        bound = (6.0 / d_in) ** 0.5
        ws.append(jax.random.uniform(k, (d_in, d_out), dtype, -bound, bound))
    return ws


def mlp_apply(
    weights: Sequence[jnp.ndarray],
    x: jnp.ndarray,
    output_activation: Optional[str] = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Apply a bias-free ReLU MLP.

    Args:
        weights: list of [d_in, d_out] matrices.
        x: [M, in_dim] inputs.
        output_activation: None | 'sigmoid' (matching the reference's tcnn
            configs: 'None' / 'Sigmoid', style_nerf.py:50,80).
        compute_dtype: matmul input dtype (bf16 under mixed precision);
            accumulation is always fp32 via preferred_element_type.
    """
    h = x.astype(compute_dtype)
    n = len(weights)
    for i, w in enumerate(weights):
        h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
            h = h.astype(compute_dtype)
    h = h.astype(jnp.float32)
    if output_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    elif output_activation is not None:
        raise ValueError(f"unknown output activation {output_activation!r}")
    return h


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp(x) with backward using exp(clamp(x, -15, 15)) (tcnn_nerf.py:55-69)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
