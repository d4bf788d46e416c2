"""Static-size stream compaction.

``compact_indices`` is a drop-in replacement for
``jnp.flatnonzero(mask, size=size, fill_value=fill_value)`` built on ONE
key sort instead of XLA's cumsum+scatter lowering.  Measured on v5e
(2026-08-17, in-graph): ~15 ms vs ~42 ms at a 1 M-element domain and
~23 ms vs ~84 ms at 8.4 M — compaction sits on every hot path here (the
marcher's window/sample compaction, the hash-grid dedup run structure, the
incremental renderer's alive-ray compaction), so the sort form is the
default throughout.

Equivalence: ascending positions of set bits, truncated to ``size``, padded
with ``fill_value`` — a sort of ``where(mask, iota, fill_value)`` yields
exactly that as its first ``size`` slots provided ``fill_value >= domain``
(asserted).  The CUDA reference needs no analog: its marchers compact with
atomic counters in-kernel (raymarching.cu:445-520).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_indices(mask: jnp.ndarray, size: int, fill_value: int) -> jnp.ndarray:
    """Ascending indices of True entries of 1-D ``mask``; static size.

    Exact drop-in for ``jnp.flatnonzero(mask, size=size, fill_value=fill)``
    for ``fill_value >= mask.shape[0]`` (the only form used on these hot
    paths — the sentinel doubles as the out-of-domain marker).
    """
    dom = mask.shape[0]
    assert fill_value >= dom, "sentinel must sort past every valid index"
    key = jnp.where(mask, jax.lax.iota(jnp.int32, dom), jnp.int32(fill_value))
    out = jax.lax.sort(key)[:size]
    if size > dom:
        out = jnp.pad(out, (0, size - dom), constant_values=fill_value)
    return out
