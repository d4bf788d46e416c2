#!/usr/bin/env python
"""Round-4 encoder experiments: attack the ~13 ns/row XLA gather floor.

VERDICT r03 #3 asks for a second structured attempt at the hash-grid
lookup wall, in order:
  (a) bf16 embedding tables — halve HBM bytes/row (expect NO win if the
      gather is issue-rate-bound, which the round-2/3 cost model implies:
      "row width barely matters below ~64 f32");
  (b) MXU one-hot lookup for small (coarse-level) tables: the table lookup
      one_hot(idx)[B,T] @ table[T,C] rides the systolic array instead of
      the scalar gather unit.  Win condition: B*T*128(pad) MACs at MXU
      rate beat 13 ns/row — true only for T below a few thousand;
  (c) Mosaic dim-0 dynamic_gather retest (the VMEM-table unlock; failed
      to compile on the round-2/3 toolchain — retest on every bump);
  (d) the backward analog of (b): table-grad = one_hot(idx).T @ cot, an
      MXU scatter replacing the sort pipeline for small tables.

Each experiment prints a JSON line; run on the real TPU (axon).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 1_572_864  # 196k samples x 8 corners: one fine level's gather stream
REPS = 5


def force(x):
    return np.asarray(jax.device_get(x))


def timeit(fn, *args, reps=REPS):
    out = fn(*args)  # compile
    force(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def exp_row_gather_dtype():
    """(a) row gather [T, C] at f32 vs bf16."""
    key = jax.random.PRNGKey(0)
    T = 1 << 19
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, T)
    for dtype, c in ((jnp.float32, 4), (jnp.bfloat16, 4), (jnp.bfloat16, 8)):
        tab = jax.random.normal(key, (T, c), dtype)

        @jax.jit
        def f(tab, idx):
            return jnp.take(tab, idx, axis=0).astype(jnp.float32).sum()

        dt = timeit(f, tab, idx)
        emit(exp="row_gather", dtype=str(dtype.__name__), C=c, T=T, B=B,
             ms=round(dt * 1e3, 2), ns_per_row=round(dt / B * 1e9, 2))


def exp_onehot_matmul():
    """(b) lookup via one-hot matmul for small tables, vs gather."""
    for log2T in (10, 12, 13, 14, 16):
        T = 1 << log2T
        idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, T)
        tab = jax.random.normal(jax.random.PRNGKey(0), (T, 4), jnp.bfloat16)

        @jax.jit
        def gather(tab, idx):
            return jnp.take(tab, idx, axis=0).astype(jnp.float32).sum()

        dt_g = timeit(gather, tab, idx)

        # one-hot matmul, scanned over B-blocks so the [blk, T] one-hot
        # stays small; XLA may or may not fuse the iota-compare into the
        # dot operand — measuring tells us.
        blk = 1 << 15

        @jax.jit
        def onehot(tab, idx):
            def body(acc, ib):
                oh = (
                    ib[:, None] == jax.lax.iota(jnp.int32, T)[None, :]
                ).astype(jnp.bfloat16)
                return acc + jnp.dot(
                    oh, tab, preferred_element_type=jnp.float32
                ).sum(), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), idx.reshape(-1, blk)
            )
            return acc

        dt_o = timeit(onehot, tab, idx)
        emit(exp="onehot_vs_gather", T=T, B=B,
             gather_ms=round(dt_g * 1e3, 2), onehot_ms=round(dt_o * 1e3, 2),
             win=round(dt_g / dt_o, 2))


def exp_mosaic_dyngather():
    """(c) Mosaic dim-0 dynamic_gather retest (table lookup in VMEM)."""
    try:
        from jax.experimental import pallas as pl

        T, C = 1024, 128

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take(tab_ref[...], idx_ref[...], axis=0)

        tab = jax.random.normal(jax.random.PRNGKey(0), (T, C), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (256,), 0, T)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((256, C), jnp.float32),
        )(tab, idx)
        ok = bool(np.allclose(force(out), force(jnp.take(tab, idx, axis=0))))
        emit(exp="mosaic_dim0_dynamic_gather", compiles=True, correct=ok)
    except Exception as e:  # noqa: BLE001 — negative result is the datum
        emit(exp="mosaic_dim0_dynamic_gather", compiles=False,
             error=str(e)[:160])


def exp_onehot_scatter():
    """(d) table-grad via one_hot.T @ cot (MXU) vs sort+scatter-free
    baseline: plain segment/scatter-add of duplicate rows."""
    for log2T in (10, 12, 13, 14):
        T = 1 << log2T
        idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, T)
        cot = jax.random.normal(jax.random.PRNGKey(2), (B, 4), jnp.float32)

        @jax.jit
        def scat(idx, cot):
            z = jnp.zeros((T, 4), jnp.float32)
            return z.at[idx].add(cot).sum()

        dt_s = timeit(scat, idx, cot)

        blk = 1 << 15

        @jax.jit
        def mxu(idx, cot):
            def body(acc, args):
                ib, cb = args
                oh = (
                    ib[:, None] == jax.lax.iota(jnp.int32, T)[None, :]
                ).astype(jnp.bfloat16)
                return acc + jnp.dot(
                    oh.T, cb.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((T, 4), jnp.float32),
                (idx.reshape(-1, blk), cot.reshape(-1, blk, 4)),
            )
            return acc.sum()

        dt_m = timeit(mxu, idx, cot)
        emit(exp="onehot_scatter_vs_scatteradd", T=T, B=B,
             scatter_ms=round(dt_s * 1e3, 2), mxu_ms=round(dt_m * 1e3, 2),
             win=round(dt_s / dt_m, 2))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    exp_mosaic_dyngather()
    exp_row_gather_dtype()
    exp_onehot_matmul()
    exp_onehot_scatter()
