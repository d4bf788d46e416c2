"""Inference dispatch sizing under the per-dispatch sample budget.

When march demand grows the samples/ray bucket, the rays-per-dispatch chunk
must SHRINK so chunk * bucket stays within ``infer_sample_budget`` — the
encoder-gather temps of one dispatch scale with that product, and an
unbounded product compiles graphs whose temporaries exceed HBM (measured:
a 25.7 GB allocation at 8192 rays x 1024 samples/ray on a 16 GB v5e).
These tests pin the cap law and the exactness of sub-chunk merging in
``Renderer._render_piece`` without building a full Renderer (the logic is
pure given settings + bucket state).
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.core.types import make_rays
from nerfstyle_tpu.render.renderer import Renderer, RenderSettings


def _stub(spr_bucket, chunk=8192, budget=4_194_304, win_bucket=None,
          chunk_max=None, max_steps=1024, probe_budget=3_000_000):
    settings = RenderSettings(
        grid_size=16, max_steps=max_steps,
        infer_chunk=chunk, infer_sample_budget=budget,
        infer_chunk_max=chunk if chunk_max is None else chunk_max,
        infer_probe_budget=probe_budget,
    )
    return SimpleNamespace(
        settings=settings,
        bound=2.0,  # bench scene bound; Tc = ceil((bound*steps+1)/8)
        _infer_spr_bucket=spr_bucket,
        # Candidate-window bucket: defaults to the samples/ray bucket (its
        # lower bound in the real renderer, where windows >= kept samples).
        _infer_win_bucket=spr_bucket if win_bucket is None else win_bucket,
    )


class TestInferChunkCap:
    def test_low_demand_keeps_full_chunk(self):
        # 8192 rays * 512/ray = 4.2M = exactly the budget -> no shrink.
        assert Renderer._infer_chunk_cap(_stub(512)) == 8192

    def test_high_demand_halves_chunk(self):
        # 1024/ray: 8192 rays would need 8.4M samples -> cap at 4096 rays.
        assert Renderer._infer_chunk_cap(_stub(1024)) == 4096

    def test_extreme_demand_floors_at_256(self):
        assert Renderer._infer_chunk_cap(_stub(1 << 20)) == 256

    def test_cap_is_power_of_two_and_within_budget(self):
        for spr in (1, 7, 64, 100, 511, 513, 2048):
            cap = Renderer._infer_chunk_cap(_stub(spr))
            assert cap & (cap - 1) == 0
            assert cap == 256 or cap * spr <= 4_194_304

    def test_never_exceeds_chunk_max(self):
        assert Renderer._infer_chunk_cap(_stub(1, chunk=2048)) == 2048

    def test_low_demand_grows_chunk_past_infer_chunk(self):
        # Converged regime (64/ray): the chunk auto-grows past infer_chunk
        # within the sample budget — but only as far as the COARSE-PROBE
        # budget allows (3M probes / 257 windows-per-ray at 1024 steps =>
        # 8192): the stage-1 [N, Tc] stream scales with rays regardless of
        # occupancy, and an unbounded 65536-ray graph OOMed the remote
        # compiler (r5 seeding run).
        assert Renderer._infer_chunk_cap(
            _stub(64, chunk=4096, chunk_max=65536)
        ) == 8192
        # A coarser march (fewer probes/ray) legitimately allows more rays.
        assert Renderer._infer_chunk_cap(
            _stub(64, chunk=4096, chunk_max=65536, max_steps=256)
        ) == 32768
        assert Renderer._infer_chunk_cap(
            _stub(256, chunk=8192, chunk_max=65536, max_steps=256)
        ) == 16384

    def test_probe_budget_bounds_chunk(self):
        # Raising the probe budget is the explicit opt-in to bigger graphs.
        assert Renderer._infer_chunk_cap(
            _stub(64, chunk=4096, chunk_max=65536, probe_budget=20_000_000)
        ) == 65536

    def test_window_bucket_bounds_chunk_independently(self):
        # Tiny kept-samples bucket but a huge candidate window: the window
        # envelope (4x the sample budget) must shrink the chunk even though
        # spr alone would allow the maximum.
        assert Renderer._infer_chunk_cap(
            _stub(8, budget=1 << 20, win_bucket=1 << 14)
        ) == 256
        # 4 * 2^20 // 2^10 = 4096 < spr cap (2^20 // 8) -> window governs.
        assert Renderer._infer_chunk_cap(
            _stub(8, budget=1 << 20, win_bucket=1 << 10)
        ) == 4096


class TestRenderPieceMerge:
    """_render_piece must be output-equivalent to one whole-piece dispatch:
    maps concatenate in ray order, demand counters stay conservative."""

    def _fake_renderer(self, spr_bucket, budget, calls):
        stub = _stub(spr_bucket, budget=budget)

        def chunk_infer(params, rays, round_size):
            n = rays.origins.shape[0]
            calls.append(n)
            # Value = pure ray identity (origins encode the global index),
            # so sub-chunked and whole-piece dispatches must agree exactly.
            base = rays.origins[:, 0] * 1e-3
            return {
                "rgb_map": jnp.stack([base, base + 1, base + 2], axis=-1),
                "trans_map": base * 0.5,
                "classes": jnp.stack([base, base], axis=-1),
                "weights_sum": base + 0.25,
                # Per-ray demand of 3 samples -> piece-scaled counter.
                "num_marched": jnp.asarray(3 * n, jnp.int32),
                "num_cand": jnp.asarray(2 * n, jnp.int32),
                "num_sig": jnp.asarray(n, jnp.int32),
                "num_evals": jnp.asarray(5 * n, jnp.int32),
            }

        stub._render_chunk_infer = chunk_infer
        stub._infer_chunk_cap = lambda: Renderer._infer_chunk_cap(stub)
        return stub

    def _rays(self, n):
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = 1000.0 * np.arange(n)  # ray identity -> order check
        d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        return make_rays(jnp.asarray(o), jnp.asarray(d))

    def test_single_dispatch_when_under_cap(self):
        calls = []
        r = self._fake_renderer(spr_bucket=4, budget=4_194_304, calls=calls)
        out = Renderer._render_piece(r, {}, self._rays(1024), 32)
        assert calls == [1024]
        assert out["rgb_map"].shape == (1024, 3)

    def test_subchunks_concatenate_in_ray_order(self):
        calls = []
        # budget 1024 at 4/ray -> cap 256 rays; 1024-ray piece -> 4 dispatches
        r = self._fake_renderer(spr_bucket=4, budget=1024, calls=calls)
        rays = self._rays(1024)
        out = Renderer._render_piece(r, {}, rays, 32)
        assert calls == [256] * 4
        whole = []
        r2 = self._fake_renderer(4, 4_194_304, whole)
        ref = Renderer._render_piece(r2, {}, rays, 32)
        for k in ("rgb_map", "trans_map", "classes", "weights_sum"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), err_msg=k
            )
        # Counters: per-ray demand is uniform (3/ray), so the piece-scaled
        # max equals the whole-piece dispatch's value exactly.
        for k in ("num_marched", "num_cand", "num_sig"):
            assert int(out[k]) == int(ref[k]), k
        # Diagnostics sum exactly.
        assert int(out["num_evals"]) == int(ref["num_evals"])

    def test_counter_scaling_is_conservative(self):
        """A piece whose WORST sub-chunk demands d/ray must report >= d * n
        so the caller's capacity check (marched <= n * bucket) still grows
        the bucket; summing sub-chunks could hide the spike."""
        calls = []
        r = self._fake_renderer(spr_bucket=4, budget=1024, calls=calls)

        hot = {"i": 0}
        base_infer = r._render_chunk_infer

        def spiky(params, rays, round_size):
            out = dict(base_infer(params, rays, round_size))
            hot["i"] += 1
            if hot["i"] == 2:  # second sub-chunk demands 10/ray
                out["num_marched"] = jnp.asarray(
                    10 * rays.origins.shape[0], jnp.int32
                )
            return out

        r._render_chunk_infer = spiky
        out = Renderer._render_piece(r, {}, self._rays(1024), 32)
        assert int(out["num_marched"]) >= 10 * 1024


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
