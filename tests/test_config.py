"""Config engine tests: YAML layering, CLI overrides, strictness."""

from pathlib import Path

import pytest

from nerfstyle_tpu.config import (
    BaseConfig,
    ConfigError,
    DatasetConfig,
    NetworkConfig,
    RendererConfig,
    TrainConfig,
    flatten,
    unflatten,
)

REPO = Path(__file__).parent.parent


@pytest.fixture(autouse=True)
def chdir_repo(monkeypatch):
    monkeypatch.chdir(REPO)


class TestFlatten:
    def test_roundtrip(self):
        d = {"a": 1, "b": {"c": 2, "d": {"e": 3}}}
        assert unflatten(flatten(d)) == d


class TestLayering:
    def test_defaults_from_yaml(self):
        cfg = TrainConfig.load()
        assert cfg.num_rays_per_batch == 4096
        assert cfg.num_iterations == 15000
        assert cfg.intervals.ckpt == 5000
        assert cfg.enable_amp is True
        assert cfg.ema_decay == 0.95

    def test_task_yaml_overlays_defaults(self):
        cfg = TrainConfig.load(Path("cfgs/training/style.yaml"))
        assert cfg.num_iterations == 200  # style overlay
        assert cfg.initial_learning_rate == 0.1
        assert cfg.style_lambda == 1.0
        assert cfg.num_rays_per_batch == 4096  # inherited from default

    def test_dataset_yaml(self):
        cfg = DatasetConfig.load(Path("cfgs/dataset/llff_room.yaml"))
        assert cfg.type == "LLFF"
        assert cfg.bound == 2.0
        assert cfg.scale == 0.33
        assert cfg.replica_cfg is None

    def test_renderer_llff_overlay(self):
        cfg = RendererConfig.load(Path("cfgs/renderer/llff.yaml"))
        assert cfg.flip_camera == 3
        assert cfg.max_steps == 1024  # from default

    def test_cli_override_nested(self):
        cfg, nargs = NetworkConfig.load_nargs(
            nargs=["--pos_enc.n_lvls", "8", "--density-hidden-dims", "32"]
        )
        assert cfg.pos_enc.n_lvls == 8
        assert cfg.density_hidden_dims == 32
        assert nargs == []

    def test_cli_bool_toggle(self):
        cfg, _ = TrainConfig.load_nargs(nargs=["--enable_amp"])
        assert cfg.enable_amp is False  # default true -> store_false

    def test_unknown_args_passthrough(self):
        _, nargs = TrainConfig.load_nargs(nargs=["--bogus-flag", "3"])
        assert "--bogus-flag" in nargs

    def test_float_field_accepts_float_despite_int_yaml_default(self):
        # cfgs/renderer/default.yaml says `density_thresh: 10` (an int);
        # the CLI type must come from the float annotation, not the YAML
        # default, or `--density_thresh 0.05` dies as an invalid int.
        cfg, _ = RendererConfig.load_nargs(nargs=["--density_thresh", "0.05"])
        assert cfg.density_thresh == pytest.approx(0.05)

    def test_arg_chaining_across_groups(self):
        # Mirrors trainers/base.py:99-108: each group consumes what it knows.
        nargs = ["--num_iterations", "10", "--grid_size", "64"]
        train_cfg, nargs = TrainConfig.load_nargs(nargs=nargs)
        render_cfg, nargs = RendererConfig.load_nargs(nargs=nargs)
        assert train_cfg.num_iterations == 10
        assert render_cfg.grid_size == 64
        assert nargs == []


class TestStrictness:
    def test_unknown_yaml_key_raises(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("root_path: /tmp\ntype: LLFF\nbound: 1.0\nscale: 1.0\nnonsense_key: 5\n")
        with pytest.raises(ConfigError, match="nonsense_key"):
            DatasetConfig.load(bad)

    def test_type_checking(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("bound: not_a_number\n")
        with pytest.raises(ConfigError):
            DatasetConfig.load(bad)


class TestBaseConfig:
    def test_paths_expand(self, monkeypatch):
        import sys

        monkeypatch.setattr(
            sys, "argv", ["prog", "--log-dir", "~/logs", "--data-cfg", "d.yaml"]
        )
        cfg, nargs = BaseConfig.read_nargs()
        assert "~" not in str(cfg.log_dir)
        assert cfg.style_image is None


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
