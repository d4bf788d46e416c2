"""tools/import_reference_ckpt.py: ingest a reference ``iter_*.pth``.

Builds a synthetic reference checkpoint with torch-cpu — config objects
pickled under a module name that is NOT importable at load time (exercising
the tolerant unpickler, exactly the situation of a real reference ckpt),
grid tables from a framework field init, and Morton-ordered occupancy per
the reference layout (renderer.py:61-66, raymarching.cu:367-399) — then
imports it and checks the framework ckpt round-trips: tables bit-exact,
occupancy linear layout restored, MLP heads loaded from the layer-wise npz,
and ``render.py``'s restore path renders from the converted file.
"""

import subprocess
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerfstyle_tpu.data.synthetic import generate_scene
from nerfstyle_tpu.interop import linear_grid_to_morton
from nerfstyle_tpu.models.fields import field_init, make_grid_spec, style_field_spec
from nerfstyle_tpu.ops.occupancy import packbits
from nerfstyle_tpu.training import checkpoint as ckpt_lib

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import import_reference_ckpt as imp  # noqa: E402

_FAKE_MOD = "reference_cfg_module_not_installed"


def _stub_cfg(**fields):
    """An object whose class lives in a module absent at unpickle time."""
    mod = sys.modules.get(_FAKE_MOD)
    if mod is None:
        mod = types.ModuleType(_FAKE_MOD)
        sys.modules[_FAKE_MOD] = mod
    cls = getattr(mod, "FakeCfg", None)
    if cls is None:
        cls = type("FakeCfg", (), {"__module__": _FAKE_MOD})
        mod.FakeCfg = cls
    obj = cls()
    obj.__dict__.update(fields)
    return obj


@pytest.fixture(scope="module")
def fixture_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ref_import")
    scene = tmp / "scene"
    generate_scene(scene, num_train=3, num_test=1, h=24, w=32)

    bound = 2.0
    grid_size = 16
    cascade = 2
    n_lvls, hashmap_size = 4, 11

    grid_spec = make_grid_spec(
        n_lvls=n_lvls, n_feats_per_lvl=2, hashmap_size=hashmap_size,
        min_res=16, max_res_coeff=8, max_bound=2 * bound,
    )
    spec = style_field_spec(
        grid_spec, class_dim=4, use_dir=False, sh_degree=4,
        density_hidden_dims=64, density_hidden_layers=1,
        rgb_hidden_dims=64, rgb_hidden_layers=2,
    )
    params = field_init(jax.random.PRNGKey(3), spec)

    # Occupancy in the reference's Morton-packed form.
    rng = np.random.default_rng(7)
    lin_grid = np.abs(rng.normal(size=(cascade, grid_size**3))).astype(np.float32)
    lin_bits = lin_grid.reshape(-1) > 0.8
    per = grid_size**3
    mor_grid = np.stack([
        np.asarray(linear_grid_to_morton(jnp.asarray(lin_grid[c]), grid_size))
        for c in range(cascade)
    ])
    mor_bits = np.concatenate([
        np.asarray(linear_grid_to_morton(
            jnp.asarray(lin_bits[c * per:(c + 1) * per]), grid_size))
        for c in range(cascade)
    ])
    packed = np.asarray(packbits(jnp.asarray(mor_bits)))

    pos_enc = _stub_cfg(n_lvls=n_lvls, n_feats_per_lvl=2,
                        hashmap_size=hashmap_size, min_res=16, max_res_coeff=8)
    net_cfg = _stub_cfg(pos_enc=pos_enc, dir_enc_sh_deg=4,
                        density_hidden_dims=64, density_hidden_layers=1,
                        rgb_hidden_dims=64, rgb_hidden_layers=2,
                        network_seed=3)
    render_cfg = _stub_cfg(grid_size=grid_size, max_steps=64,
                           update_thres=16, min_near=0.2)
    train_cfg = _stub_cfg(num_iterations=100, num_rays_per_batch=128)
    dataset_cfg = _stub_cfg(root_path=str(scene), type="Synthetic",
                            bound=bound, scale=1.0)

    model_sd = {
        "x_density_embedder.embeddings":
            torch.from_numpy(np.asarray(params["x_density_embedder"])),
        "x_color_embedder.embeddings":
            torch.from_numpy(np.asarray(params["x_color_embedder"])),
        # stand-ins for the non-convertible tcnn blobs
        "density_net.params": torch.zeros(16),
        "color1_net.params": torch.zeros(16),
        "color2_net.params": torch.zeros(16),
        "class_net.params": torch.zeros(16),
    }
    renderer_sd = {
        "model": model_sd,
        "intr": None,
        "precrop_frac": 1.0,
        "raymarch_channels": 3 + 4,
        "bound": bound,
        "density_grid": torch.from_numpy(mor_grid),
        "density_bitfield": torch.from_numpy(packed.astype(np.uint8)),
        "step_counter": torch.zeros(1, dtype=torch.int32),
        "local_step": 37,
        "mean_count": 4211,
        "mean_density": 0.125,
    }
    state = {
        "version": "ref-fixture",
        "log_dir": str(tmp / "logs"),
        "iter_ctr": 60,
        "cfg": _stub_cfg(style_image=None),
        "dataset_cfg": dataset_cfg,
        "train_cfg": train_cfg,
        "net_cfg": net_cfg,
        "render_cfg": render_cfg,
        "renderer": renderer_sd,
        "optim": {"state": {}},
        "scheduler": {},
        "scaler": {},
        "ema": {},
    }
    pth = tmp / "iter_060.pth"
    torch.save(state, pth)
    # Make the config classes unimportable, as a real reference ckpt's are.
    del sys.modules[_FAKE_MOD]

    heads = {}
    for net in ("density_net", "color1_net", "color2_net", "class_net"):
        for i, wmat in enumerate(params[net]):
            heads[f"{net}.{i}"] = np.asarray(wmat)
    npz = tmp / "heads.npz"
    np.savez(npz, **heads)

    return dict(tmp=tmp, pth=pth, npz=npz, params=params,
                lin_grid=lin_grid, lin_bits=lin_bits, scene=scene)


class TestImportReferenceCkpt:
    def test_tolerant_unpickle(self, fixture_ckpt):
        sd = imp.load_reference_ckpt(fixture_ckpt["pth"])
        assert sd["iter_ctr"] == 60
        assert sd["net_cfg"].pos_enc.n_lvls == 4  # stubbed class, attrs intact
        assert type(sd["net_cfg"]).__module__ == _FAKE_MOD

    def test_import_roundtrip(self, fixture_ckpt):
        out = fixture_ckpt["tmp"] / "imported.ckpt"
        rc = subprocess.run(
            [sys.executable, str(Path(imp.__file__)), str(fixture_ckpt["pth"]),
             "--out", str(out), "--mlp-npz", str(fixture_ckpt["npz"]),
             "--root-path", str(fixture_ckpt["scene"])],
            capture_output=True, text=True,
        )
        assert rc.returncode == 0, rc.stderr + rc.stdout
        meta, groups = ckpt_lib.load_checkpoint(out)
        assert meta["iter_ctr"] == 60
        assert meta["imported_mlp_heads"] == [
            "density_net", "color1_net", "color2_net", "class_net"]
        # params tree restores bit-exact against the source field
        params = fixture_ckpt["params"]
        restored = ckpt_lib.restore_tree(params, groups["params"])
        for a, b in zip(jax.tree_util.tree_leaves(restored),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # occupancy converted Morton -> linear
        from nerfstyle_tpu.ops.occupancy import PersistedOccupancy

        template = PersistedOccupancy(
            density_grid=jnp.zeros_like(jnp.asarray(fixture_ckpt["lin_grid"])),
            bitfield=jnp.zeros(fixture_ckpt["lin_bits"].shape, bool),
            mean_density=jnp.float32(0), mean_count=jnp.int32(0),
            local_step=jnp.int32(0),
        )
        occ = ckpt_lib.restore_tree(template, groups["occ"])
        np.testing.assert_allclose(
            np.asarray(occ.density_grid), fixture_ckpt["lin_grid"], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(occ.bitfield), fixture_ckpt["lin_bits"])
        assert int(occ.local_step) == 37
        assert int(occ.mean_count) == 4211

    def test_render_from_imported(self, fixture_ckpt):
        """render.py's restore path renders frames from the converted ckpt."""
        out = fixture_ckpt["tmp"] / "imported2.ckpt"
        rc = subprocess.run(
            [sys.executable, str(Path(imp.__file__)), str(fixture_ckpt["pth"]),
             "--out", str(out), "--mlp-npz", str(fixture_ckpt["npz"]),
             "--root-path", str(fixture_ckpt["scene"])],
            capture_output=True, text=True,
        )
        assert rc.returncode == 0, rc.stderr + rc.stdout
        rdir = fixture_ckpt["tmp"] / "render_out"
        repo = Path(imp.__file__).resolve().parent.parent
        rc = subprocess.run(
            [sys.executable, str(repo / "render.py"), str(out),
             "--out-dir", str(rdir), "--max-count", "1", "--yes"],
            capture_output=True, text=True,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )
        assert rc.returncode == 0, rc.stderr + rc.stdout
        frames = list(rdir.glob("*.png"))
        assert frames, "no frames rendered from imported ckpt"
