"""Loss tests: recon losses vs closed forms, style losses vs naive references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstyle_tpu.losses.recon import cross_entropy_ignore, sparsity_loss, weight_reg_loss
from nerfstyle_tpu.losses.style import (
    AdaINStyleLoss,
    GramStyleLoss,
    MattingLaplacian,
    NNFMStyleLoss,
    SemanticStyleLoss,
    compute_centroid,
    cosine_dists,
    get_style_loss,
    labels_downscale,
)


class TestCrossEntropy:
    def test_matches_manual(self):
        logits = jnp.asarray([[2.0, 1.0, 0.1], [0.5, 2.5, 0.2]])
        labels = jnp.asarray([0, 1])
        got = float(cross_entropy_ignore(logits, labels))
        p = np.exp(np.asarray(logits))
        p /= p.sum(-1, keepdims=True)
        want = -np.mean([np.log(p[0, 0]), np.log(p[1, 1])])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_ignore_index(self):
        logits = jnp.asarray([[2.0, 1.0], [9.0, -9.0], [0.0, 5.0]])
        labels = jnp.asarray([0, -1, 1])
        got = float(cross_entropy_ignore(logits, labels))
        p = jax.nn.log_softmax(logits)
        want = -(float(p[0, 0]) + float(p[2, 1])) / 2
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestSparsity:
    def test_zero_density_zero_loss(self):
        assert float(sparsity_loss(jnp.zeros(10), 0.05)) == 0.0

    def test_formula(self):
        sig = jnp.asarray([1.0, 2.0])
        want = np.mean(np.abs(1 - np.exp(-0.05 * np.asarray(sig))))
        np.testing.assert_allclose(float(sparsity_loss(sig, 0.05)), want, rtol=1e-6)


class TestWeightReg:
    def test_only_net_keys(self):
        params = {
            "x_density_embedder": jnp.ones((4, 2)),
            "density_net": [jnp.ones((2, 2))],
        }
        got = float(weight_reg_loss(params))
        np.testing.assert_allclose(got, 2.0, rtol=1e-6)  # norm of ones((2,2)) = 2


class TestHelpers:
    def test_centroid_center(self):
        mask = jnp.zeros((10, 10), bool).at[5, 5].set(True)
        c = np.asarray(compute_centroid(mask))
        np.testing.assert_allclose(c, [0.5, 0.5], atol=0.01)

    def test_labels_downscale_exact_law(self):
        labels = jnp.arange(16).reshape(4, 4)
        small = np.asarray(labels_downscale(labels, (2, 2)))
        # linspace(0,3,2) = [0,3] -> rows/cols 0 and 3
        np.testing.assert_array_equal(small, [[0, 3], [12, 15]])

    def test_cosine_dists_range(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
        d = np.asarray(cosine_dists(a, a))
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
        assert np.all(d > -1e-5) and np.all(d < 2 + 1e-5)


def _feat_dict(seed, c=8, h=6, w=5):
    rng = np.random.default_rng(seed)
    return {"relu3": jnp.asarray(rng.random((1, c, h, w)), jnp.float32)}


class TestGramAdaINNNFM:
    def test_gram_zero_for_identical(self):
        f = _feat_dict(0)
        loss = GramStyleLoss(["relu3"])
        assert float(loss(f, f)) < 1e-10

    def test_adain_zero_for_identical(self):
        f = _feat_dict(1)
        loss = AdaINStyleLoss(["relu3"])
        assert float(loss(f, f)) < 1e-10

    def test_nnfm_zero_for_identical(self):
        f = _feat_dict(2)
        loss = NNFMStyleLoss(["relu3"])
        assert float(loss(f, f)) < 1e-5

    def test_positive_for_different(self):
        f1, f2 = _feat_dict(3), _feat_dict(4)
        for name in ("GramStyleLoss", "AdaINStyleLoss", "NNFMStyleLoss"):
            loss = get_style_loss(name, "relu3")
            assert float(loss(f1, f2)) > 0


class TestSemantic:
    def _setup(self, tmp_path):
        rng = np.random.default_rng(0)
        seg = np.repeat(np.arange(2), 8 * 4).reshape(8, 8)  # 2 clusters, halves
        path = tmp_path / "seg.npz"
        np.savez(path, seg_map=seg)
        loss = SemanticStyleLoss(["relu3"], clusters_path=path)
        style_feats = {"relu3": jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)}
        loss.init_feats(style_feats, num_classes=2)
        return loss

    def test_matching_computed_and_loss_finite(self, tmp_path):
        loss = self._setup(tmp_path)
        rng = np.random.default_rng(1)
        img_feats = {"relu3": jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)}
        preds = jnp.asarray(np.repeat(np.arange(2), 32).reshape(8, 8))
        val = float(loss(img_feats, None, preds))
        assert np.isfinite(val)
        assert loss.matching is not None and len(loss.matching) == 2

    def test_masking_restricts_matches(self, tmp_path):
        """With matching fixed, a pixel's NN must come from its matched
        cluster: perfect-match features in the wrong cluster are ignored."""
        loss = self._setup(tmp_path)
        loss.matching = np.asarray([0, 1])
        style = np.asarray(loss.style_feats)  # [C, 8, 8]
        img = np.ones_like(style) * 100.0  # far from everything
        # pixel (0,0) is class 0 -> may match only cluster-0 rows (0..3)
        img_feats = {"relu3": jnp.asarray(img[None])}
        preds = jnp.asarray(np.repeat(np.arange(2), 32).reshape(8, 8))
        v1 = float(loss(img_feats, None, preds))
        assert np.isfinite(v1) and v1 > 0

    def test_thin_cluster_never_matched(self, tmp_path):
        """A cluster erased by nearest-downsampling to feature resolution
        must not be assigned by the Hungarian matching, and the loss stays
        finite (regression: inf loss when a matched cluster had no pixels at
        feature resolution)."""
        rng = np.random.default_rng(3)
        # 16x16 seg: clusters 0/1 are halves, cluster 2 is ONE thin row that
        # nearest-downsampling to 8x8 erases (row 15 never sampled).
        seg = np.repeat(np.arange(2), 8 * 16).reshape(16, 16).copy()
        seg[15, :] = 2
        path = tmp_path / "seg_thin.npz"
        np.savez(path, seg_map=seg)
        loss = SemanticStyleLoss(["relu3"], clusters_path=path)
        style_feats = {"relu3": jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)}
        loss.init_feats(style_feats, num_classes=3)
        assert int(jnp.sum(loss.clusters == 2)) == 0  # premise: erased

        img_feats = {"relu3": jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)}
        preds = jnp.asarray((np.arange(64) % 3).reshape(8, 8))
        val = float(loss(img_feats, None, preds))
        assert np.isfinite(val)
        assert 2 not in set(int(m) for m in loss.matching)

    def test_no_matching_mode(self):
        loss = SemanticStyleLoss(["relu3"], clusters_path=None)
        rng = np.random.default_rng(2)
        style = {"relu3": jnp.asarray(rng.random((1, 4, 6, 6)), jnp.float32)}
        loss.init_feats(style, num_classes=3)
        img = {"relu3": jnp.asarray(rng.random((1, 4, 6, 6)), jnp.float32)}
        val = float(loss(img, None, jnp.zeros((6, 6), jnp.int32)))
        assert np.isfinite(val)


class TestMattingLaplacian:
    def test_constant_image_zero_energy(self):
        """A constant style map lies in the Laplacian's null space."""
        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.random((3, 8, 8)), jnp.float32)
        const = jnp.ones((3, 8, 8)) * 0.5
        ml = MattingLaplacian()
        val = float(ml(target, const))
        np.testing.assert_allclose(val, 0.0, atol=1e-3)

    def test_positive_semidefinite(self):
        rng = np.random.default_rng(1)
        target = jnp.asarray(rng.random((3, 8, 8)), jnp.float32)
        ml = MattingLaplacian()
        for seed in range(3):
            v = jnp.asarray(np.random.default_rng(seed).random((3, 8, 8)), jnp.float32)
            assert float(ml(target, v)) > -1e-3


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
