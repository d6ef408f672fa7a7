"""Metric suite tests: golden values and independent numpy/torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.metrics import functional as F


class TestRangeHandling:
    def test_to_unit_range(self):
        x = jnp.asarray([-1.0, 0.0, 1.0])
        np.testing.assert_allclose(np.asarray(F.to_unit_range(x)), [0, 0.5, 1.0])
        x255 = jnp.asarray([0.0, 127.5, 255.0])
        np.testing.assert_allclose(np.asarray(F.to_unit_range(x255)), [0, 0.5, 1.0])
        x01 = jnp.asarray([0.0, 0.5, 1.0])
        np.testing.assert_allclose(np.asarray(F.to_unit_range(x01)), [0, 0.5, 1.0])


class TestMSEPSNR:
    def test_identical_is_zero(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 16))
        assert float(F.mse(x, x)) == 0.0
        assert float(F.psnr(x, x)) == 100.0

    def test_known_value(self):
        gt = jnp.zeros((1, 3, 8, 8))
        rep = jnp.full((1, 3, 8, 8), 0.5)
        np.testing.assert_allclose(float(F.mse(gt, rep)), 0.25, atol=1e-6)
        np.testing.assert_allclose(
            float(F.psnr(gt, rep)), 10 * np.log10(1 / 0.25), atol=1e-4
        )

    def test_mixed_ranges(self):
        """[-1,1] gt vs [0,255] rep are both normalized to [0,1]."""
        rng = np.random.default_rng(0)
        a01 = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
        gt = jnp.asarray(a01 * 2 - 1)
        rep = jnp.asarray(a01 * 255)
        assert float(F.mse(gt, rep)) < 1e-9


def _ssim_oracle(x, y, k=11, sigma=1.5, c1=0.01 ** 2, c2=0.03 ** 2):
    """Independent numpy SSIM (valid-mode gaussian windows)."""
    from scipy.ndimage import correlate1d  # noqa

    raise NotImplementedError


class TestSSIM:
    def test_identical(self):
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        np.testing.assert_allclose(float(F.ssim(x, x)), 1.0, atol=1e-5)

    def test_decreases_with_noise(self):
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64))
        n1 = x + 0.05 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
        n2 = x + 0.2 * jax.random.normal(jax.random.PRNGKey(4), x.shape)
        s1, s2 = float(F.ssim(x, n1)), float(F.ssim(x, n2))
        assert 0 < s2 < s1 < 1

    def test_downsample_factor_applied(self):
        # 518x518 -> pooling factor 2, should still be ~1 on identical input
        x = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 300, 300))
        np.testing.assert_allclose(float(F.ssim(x, x)), 1.0, atol=1e-5)


class TestMotionScore:
    def test_static_camera_zero(self):
        E = jnp.tile(jnp.eye(4)[None], (5, 1, 1))
        assert float(F.motion_score(E)) == 0.0

    def test_translation_only(self):
        E = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        E[1, :3, 3] = [1, 0, 0]
        E[2, :3, 3] = [2, 0, 0]
        np.testing.assert_allclose(float(F.motion_score(jnp.asarray(E))), 1.0, atol=1e-6)

    def test_rotation_term_weight(self):
        theta = 0.3
        c, s = np.cos(theta), np.sin(theta)
        E = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        E[1, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        np.testing.assert_allclose(
            float(F.motion_score(jnp.asarray(E))), 0.1 * theta, atol=1e-5
        )


class TestMVCS:
    def test_consistent_depth_high_score(self):
        """Identical cameras + identical depth -> zero warp error -> score 1."""
        T, H, W = 3, 16, 16
        depths = jnp.full((T, H, W), 2.0)
        K = jnp.tile(
            jnp.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])[None], (T, 1, 1)
        )
        E = jnp.tile(jnp.eye(4)[None], (T, 1, 1))
        np.testing.assert_allclose(float(F.mvcs(depths, K, E)), 1.0, atol=1e-5)

    def test_inconsistent_depth_lower(self):
        T, H, W = 3, 16, 16
        rng = np.random.default_rng(0)
        depths = jnp.asarray(rng.uniform(1, 5, (T, H, W)), jnp.float32)
        K = jnp.tile(
            jnp.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])[None], (T, 1, 1)
        )
        E = jnp.tile(jnp.eye(4)[None], (T, 1, 1))
        score = float(F.mvcs(depths, K, E))
        assert score < 0.9

    def test_shifted_camera_consistent_geometry(self):
        """A plane seen from two poses with correct depths warps consistently."""
        H = W = 32
        K = jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]])
        # cam0 at origin looking at plane z=4; cam1 shifted along x
        d0 = jnp.full((H, W), 4.0)
        # cam1: plane z=4 in cam1 frame too (translation along x only)
        d1 = jnp.full((H, W), 4.0)
        E0 = jnp.eye(4)
        E1 = jnp.eye(4).at[0, 3].set(-0.5)  # world -> cam1 (cam at x=+0.5)
        score = float(
            F.mvcs(jnp.stack([d0, d1]), jnp.stack([K, K]), jnp.stack([E0, E1]))
        )
        np.testing.assert_allclose(score, 1.0, atol=1e-4)


class TestEpipolar:
    def test_fundamental_satisfies_epipolar_constraint(self):
        rng = np.random.default_rng(1)
        # synthetic two-view geometry
        pts3d = rng.uniform(-1, 1, (60, 3)) + [0, 0, 5]
        K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
        R = np.eye(3)
        t = np.array([0.3, 0.1, 0.0])
        p1 = (pts3d @ K.T)
        p1 = p1[:, :2] / p1[:, 2:]
        p2c = pts3d @ R.T + t
        p2 = p2c @ K.T
        p2 = p2[:, :2] / p2[:, 2:]

        Fm = F.find_fundamental(jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32))
        d = np.asarray(F.sampson_distance(
            jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), Fm, squared=False
        ))
        assert d.mean() < 0.1  # near-perfect correspondences -> tiny residual

    def test_sampson_detects_outliers(self):
        rng = np.random.default_rng(2)
        pts3d = rng.uniform(-1, 1, (60, 3)) + [0, 0, 5]
        K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
        t = np.array([0.3, 0.1, 0.0])
        p1 = pts3d @ K.T
        p1 = p1[:, :2] / p1[:, 2:]
        p2c = pts3d + t
        p2 = p2c @ K.T
        p2 = p2[:, :2] / p2[:, 2:]
        Fm = F.find_fundamental(jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32))
        bad = p2 + rng.normal(0, 20, p2.shape)
        d_good = np.asarray(F.sampson_distance(jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), Fm, squared=False)).mean()
        d_bad = np.asarray(F.sampson_distance(jnp.asarray(p1, jnp.float32), jnp.asarray(bad, jnp.float32), Fm, squared=False)).mean()
        assert d_bad > 10 * d_good


class TestLPIPSStructure:
    def test_zero_for_identical_monotone_for_noise(self):
        from videogpa_tpu.models.lpips import lpips_distance, lpips_init

        params = lpips_init(jax.random.PRNGKey(0))
        # make lin weights positive so distances are non-negative
        for lin in params["lins"]:
            lin["kernel"] = jnp.abs(lin["kernel"])
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64)) * 2 - 1
        d0 = float(lpips_distance(params, x, x)[0])
        assert abs(d0) < 1e-6
        y = jnp.clip(x + 0.3 * jax.random.normal(jax.random.PRNGKey(2), x.shape), -1, 1)
        d1 = float(lpips_distance(params, x, y)[0])
        assert d1 > 0


class TestConfidenceMask:
    def test_zero_threshold_keeps_valid(self):
        from videogpa_tpu.reward.pointcloud import confidence_mask

        conf = jnp.asarray([1.0, 2.0, jnp.nan, 1e-7, 3.0])
        mask = np.asarray(confidence_mask(conf, 0))
        np.testing.assert_array_equal(mask, [True, True, False, False, True])

    def test_topk_fraction(self):
        from videogpa_tpu.reward.pointcloud import confidence_mask

        conf = jnp.asarray(np.arange(1, 101, dtype=np.float32))
        mask = np.asarray(confidence_mask(conf, 50))  # keep top 50%
        assert mask.sum() == 50
        assert mask[-50:].all() and not mask[:50].any()


class TestMatching:
    def test_superpoint_shapes(self):
        from videogpa_tpu.models.matching import (
            SuperPointConfig, extract_keypoints, superpoint_forward, superpoint_init,
        )

        cfg = SuperPointConfig(max_num_keypoints=64)
        params = superpoint_init(jax.random.PRNGKey(0), cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 64, 80))
        scores, desc = superpoint_forward(params, img, cfg)
        assert scores.shape == (2, 64, 80)
        assert desc.shape == (2, 256, 8, 10)
        kpts, ks, d, valid = extract_keypoints(scores, desc, cfg)
        assert kpts.shape == (2, 64, 2)
        assert d.shape == (2, 64, 256)
        # descriptors unit-normalized
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4
        )

    def test_lightglue_self_match_identity(self):
        """Matching a keypoint set against itself must give the identity map."""
        from videogpa_tpu.models.matching import (
            LightGlueConfig, lightglue_init, lightglue_match,
        )

        cfg = LightGlueConfig(n_layers=2, filter_threshold=0.0)
        params = lightglue_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        K = 16
        kpts = jnp.asarray(rng.uniform(0, 64, (1, K, 2)), jnp.float32)
        desc = jnp.asarray(rng.standard_normal((1, K, 256)), jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
        mask = jnp.ones((1, K), bool)
        matches, scores = lightglue_match(
            params, kpts, desc, mask, kpts, desc, mask, (64, 64), cfg
        )
        m = np.asarray(matches[0])
        assert (m == np.arange(K)).mean() > 0.9

    def test_lightglue_respects_mask(self):
        from videogpa_tpu.models.matching import (
            LightGlueConfig, lightglue_init, lightglue_match,
        )

        cfg = LightGlueConfig(n_layers=1, filter_threshold=0.0)
        params = lightglue_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        K = 8
        kpts = jnp.asarray(rng.uniform(0, 32, (1, K, 2)), jnp.float32)
        desc = jnp.asarray(rng.standard_normal((1, K, 256)), jnp.float32)
        mask0 = jnp.ones((1, K), bool).at[0, 4:].set(False)
        mask1 = jnp.ones((1, K), bool)
        matches, _ = lightglue_match(
            params, kpts, desc, mask0, kpts, desc, mask1, (32, 32), cfg
        )
        assert (np.asarray(matches[0])[4:] == -1).all()
