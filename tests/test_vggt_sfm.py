"""VGGT SfM dependency pack: distortion/projection parity vs the vendored
reference torch code (``vggt/dependency/distortion.py``, ``projection.py``
— importable directly, so these are true oracles), COLMAP interop round
trip, and a track-prediction smoke on the tiny VGGT."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from videogpa_tpu.models.vggt.sfm import (  # noqa: E402
    apply_distortion,
    batch_matrix_to_colmap,
    colmap_to_batch_matrix,
    iterative_undistortion,
    predict_tracks,
    project_3d_points,
    rank_query_frames,
)


def _ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from vggt.dependency import distortion as ref_dist
    from vggt.dependency import projection as ref_proj

    return ref_dist, ref_proj


needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "vggt")), reason="reference absent"
)


class TestDistortionParity:
    @needs_ref
    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_apply_distortion_matches_reference(self, k):
        ref_dist, _ = _ref_modules()
        rng = np.random.default_rng(0)
        params = (rng.uniform(-0.05, 0.05, (3, k))).astype(np.float32)
        u = rng.uniform(-0.5, 0.5, (3, 50)).astype(np.float32)
        v = rng.uniform(-0.5, 0.5, (3, 50)).astype(np.float32)
        ru, rv = ref_dist.apply_distortion(params, u, v)
        gu, gv = apply_distortion(jnp.asarray(params), jnp.asarray(u), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(gu), ru.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gv), rv.numpy(), atol=1e-6)

    @needs_ref
    def test_iterative_undistortion_matches_reference(self):
        ref_dist, _ = _ref_modules()
        rng = np.random.default_rng(1)
        params = rng.uniform(-0.05, 0.05, (2, 2)).astype(np.float32)
        tracks = rng.uniform(-0.6, 0.6, (2, 40, 2)).astype(np.float32)
        want = ref_dist.iterative_undistortion(params, tracks).numpy()
        got = np.asarray(iterative_undistortion(jnp.asarray(params), jnp.asarray(tracks)))
        np.testing.assert_allclose(got, want, atol=1e-4)
        # and it actually inverts apply_distortion
        du, dv = apply_distortion(
            jnp.asarray(params), jnp.asarray(got[..., 0]), jnp.asarray(got[..., 1])
        )
        np.testing.assert_allclose(np.asarray(du), tracks[..., 0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), tracks[..., 1], atol=1e-4)

    @needs_ref
    def test_projection_matches_reference(self):
        _, ref_proj = _ref_modules()
        rng = np.random.default_rng(2)
        pts = rng.standard_normal((30, 3)).astype(np.float32)
        pts[:, 2] += 5.0
        extr = np.tile(np.eye(3, 4, dtype=np.float32)[None], (2, 1, 1))
        extr[:, :3, 3] = rng.standard_normal((2, 3)) * 0.1
        K = np.tile(np.diag([100.0, 100.0, 1.0]).astype(np.float32)[None], (2, 1, 1))
        K[:, 0, 2], K[:, 1, 2] = 64, 48
        extra = rng.uniform(-0.02, 0.02, (2, 1)).astype(np.float32)
        want2d, want_cam = ref_proj.project_3D_points_np(pts, extr, K, extra)
        got2d, got_cam = project_3d_points(
            jnp.asarray(pts), jnp.asarray(extr), jnp.asarray(K), jnp.asarray(extra)
        )
        np.testing.assert_allclose(np.asarray(got_cam), want_cam, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got2d), want2d, atol=1e-3)


class TestColmapInterop:
    def test_round_trip(self):
        rng = np.random.default_rng(3)
        P, B = 20, 3
        pts = rng.standard_normal((P, 3)).astype(np.float32)
        extr = np.tile(np.eye(3, 4, dtype=np.float32)[None], (B, 1, 1))
        extr[:, :, 3] = rng.standard_normal((B, 3)).astype(np.float32)
        K = np.tile(np.diag([80.0, 82.0, 1.0]).astype(np.float32)[None], (B, 1, 1))
        K[:, 0, 2], K[:, 1, 2] = 32, 24
        tracks = rng.uniform(0, 64, (B, P, 2)).astype(np.float32)
        mask = rng.uniform(size=(B, P)) > 0.3
        cams, images, p3d = batch_matrix_to_colmap(pts, extr, K, tracks, mask)
        assert len(images) == B and len(p3d) == P
        # observations match the mask
        for b in range(B):
            assert images[b + 1].xys.shape[0] == int(mask[b].sum())
        pts2, extr2, K2 = colmap_to_batch_matrix(cams, images, p3d)
        np.testing.assert_allclose(pts2, pts, atol=1e-5)
        np.testing.assert_allclose(extr2[:, :, 3], extr[:, :, 3], atol=1e-5)
        np.testing.assert_allclose(extr2[:, :3, :3], extr[:, :3, :3], atol=1e-4)
        np.testing.assert_allclose(K2, K, atol=1e-4)


class TestPredictTracks:
    @pytest.mark.slow
    def test_smoke_on_tiny_vggt(self):
        from videogpa_tpu.models.vggt.config import VGGTConfig
        from videogpa_tpu.models.vggt.heads import dpt_head_init
        from videogpa_tpu.models.vggt.model import vggt_init
        from videogpa_tpu.models.vggt.track import tracker_init

        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        # reduced tracker for the tiny config (like test_vggt.py's smoke)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        params["track_head"] = {
            "feature_extractor": dpt_head_init(
                k1, cfg, output_dim=0, features=16, feature_only=True
            ),
            "tracker": tracker_init(k2, latent_dim=16, hidden_size=32,
                                    corr_levels=3, corr_radius=2, depth=2),
        }
        S, H = 3, cfg.img_size
        images = np.random.default_rng(0).uniform(0, 1, (S, 3, H, H)).astype(np.float32)
        out = predict_tracks(
            params, images, cfg, max_query_pts=16, query_frame_num=2,
            track_kwargs={"corr_levels": 3, "corr_radius": 2},
        )
        assert out["tracks"].shape == (2, S, 16, 2)
        assert out["vis"].shape == (2, S, 16)
        assert len(out["query_frames"]) == 2
        assert np.isfinite(out["tracks"]).all()

    def test_rank_query_frames(self):
        f = np.array([[1, 0], [1, 0.1], [0, 1.0]], np.float32)
        order = rank_query_frames(f, 2)
        assert len(order) == 2 and order[0] in (0, 1)


class TestPredictTracksVGGSfM:
    @pytest.mark.slow
    def test_predict_tracks_on_vggsfm_tracker(self):
        """predict_tracks drives the rebuilt VGGSfM tracker when
        tracker_params is given (reference track_predict.py:56,220)."""
        from videogpa_tpu.models.vggt.config import VGGTConfig
        from videogpa_tpu.models.vggt.model import vggt_init
        from videogpa_tpu.models.vggt.vggsfm_tracker import vggsfm_tracker_init

        cfg = VGGTConfig.tiny()
        params = vggt_init(jax.random.PRNGKey(0), cfg)
        tracker = vggsfm_tracker_init(jax.random.PRNGKey(7))
        S, H, N = 2, 256, 6
        images = np.random.default_rng(1).uniform(
            0, 1, (S, 3, H, H)
        ).astype(np.float32)
        conf = np.random.default_rng(2).uniform(0, 2, (S, H, H)).astype(
            np.float32
        )
        out = predict_tracks(
            params, images, cfg, conf=conf, max_query_pts=N,
            query_frame_num=2, tracker_params=tracker,
            track_kwargs={"fine_tracking": False, "coarse_iters": 2},
        )
        assert out["tracks"].shape == (2, S, N, 2)
        assert out["vis"].shape == (2, S, N)
        assert ((out["vis"] >= 0) & (out["vis"] <= 1)).all()
        np.testing.assert_array_equal(out["conf"], out["vis"])
        assert np.isfinite(out["tracks"]).all()
