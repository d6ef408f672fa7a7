"""Unit tests for the pure-JAX geometry library.

Oracles: numpy closed forms and torch (CPU) where the reference semantics are
defined by torch ops (resize pixel models, grid_sample).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.geometry import (
    affine_inverse,
    batch_reproject,
    closed_form_inverse_se3,
    depth_to_world_points,
    extri_intri_to_pose_encoding,
    mat_to_quat,
    pose_encoding_to_extri_intri,
    project_points_zbuffer,
    quat_to_mat,
    unproject_depth,
)


def random_rotations(rng, shape):
    """Uniform-ish random rotation matrices via QR."""
    a = rng.standard_normal(shape + (3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q


class TestRotation:
    def test_quat_mat_roundtrip(self):
        rng = np.random.default_rng(0)
        R = random_rotations(rng, (4, 5))
        q = mat_to_quat(jnp.asarray(R, jnp.float32))
        R2 = quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_mat_quat_mat_identity(self):
        R = jnp.eye(3)[None]
        q = mat_to_quat(R)
        np.testing.assert_allclose(np.asarray(q), [[0, 0, 0, 1]], atol=1e-6)

    def test_quat_normalized_and_scalar_last_positive(self):
        rng = np.random.default_rng(1)
        R = random_rotations(rng, (64,))
        q = np.asarray(mat_to_quat(jnp.asarray(R, jnp.float32)))
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        assert (q[:, 3] >= 0).all()

    def test_near_180_degree_rotation(self):
        # The naive trace formula fails here; the 4-candidate one must not.
        R = np.diag([1.0, -1.0, -1.0])  # 180 deg about x
        q = mat_to_quat(jnp.asarray(R, jnp.float32)[None])
        R2 = np.asarray(quat_to_mat(q))[0]
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestPoseEnc:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        B, S = 2, 4
        R = random_rotations(rng, (B, S))
        t = rng.standard_normal((B, S, 3))
        extr = np.concatenate([R, t[..., None]], axis=-1).astype(np.float32)
        H, W = 518, 518
        f = rng.uniform(300, 900, (B, S, 2))
        intr = np.zeros((B, S, 3, 3), np.float32)
        intr[..., 0, 0] = f[..., 0]
        intr[..., 1, 1] = f[..., 1]
        intr[..., 0, 2] = W / 2
        intr[..., 1, 2] = H / 2
        intr[..., 2, 2] = 1

        enc = extri_intri_to_pose_encoding(jnp.asarray(extr), jnp.asarray(intr), (H, W))
        assert enc.shape == (B, S, 9)
        extr2, intr2 = pose_encoding_to_extri_intri(enc, (H, W))
        np.testing.assert_allclose(np.asarray(extr2), extr, atol=1e-4)
        np.testing.assert_allclose(np.asarray(intr2), intr, rtol=1e-4, atol=1e-2)


class TestTransforms:
    def test_se3_inverse(self):
        rng = np.random.default_rng(3)
        R = random_rotations(rng, (5,))
        t = rng.standard_normal((5, 3))
        E = np.concatenate([R, t[..., None]], axis=-1).astype(np.float32)
        inv = np.asarray(closed_form_inverse_se3(jnp.asarray(E)))
        E44 = np.concatenate(
            [E, np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32), (5, 1, 1))], axis=1
        )
        np.testing.assert_allclose(inv @ E44, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)

    def test_affine_inverse_matches_linalg(self):
        rng = np.random.default_rng(4)
        R = random_rotations(rng, (3,))
        t = rng.standard_normal((3, 3))
        A = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        A[:, :3, :3] = R
        A[:, :3, 3] = t
        inv = np.asarray(affine_inverse(jnp.asarray(A)))
        np.testing.assert_allclose(inv, np.linalg.inv(A), atol=1e-5)

    def test_unproject_roundtrip(self):
        """depth -> world points -> reproject recovers the same pixels."""
        rng = np.random.default_rng(5)
        H = W = 16
        depth = rng.uniform(1.0, 5.0, (1, 2, H, W, 1)).astype(np.float32)
        K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
        K = np.tile(K, (1, 2, 1, 1)).reshape(1, 2, 3, 3)
        R = random_rotations(rng, (1, 2)).astype(np.float32)
        t = rng.standard_normal((1, 2, 3)).astype(np.float32)
        w2c = np.concatenate([R, t[..., None]], axis=-1)
        c2w = np.asarray(closed_form_inverse_se3(jnp.asarray(w2c)))

        world = unproject_depth(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(c2w))
        # Reproject: K @ (R p + t) should land on the pixel grid with z = depth
        cam = np.einsum("bvij,bvhwj->bvhwi", R, np.asarray(world)) + t[:, :, None, None]
        proj = np.einsum("bvij,bvhwj->bvhwi", np.asarray(K), cam)
        uv = proj[..., :2] / proj[..., 2:3]
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        target = uv[..., 0].shape
        np.testing.assert_allclose(uv[..., 0], np.broadcast_to(uu, target), atol=5e-3)
        np.testing.assert_allclose(uv[..., 1], np.broadcast_to(vv, target), atol=5e-3)
        np.testing.assert_allclose(proj[..., 2], depth[..., 0], atol=5e-3)

    def test_depth_to_world_matches_unproject(self):
        rng = np.random.default_rng(6)
        H = W = 8
        depth = rng.uniform(1.0, 5.0, (2, H, W)).astype(np.float32)
        K = np.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)
        Ks = np.tile(K, (2, 1, 1))
        R = random_rotations(rng, (2,)).astype(np.float32)
        t = rng.standard_normal((2, 3)).astype(np.float32)
        E = np.concatenate([R, t[..., None]], axis=-1)

        w1 = depth_to_world_points(jnp.asarray(depth), jnp.asarray(E), jnp.asarray(Ks))
        c2w = closed_form_inverse_se3(jnp.asarray(E))
        w2 = unproject_depth(
            jnp.asarray(depth[None, ..., None]), jnp.asarray(Ks[None]), c2w[None]
        )[0]
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-4)


def _painter_render(points, colors, K, E, H, W):
    """Reference painter's algorithm (z-sorted overwrite), numpy oracle."""
    R, t = E[:3, :3], E[:3, 3]
    cam = points @ R.T + t
    proj = cam @ K.T
    z = proj[:, 2]
    u = np.round(proj[:, 0] / (z + 1e-8)).astype(int)
    v = np.round(proj[:, 1] / (z + 1e-8)).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    canvas = np.zeros((H, W, 3), np.float64)
    order = np.argsort(-z[ok], kind="stable")
    uu, vv = u[ok][order], v[ok][order]
    cc = np.floor(np.clip(colors[ok][order], 0, 255))
    for x, y, c in zip(uu, vv, cc):
        canvas[y, x] = c
    return canvas


class TestSplatting:
    def test_matches_painter_oracle(self):
        rng = np.random.default_rng(7)
        N, H, W = 500, 24, 32
        points = rng.standard_normal((N, 3)).astype(np.float32)
        points[:, 2] += 4.0
        colors = rng.uniform(0, 255, (N, 3)).astype(np.float32)
        K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
        E = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)

        got = np.asarray(
            project_points_zbuffer(
                jnp.asarray(points), jnp.asarray(colors), jnp.asarray(K), jnp.asarray(E), H, W
            )
        )
        want = _painter_render(points, colors, K, E, H, W)
        # Ties in z are broken differently (lowest-index vs sort order) but
        # distinct random z values make the winner unique.
        np.testing.assert_allclose(got, want, atol=0)

    def test_padding_mask(self):
        points = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]])
        colors = jnp.array([[100.0, 0, 0], [0, 200.0, 0]])
        K = jnp.array([[1.0, 0, 2], [0, 1.0, 2], [0, 0, 1]])
        E = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        valid = jnp.array([True, False])
        canvas = project_points_zbuffer(points, colors, K, E, 4, 4, valid=valid)
        # nearer point masked out -> the farther (red) one wins
        np.testing.assert_allclose(np.asarray(canvas[2, 2]), [100, 0, 0])

    def test_sorted_zbuffer_matches_scatter(self):
        """The sort+searchsorted lowering is output-identical to the
        scatter-min lowering — same nearest-z winner, same lowest-id
        tie-break, same padding handling."""
        from videogpa_tpu.geometry.projection import project_points_zbuffer_sorted

        rng = np.random.default_rng(11)
        N, H, W = 2000, 24, 32
        points = rng.standard_normal((N, 3)).astype(np.float32)
        points[:, 2] += 4.0
        # force z ties on purpose: quantize depths coarsely
        points[:, 2] = np.round(points[:, 2] * 4) / 4
        colors = rng.uniform(0, 255, (N, 3)).astype(np.float32)
        K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
        E = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)
        valid = rng.uniform(size=N) > 0.1

        a = project_points_zbuffer(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(K),
            jnp.asarray(E), H, W, valid=jnp.asarray(valid))
        b = project_points_zbuffer_sorted(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(K),
            jnp.asarray(E), H, W, valid=jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_packed_zbuffer_matches_scatter_on_separated_depths(self):
        """The fused all-views packed-key z-buffer (production scorer fast
        path) is bit-identical to the exact scatter whenever per-pixel depth
        gaps exceed the 10-bit quantum — construct depths on a coarse grid
        (gap 0.25 over range ~8 >> 8/1022) so winners must agree, including
        tie-breaks (equal z -> equal bucket -> lowest point id, both
        impls)."""
        rng = np.random.default_rng(11)
        N, H, W, T = 2000, 24, 32, 3
        points = rng.standard_normal((N, 3)).astype(np.float32)
        points[:, 2] += 4.0
        points[:, 2] = np.round(points[:, 2] * 4) / 4  # coarse z + real ties
        colors = rng.uniform(0, 255, (N, 3)).astype(np.float32)
        Ks = np.tile(
            np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
            (T, 1, 1),
        )
        Es = np.stack([
            np.concatenate(
                [np.eye(3), np.array([[0.1 * t], [0.0], [0.2 * t]])], axis=1
            ).astype(np.float32)
            for t in range(T)
        ])
        valid = rng.uniform(size=N) > 0.1

        exact = batch_reproject(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), H, W, valid=jnp.asarray(valid))
        packed = batch_reproject(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), H, W, valid=jnp.asarray(valid),
            zbuffer_impl="packed")
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(packed))

    def test_packed_zbuffer_close_on_random_depths(self):
        """On arbitrary continuous depths the packed impl may flip winners
        within a depth quantum; the rendered frames must still agree on the
        overwhelming majority of pixels."""
        rng = np.random.default_rng(12)
        N, H, W, T = 5000, 24, 32, 3
        points = rng.standard_normal((N, 3)).astype(np.float32)
        points[:, 2] += 4.0
        colors = rng.uniform(0, 255, (N, 3)).astype(np.float32)
        Ks = np.tile(
            np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
            (T, 1, 1),
        )
        Es = np.stack([
            np.concatenate(
                [np.eye(3), np.array([[0.1 * t], [0.0], [0.2 * t]])], axis=1
            ).astype(np.float32)
            for t in range(T)
        ])
        exact = np.asarray(batch_reproject(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), H, W))
        packed = np.asarray(batch_reproject(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), H, W, zbuffer_impl="packed"))
        same = np.all(exact == packed, axis=1)  # (T, H, W) per-pixel
        assert same.mean() > 0.99, same.mean()

    def test_packed_zbuffer_wide_id_field(self):
        """Clouds beyond 2^22 points widen the packed key's id field (23
        bits here) instead of overflowing ids into the depth bits — winners
        with ids above the old 22-bit cap must still decode correctly and
        match the exact scatter on coarse (super-quantum) depths."""
        rng = np.random.default_rng(13)
        n = (1 << 22) + 64
        H, W, T = 8, 8, 1
        # few real points, placed at the TOP of the id range; the rest
        # padded invalid so the exact scatter stays cheap
        points = np.zeros((n, 3), np.float32)
        valid = np.zeros((n,), bool)
        real = np.arange(n - 200, n)
        points[real] = rng.standard_normal((200, 3)).astype(np.float32)
        points[real, 2] = 4.0 + np.round(rng.uniform(0, 4, 200) * 4) / 4
        valid[real] = True
        colors = rng.uniform(0, 255, (n, 3)).astype(np.float32)
        Ks = np.array(
            [[[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]]], np.float32
        )
        Es = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)[None].astype(
            np.float32
        )
        exact = batch_reproject(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), H, W, valid=jnp.asarray(valid))
        packed = batch_reproject(
            jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
            jnp.asarray(Es), H, W, valid=jnp.asarray(valid),
            zbuffer_impl="packed")
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(packed))

    def test_packed_zbuffer_rejects_oversized_cloud(self):
        """Past 2^24 points fewer than 8 depth bits would remain: the packed
        impl refuses (ValueError, not a strippable assert)."""
        import pytest

        from videogpa_tpu.geometry.projection import reproject_views_packed

        n = 1 << 24
        points = jnp.zeros((n, 3), jnp.float32)
        colors = jnp.zeros((n, 3), jnp.float32)
        Ks = jnp.eye(3)[None]
        Es = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)[None]
        with pytest.raises(ValueError, match="depth bits"):
            reproject_views_packed(points, colors, Ks, Es, 4, 4)

    def test_batch_reproject_range_and_shape(self):
        rng = np.random.default_rng(8)
        points = jnp.asarray(rng.standard_normal((100, 3)), jnp.float32)
        colors = jnp.asarray(rng.uniform(0, 1, (100, 3)), jnp.float32)  # [0,1] scale
        K = jnp.tile(jnp.array([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]]), (3, 1, 1))
        E = jnp.tile(
            jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0], [4]])], axis=1),
            (3, 1, 1),
        )
        frames = batch_reproject(points, colors, K, E, 16, 16)
        assert frames.shape == (3, 3, 16, 16)
        assert float(frames.min()) >= -1.0 and float(frames.max()) <= 1.0


class TestResize:
    @pytest.mark.parametrize("align_corners", [False, True])
    @pytest.mark.parametrize("out_hw", [(7, 9), (32, 48), (10, 10)])
    def test_bilinear_vs_torch(self, align_corners, out_hw):
        import torch
        import torch.nn.functional as F

        from videogpa_tpu.ops.resize import resize_bilinear

        rng = np.random.default_rng(9)
        x = rng.standard_normal((2, 3, 17, 23)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
        ).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_grid_sample_vs_torch(self):
        import torch
        import torch.nn.functional as F

        from videogpa_tpu.ops.resize import grid_sample_bilinear

        rng = np.random.default_rng(10)
        H = W = 12
        img = rng.standard_normal((H, W)).astype(np.float32)
        # Sample coords partially out of bounds
        u = rng.uniform(-3, W + 2, (H, W)).astype(np.float32)
        v = rng.uniform(-3, H + 2, (H, W)).astype(np.float32)

        gu = 2 * u / (W - 1) - 1
        gv = 2 * v / (H - 1) - 1
        grid = torch.from_numpy(np.stack([gu, gv], axis=-1))[None]
        want = F.grid_sample(
            torch.from_numpy(img)[None, None],
            grid,
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )[0, 0].numpy()
        got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestZbufferKernel:
    """The tiered windowed Pallas scatter-min (geometry/zbuffer_kernel.py)
    must be bit-identical to the XLA scatter lowering in every tier."""

    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        from videogpa_tpu.geometry import zbuffer_kernel

        monkeypatch.setattr(zbuffer_kernel, "INTERPRET", True)
        monkeypatch.setenv("VIDEOGPA_ZBUFFER_KERNEL", "1")
        yield

    @staticmethod
    def _oracle(lin, key, n_slots):
        buf = np.full((n_slots,), 0xFFFFFFFF, np.uint32)
        np.minimum.at(buf, lin, key)
        return buf

    def test_tier_mix_matches_scatter(self):
        """Chunks engineered to hit every tier: coherent (w1024), medium
        (w4096), scattered (serial), all-invalid, plus a ragged tail."""
        from videogpa_tpu.geometry.zbuffer_kernel import scatter_min_u32

        rng = np.random.default_rng(3)
        n_slots = 9000
        pieces = []
        # tier 0: tight window
        base = 1200
        pieces.append(base + rng.integers(0, 900, 1024))
        # tier 1: medium window
        pieces.append(2000 + rng.integers(0, 3900, 1024))
        # tier 2: full-range scatter
        pieces.append(rng.integers(0, n_slots, 1024))
        # all-invalid chunk (keys forced to sentinel below)
        pieces.append(rng.integers(0, n_slots, 1024))
        # ragged tail (forces padding)
        pieces.append(rng.integers(0, n_slots, 500))
        lin = np.concatenate(pieces).astype(np.int32)
        key = rng.integers(0, 1 << 32, lin.shape[0], dtype=np.uint64).astype(
            np.uint32
        )
        key[3 * 1024 : 4 * 1024] = 0xFFFFFFFF  # the all-invalid chunk
        # sprinkle invalid points into valid chunks too
        key[rng.integers(0, lin.shape[0], 200)] = 0xFFFFFFFF

        got = np.asarray(
            scatter_min_u32(jnp.asarray(lin), jnp.asarray(key), n_slots)
        )
        np.testing.assert_array_equal(got, self._oracle(lin, key, n_slots))

    def test_duplicate_addresses_and_ties(self):
        """Heavy duplicate addresses (the dump-slot / coherent-run case)."""
        from videogpa_tpu.geometry.zbuffer_kernel import scatter_min_u32

        rng = np.random.default_rng(4)
        n_slots = 4096
        lin = rng.integers(0, 32, 2048).astype(np.int32)  # 64x duplication
        key = rng.integers(0, 1 << 32, 2048, dtype=np.uint64).astype(np.uint32)
        got = np.asarray(
            scatter_min_u32(jnp.asarray(lin), jnp.asarray(key), n_slots)
        )
        np.testing.assert_array_equal(got, self._oracle(lin, key, n_slots))

    def test_packed_reproject_kernel_lowering_identical(self):
        """End-to-end: reproject_views_packed with the kernel lowering is
        bit-identical to the XLA scatter lowering on a real projection."""
        from videogpa_tpu.geometry import zbuffer_kernel
        from videogpa_tpu.geometry.projection import reproject_views_packed

        rng = np.random.default_rng(5)
        n, H, W = 3000, 20, 24
        points = rng.standard_normal((n, 3)).astype(np.float32)
        points[:, 2] += 5.0
        colors = rng.uniform(0, 255, (n, 3)).astype(np.float32)
        Ks = np.tile(
            np.array([[16.0, 0, W / 2], [0, 16.0, H / 2], [0, 0, 1]],
                     np.float32),
            (2, 1, 1),
        )
        Es = np.stack([
            np.concatenate([np.eye(3), np.zeros((3, 1))], 1),
            np.concatenate([np.eye(3), np.array([[0.2], [0], [0.5]])], 1),
        ]).astype(np.float32)
        valid = rng.uniform(size=n) > 0.1

        args = (jnp.asarray(points), jnp.asarray(colors), jnp.asarray(Ks),
                jnp.asarray(Es), H, W, jnp.asarray(valid))
        with_kernel = np.asarray(reproject_views_packed(*args))
        os.environ["VIDEOGPA_ZBUFFER_KERNEL"] = "0"
        without = np.asarray(reproject_views_packed(*args))
        np.testing.assert_array_equal(with_kernel, without)
