"""DA3 auxiliary surface: COLMAP IO, bench dataset loaders, reference-view
strategies, feat_vis export, gallery CLI.

Covers the reference components at ``depth_anything_3/utils/
read_write_model.py`` (COLMAP read), ``bench/datasets/{dtu,eth3d,
sevenscenes}.py`` (on-disk formats, exercised via synthetic fixtures),
``model/reference_view_selector.py:29-110`` (all four strategies),
``utils/export`` feat_vis / ``pca_utils.py`` and ``cli.py:471,766``
(colmap + gallery commands).
"""

import json
import os
import struct

import jax
import numpy as np
import pytest

from videogpa_tpu.models.da3 import DA3Config, da3_inference, da3_init


@pytest.fixture(scope="module")
def tiny_model():
    cfg = DA3Config.tiny()
    return da3_init(jax.random.PRNGKey(0), cfg), cfg


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------------------
# COLMAP IO
# ---------------------------------------------------------------------------


class TestColmapIO:
    def test_text_roundtrip_via_exporter(self, tiny_model, tmp_path):
        """export colmap (writer) -> read_model (reader) recovers the poses."""
        from videogpa_tpu.models.da3.colmap_io import read_model
        from videogpa_tpu.models.da3.export import export

        params, cfg = tiny_model
        frames = np.random.default_rng(0).integers(
            0, 255, (3, cfg.img_size, cfg.img_size, 3), dtype=np.uint8
        )
        pred = da3_inference(params, frames, cfg)
        export(pred, "colmap", str(tmp_path))
        cameras, images, _pts = read_model(str(tmp_path / "colmap"))
        assert len(cameras) == 3 and len(images) == 3
        for img in images.values():
            E = img.extrinsic
            i = img.id - 1
            want = pred.extrinsics[i]
            # rotation recovered through the quaternion round-trip
            np.testing.assert_allclose(E[:3, :3], want[:3, :3], atol=1e-4)
            np.testing.assert_allclose(E[:3, 3], want[:3, 3], atol=1e-4)
        K = cameras[1].K
        np.testing.assert_allclose(K[0, 0], pred.intrinsics[0][0, 0], rtol=1e-5)

    def test_binary_reader(self, tmp_path):
        """Hand-written COLMAP .bin files parse to the same model."""
        from videogpa_tpu.models.da3.colmap_io import read_model

        d = tmp_path / "sparse"
        d.mkdir()
        with open(d / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # PINHOLE
            f.write(struct.pack("<4d", 60.0, 61.0, 32.0, 24.0))
        qvec = np.array([0.9689124, 0.0, 0.2474040, 0.0])  # rot_y(~28.6 deg)
        tvec = np.array([0.5, -0.25, 2.0])
        with open(d / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<i", 7))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", 1))
            f.write(b"frame_000.png\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<3d", 1.0, 2.0, -1))
            f.write(struct.pack("<3d", 3.0, 4.0, 11))
        with open(d / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<Q", 11))
            f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<2i", 7, 1))
        cameras, images, pts = read_model(str(d))
        cam = cameras[1]
        assert cam.model == "PINHOLE" and cam.width == 64
        np.testing.assert_allclose(cam.K[0, 0], 60.0)
        img = images[7]
        assert img.name == "frame_000.png" and img.camera_id == 1
        np.testing.assert_allclose(img.tvec, tvec)
        np.testing.assert_allclose(img.xys, [[1.0, 2.0], [3.0, 4.0]])
        assert list(img.point3D_ids) == [-1, 11]
        p = pts[11]
        np.testing.assert_allclose(p.xyz, [0.1, 0.2, 0.3])
        assert list(p.rgb) == [10, 20, 30] and list(p.image_ids) == [7]

    def test_load_colmap_scene(self, tmp_path):
        from videogpa_tpu.models.da3.colmap_io import load_colmap_scene

        (tmp_path / "images").mkdir()
        sparse = tmp_path / "sparse"
        sparse.mkdir()
        rng = np.random.default_rng(1)
        with open(sparse / "cameras.txt", "w") as f:
            f.write("# comment\n1 PINHOLE 28 28 30 30 14 14\n")
        with open(sparse / "images.txt", "w") as f:
            for i in range(3):
                f.write(f"{i + 1} 1 0 0 0 {i * 0.1} 0 1 1 im_{i}.png\n\n")
                _write_png(
                    tmp_path / "images" / f"im_{i}.png",
                    rng.integers(0, 255, (28, 28, 3), dtype=np.uint8),
                )
        files, extr, intr = load_colmap_scene(str(tmp_path))
        assert len(files) == 3 and extr.shape == (3, 4, 4) and intr.shape == (3, 3, 3)
        np.testing.assert_allclose(extr[2, 0, 3], 0.2, atol=1e-6)


# ---------------------------------------------------------------------------
# Bench dataset loaders (synthetic on-disk fixtures in each real format)
# ---------------------------------------------------------------------------


def _make_dtu_fixture(root, n_views=4, hw=(28, 28)):
    rng = np.random.default_rng(0)
    scene = "scan1"
    (root / "Rectified" / scene).mkdir(parents=True)
    (root / "Cameras").mkdir()
    for i in range(n_views):
        _write_png(
            root / "Rectified" / scene / f"rect_{i + 1:03d}_3_r5000.png",
            rng.integers(0, 255, (*hw, 3), dtype=np.uint8),
        )
        E = np.eye(4)
        E[0, 3] = 0.1 * i
        K = np.array([[30.0, 0, 14], [0, 30.0, 14], [0, 0, 1]])
        with open(root / "Cameras" / f"{i:0>8}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in E:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
    return scene


def _make_7scenes_fixture(root, n_views=3, hw=(28, 28)):
    rng = np.random.default_rng(0)
    seq = root / "7Scenes" / "chess" / "seq-01"
    seq.mkdir(parents=True)
    for i in range(n_views):
        _write_png(
            seq / f"frame-{i:06d}.color.png",
            rng.integers(0, 255, (*hw, 3), dtype=np.uint8),
        )
        c2w = np.eye(4)
        c2w[1, 3] = 0.2 * i
        np.savetxt(seq / f"frame-{i:06d}.pose.txt", c2w)


def _make_eth3d_fixture(root, n_views=3, hw=(28, 28)):
    rng = np.random.default_rng(0)
    scene = root / "courtyard"
    (scene / "dslr_calibration_jpg").mkdir(parents=True)
    (scene / "images").mkdir()
    with open(scene / "dslr_calibration_jpg" / "cameras.txt", "w") as f:
        f.write("1 PINHOLE 28 28 30 30 14 14\n")
    with open(scene / "dslr_calibration_jpg" / "images.txt", "w") as f:
        for i in range(n_views):
            f.write(f"{i + 1} 1 0 0 0 0 {0.3 * i} 0 1 v_{i}.png\n\n")
            _write_png(
                scene / "images" / f"v_{i}.png",
                rng.integers(0, 255, (*hw, 3), dtype=np.uint8),
            )


class TestBenchDatasets:
    def test_dtu_loader_and_evaluator(self, tiny_model, tmp_path):
        import videogpa_tpu.models.da3.bench_datasets as bd
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY, Evaluator

        _make_dtu_fixture(tmp_path, hw=(28, 28))
        ds = DATASET_REGISTRY["dtu"]()
        ds.root = str(tmp_path)
        assert ds.scenes() == ["scan1"]
        scene = ds.get_data("scan1")
        assert scene.frames.shape == (4, 28, 28, 3)
        assert scene.gt_extrinsics.shape == (4, 3, 4)
        np.testing.assert_allclose(scene.gt_extrinsics[0, 0, 3], 0.1 * 33 % 1, atol=1)
        params, cfg = tiny_model
        summary = Evaluator(params, cfg, mode="pose").run(ds)
        assert summary["scenes"] == 1
        assert "mean_auc30" in summary

    def test_7scenes_loader(self, tmp_path):
        import videogpa_tpu.models.da3.bench_datasets as bd
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY

        _make_7scenes_fixture(tmp_path)
        ds = DATASET_REGISTRY["7scenes"]()
        ds.root = str(tmp_path)
        assert ds.scenes() == ["chess"]
        scene = ds.get_data("chess")
        assert scene.frames.shape == (3, 28, 28, 3)
        # pose.txt is c2w; loader inverts to w2c
        np.testing.assert_allclose(scene.gt_extrinsics[2, 1, 3], -0.4, atol=1e-6)
        np.testing.assert_allclose(scene.gt_intrinsics[0][0, 0], 585.0)

    def test_eth3d_loader(self, tmp_path):
        import videogpa_tpu.models.da3.bench_datasets as bd
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY

        _make_eth3d_fixture(tmp_path)
        ds = DATASET_REGISTRY["eth3d"]()
        ds.root = str(tmp_path)
        assert ds.scenes() == ["courtyard"]
        scene = ds.get_data("courtyard")
        assert scene.frames.shape == (3, 28, 28, 3)
        np.testing.assert_allclose(scene.gt_extrinsics[1, 1, 3], 0.3, atol=1e-6)

    def test_ply_reader_roundtrip(self, tmp_path):
        from videogpa_tpu.models.da3.bench_datasets import read_ply_xyz
        from videogpa_tpu.reward.pointcloud import save_ply

        pts = np.random.default_rng(0).standard_normal((50, 3)).astype(np.float32)
        colors = np.zeros((50, 3), np.uint8)
        path = str(tmp_path / "cloud.ply")
        save_ply(pts, colors, path)
        got = read_ply_xyz(path)
        np.testing.assert_allclose(got, pts, atol=1e-6)


# ---------------------------------------------------------------------------
# Reference-view strategies
# ---------------------------------------------------------------------------


class TestRefViewStrategies:
    def test_all_strategies(self):
        import jax.numpy as jnp

        from videogpa_tpu.models.da3.vit import select_reference_view

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 16))
        assert list(np.asarray(select_reference_view(x, "first"))) == [0, 0]
        assert list(np.asarray(select_reference_view(x, "middle"))) == [2, 2]
        for strat in ("saddle_balanced", "saddle_sim_range"):
            idx = np.asarray(select_reference_view(x, strat))
            assert idx.shape == (2,)
            assert ((idx >= 0) & (idx < 5)).all()
        with pytest.raises(ValueError):
            select_reference_view(x, "bogus")


# ---------------------------------------------------------------------------
# feat_vis export + gallery
# ---------------------------------------------------------------------------


class TestFeatVisAndGallery:
    def test_feat_vis_export(self, tiny_model, tmp_path):
        from videogpa_tpu.models.da3.export import export

        params, cfg = tiny_model
        frames = np.random.default_rng(0).integers(
            0, 255, (3, cfg.img_size, cfg.img_size, 3), dtype=np.uint8
        )
        pred = da3_inference(params, frames, cfg, return_features=True)
        assert pred.features is not None
        assert pred.features.shape[:3] == (3, cfg.img_size // 14, cfg.img_size // 14)
        out = export(pred, "feat_vis", str(tmp_path))
        pca = np.load(os.path.join(out, "feat_pca.npz"))["pca"]
        assert pca.shape == (3, cfg.img_size // 14, cfg.img_size // 14, 3)
        assert pca.min() >= 0 and pca.max() <= 1
        assert os.path.exists(os.path.join(out, "feat_0000.png"))

    def test_gallery_command(self, tmp_path):
        from videogpa_tpu.models.da3.cli import main

        (tmp_path / "scene_a").mkdir()
        _write_png(
            tmp_path / "scene_a" / "depth.png",
            np.zeros((8, 8, 3), np.uint8),
        )
        main(["gallery", str(tmp_path)])
        page = (tmp_path / "gallery.html").read_text()
        assert "scene_a" in page and "depth.png" in page


def _make_gallery_tree(root):
    """Two-level group/scene export tree like the reference gallery expects
    (reference services/gallery.py:641-701): a scene is complete when it has
    scene.glb + scene.jpg; depth_vis/ images ride along."""
    for group, scenes in (("kitchens", ["s01", "s02"]), ("parks", ["p01"])):
        for s in scenes:
            d = root / group / s
            (d / "depth_vis").mkdir(parents=True)
            (d / "scene.glb").write_bytes(b"glTF-fake")
            _write_png(d / "scene.jpg", np.zeros((6, 12, 3), np.uint8))
            for i in range(5):
                _write_png(
                    d / "depth_vis" / f"d{i:03d}.png",
                    np.zeros((4, 4, 3), np.uint8),
                )
    # incomplete scene (no glb) and a stray file: both must be skipped
    d = root / "kitchens" / "broken"
    d.mkdir()
    _write_png(d / "scene.jpg", np.zeros((6, 12, 3), np.uint8))
    (root / "empty_group").mkdir()
    (root / "notes.txt").write_text("x")


class TestGalleryServer:
    """Interactive gallery server (reference services/gallery.py)."""

    def test_manifests(self, tmp_path):
        from videogpa_tpu.models.da3.gallery import (
            build_group_list,
            build_group_manifest,
        )

        _make_gallery_tree(tmp_path)
        groups = build_group_list(str(tmp_path))["groups"]
        assert [g["id"] for g in groups] == ["kitchens", "parks"]

        man = build_group_manifest(str(tmp_path), "kitchens")
        assert [i["id"] for i in man["items"]] == ["s01", "s02"]
        item = man["items"][0]
        assert item["model"] == "/kitchens/s01/scene.glb"
        assert item["thumbnail"] == "/kitchens/s01/scene.jpg"
        assert len(item["depth_images"]) == 5
        assert item["depth_images"][0] == "/kitchens/s01/depth_vis/d000.png"
        assert build_group_manifest(str(tmp_path), "nope")["items"] == []

    def test_http_endpoints(self, tmp_path):
        import threading
        import urllib.error
        import urllib.request

        from videogpa_tpu.models.da3.gallery import make_server

        _make_gallery_tree(tmp_path)
        server = make_server(str(tmp_path), port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{port}"
        try:
            def get(path):
                return urllib.request.urlopen(base + path, timeout=5)

            page = get("/").read().decode()
            assert "manifest.json" in page
            # built-in glb point-cloud viewer: present, and the page pulls
            # NOTHING from the network (works on air-gapped TPU hosts)
            assert "parseGlbPoints" in page
            assert "https://" not in page and "http://" not in page

            groups = json.loads(get("/manifest.json").read())["groups"]
            assert [g["id"] for g in groups] == ["kitchens", "parks"]

            man = json.loads(get("/manifest/kitchens.json").read())
            assert len(man["items"]) == 2

            r = get("/kitchens/s01/scene.glb")
            assert r.read() == b"glTF-fake"
            assert r.headers["Content-Type"] == "model/gltf-binary"

            with pytest.raises(urllib.error.HTTPError) as e:
                get("/manifest/..%2fkitchens.json")
            assert e.value.code == 400

            with pytest.raises(urllib.error.HTTPError) as e:
                get("/kitchens/")  # directory listing disabled
            assert e.value.code == 404

            assert get("/favicon.ico").status == 204
        finally:
            server.shutdown()
            server.server_close()


def _make_dtu64_fixture(root, n_views=3, hw=(28, 28)):
    rng = np.random.default_rng(0)
    (root / "scan1" / "image").mkdir(parents=True)
    (root / "Cameras").mkdir()
    for i in range(n_views):
        _write_png(
            root / "scan1" / "image" / f"{i:08d}.png",
            rng.integers(0, 255, (*hw, 3), dtype=np.uint8),
        )
        E = np.eye(4); E[0, 3] = 0.05 * i
        K = np.array([[30.0, 0, 14], [0, 30.0, 14], [0, 0, 1]])
        with open(root / "Cameras" / f"{i:0>8}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in E:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")


def _make_hiroom_fixture(root, n_views=3, hw=(28, 28)):
    rng = np.random.default_rng(0)
    s = root / "room_a"
    (s / "image").mkdir(parents=True)
    (s / "pose").mkdir()
    np.save(s / "cam_K.npy", np.diag([30.0, 30.0, 1.0]).astype(np.float32))
    for i in range(n_views):
        _write_png(s / "image" / f"{i:04d}.png",
                   rng.integers(0, 255, (*hw, 3), dtype=np.uint8))
        E = np.eye(4); E[1, 3] = 0.1 * i
        np.save(s / "pose" / f"{i:04d}.npy", E.astype(np.float32))


def _make_scannetpp_fixture(root, n_views=3, hw=(28, 28)):
    rng = np.random.default_rng(0)
    base = root / "09c1414f1b" / "merge_dslr_iphone"
    (base / "colmap" / "sparse_render_rgb").mkdir(parents=True)
    (base / "images").mkdir()
    sp = base / "colmap" / "sparse_render_rgb"
    with open(sp / "cameras.txt", "w") as f:
        f.write("1 PINHOLE 28 28 30 30 14 14\n")
    with open(sp / "images.txt", "w") as f:
        for i in range(n_views):
            f.write(f"{i + 1} 1 0 0 0 0 0 {0.2 * i} 1 iphone_{i}.jpg\n\n")
            _write_png(base / "images" / f"iphone_{i}.jpg",
                       rng.integers(0, 255, (*hw, 3), dtype=np.uint8))
        # a DSLR frame that must be filtered out
        f.write(f"{n_views + 1} 1 0 0 0 0 0 9 1 dslr_0.jpg\n\n")
        _write_png(base / "images" / "dslr_0.jpg",
                   rng.integers(0, 255, (*hw, 3), dtype=np.uint8))


class TestMoreBenchDatasets:
    def test_dtu64_loader(self, tmp_path):
        import videogpa_tpu.models.da3.bench_datasets as bd
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY

        _make_dtu64_fixture(tmp_path)
        ds = DATASET_REGISTRY["dtu64"]()
        ds.root = str(tmp_path)
        ds.camera_root = str(tmp_path / "Cameras")
        assert ds.scenes() == ["scan1"]
        scene = ds.get_data("scan1")
        assert scene.frames.shape == (3, 28, 28, 3)
        np.testing.assert_allclose(scene.gt_extrinsics[2, 0, 3], 0.1, atol=1e-6)

    def test_hiroom_loader(self, tmp_path):
        import videogpa_tpu.models.da3.bench_datasets as bd
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY

        _make_hiroom_fixture(tmp_path)
        ds = DATASET_REGISTRY["hiroom"]()
        ds.root = str(tmp_path)
        assert ds.scenes() == ["room_a"]
        scene = ds.get_data("room_a")
        assert scene.frames.shape == (3, 28, 28, 3)
        np.testing.assert_allclose(scene.gt_extrinsics[2, 1, 3], 0.2, atol=1e-6)
        np.testing.assert_allclose(scene.gt_intrinsics[0][0, 0], 30.0)

    def test_scannetpp_loader(self, tmp_path):
        import videogpa_tpu.models.da3.bench_datasets as bd
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY

        _make_scannetpp_fixture(tmp_path)
        ds = DATASET_REGISTRY["scannetpp"]()
        ds.root = str(tmp_path)
        assert ds.scenes() == ["09c1414f1b"]
        scene = ds.get_data("09c1414f1b")
        assert scene.frames.shape == (3, 28, 28, 3)  # DSLR frame filtered
        np.testing.assert_allclose(scene.gt_extrinsics[1, 2, 3], 0.2, atol=1e-6)
