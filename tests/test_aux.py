"""Tests for auxiliary subsystems: export pack, serving backend, bench, prefetch."""

import json
import os
import struct
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videogpa_tpu.models.da3.model import DA3Prediction


@pytest.fixture
def prediction():
    rng = np.random.default_rng(0)
    S, H, W = 2, 28, 28
    E = np.tile(np.eye(4)[:3].astype(np.float32), (S, 1, 1))
    E[1, 0, 3] = 0.5
    K = np.tile(
        np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32),
        (S, 1, 1),
    )
    return DA3Prediction(
        depth=rng.uniform(1, 5, (S, H, W)).astype(np.float32),
        conf=rng.uniform(1, 2, (S, H, W)).astype(np.float32),
        extrinsics=E,
        intrinsics=K,
        processed_images=rng.uniform(0, 255, (S, H, W, 3)).astype(np.float32),
    )


class TestExport:
    def test_npz_roundtrip(self, prediction, tmp_path):
        from videogpa_tpu.models.da3.export import export

        path = export(prediction, "npz", str(tmp_path))
        d = np.load(path)
        np.testing.assert_allclose(d["depth"], prediction.depth)
        assert d["extrinsics"].shape == (2, 3, 4)

    def test_ply(self, prediction, tmp_path):
        from videogpa_tpu.models.da3.export import export

        path = export(prediction, "ply", str(tmp_path))
        with open(path, "rb") as f:
            header = f.read(200)
        assert header.startswith(b"ply")
        assert b"element vertex 1568" in header  # 2*28*28

    def test_glb_structure(self, prediction, tmp_path):
        from videogpa_tpu.models.da3.export import export

        path = export(prediction, "glb", str(tmp_path))
        with open(path, "rb") as f:
            magic, version, total = struct.unpack("<III", f.read(12))
            assert magic == 0x46546C67 and version == 2
            json_len, json_type = struct.unpack("<II", f.read(8))
            gltf = json.loads(f.read(json_len))
        assert gltf["meshes"][0]["primitives"][0]["mode"] == 0  # POINTS
        assert os.path.getsize(path) == total

    def test_glb_viewer_contract(self, prediction, tmp_path):
        """Decode the glb exactly the way the gallery page's built-in
        viewer does (gallery.py GALLERY_PAGE ``parseGlbPoints``: header,
        JSON/BIN chunks, accessors via bufferView byteOffsets, float32
        VEC3 POSITION + COLOR_0) and check the recovered cloud matches the
        prediction — guards the export_glb <-> in-page viewer layout
        contract, which no JS engine exists here to exercise directly."""
        from videogpa_tpu.models.da3.export import _colors, _world_points, export

        path = export(prediction, "glb", str(tmp_path))
        raw = open(path, "rb").read()
        assert struct.unpack_from("<I", raw, 0)[0] == 0x46546C67
        off, gltf, bin_chunk = 12, None, None
        while off + 8 <= len(raw):
            clen, ctype = struct.unpack_from("<II", raw, off)
            chunk = raw[off + 8 : off + 8 + clen]
            if ctype == 0x4E4F534A:
                gltf = json.loads(chunk)
            elif ctype == 0x004E4942:
                bin_chunk = chunk
            off += 8 + clen

        def acc(i):
            a = gltf["accessors"][i]
            v = gltf["bufferViews"][a["bufferView"]]
            start = v.get("byteOffset", 0) + a.get("byteOffset", 0)
            return np.frombuffer(
                bin_chunk, np.float32, count=a["count"] * 3, offset=start
            ).reshape(-1, 3)

        attrs = gltf["meshes"][0]["primitives"][0]["attributes"]
        pts = acc(attrs["POSITION"])
        cols = acc(attrs["COLOR_0"])
        want = _world_points(prediction).reshape(-1, 3) * np.array(
            [1, -1, -1], np.float32
        )
        np.testing.assert_allclose(pts, want, atol=1e-5)
        np.testing.assert_allclose(
            cols, _colors(prediction).reshape(-1, 3) / 255.0, atol=1e-6
        )

    def test_colmap(self, prediction, tmp_path):
        from videogpa_tpu.models.da3.export import export

        d = export(prediction, "colmap", str(tmp_path))
        for f in ("cameras.txt", "images.txt", "points3D.txt"):
            assert os.path.exists(os.path.join(d, f))
        lines = [l for l in open(os.path.join(d, "images.txt")) if l.strip() and not l.startswith("#")]
        assert len(lines) == 2

    def test_unknown_format_raises(self, prediction, tmp_path):
        from videogpa_tpu.models.da3.export import export

        with pytest.raises(ValueError):
            export(prediction, "obj", str(tmp_path))


class TestBench:
    def test_pose_metrics_perfect(self):
        from videogpa_tpu.models.da3.bench import auc_at, relative_pose_errors

        rng = np.random.default_rng(0)
        E = np.tile(np.eye(4)[:3], (4, 1, 1))
        E[:, :3, 3] = rng.standard_normal((4, 3))
        rot, trans = relative_pose_errors(E, E)
        assert rot.max() < 1e-3 and trans.max() < 1e-3
        assert auc_at(rot) > 0.99

    @pytest.mark.slow
    def test_evaluator_with_fixture_scene(self, tmp_path):
        from videogpa_tpu.models.da3 import DA3Config, da3_init
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY, Evaluator

        cfg = DA3Config.tiny()
        params = da3_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        os.environ["DA3_BENCH_DIR"] = str(tmp_path)
        E = np.tile(np.eye(4)[:3].astype(np.float32), (3, 1, 1))
        E[:, 0, 3] = [0, 0.2, 0.4]
        np.savez(
            tmp_path / "scene0.npz",
            frames=rng.integers(0, 255, (3, cfg.img_size, cfg.img_size, 3), dtype=np.uint8),
            extrinsics=E,
        )
        ds = DATASET_REGISTRY["npz_dir"]()
        ev = Evaluator(params, cfg, mode="pose")
        summary = ev.run(ds, out_json=str(tmp_path / "report.json"))
        assert summary["scenes"] == 1
        assert "mean_auc30" in summary
        assert os.path.exists(tmp_path / "report.json")

    def test_sharding(self, tmp_path):
        from videogpa_tpu.models.da3.bench import DATASET_REGISTRY

        os.environ["DA3_BENCH_DIR"] = str(tmp_path)
        for i in range(5):
            np.savez(tmp_path / f"s{i}.npz", frames=np.zeros((1, 28, 28, 3), np.uint8))
        ds = DATASET_REGISTRY["npz_dir"]()
        all_scenes = ds.scenes()
        shard0 = all_scenes[0::2]
        shard1 = all_scenes[1::2]
        assert sorted(shard0 + shard1) == all_scenes


class TestServiceBackend:
    @pytest.mark.slow
    def test_endpoints(self, tmp_path):
        import cv2

        from videogpa_tpu.models.da3.service import ModelBackend, make_handler
        from http.server import ThreadingHTTPServer

        backend = ModelBackend(out_root=str(tmp_path))
        # monkeypatch in a tiny model instead of loading DA3-Large
        from videogpa_tpu.models.da3 import DA3Config, da3_init

        backend._cfg = DA3Config.tiny()
        backend._params = da3_init(jax.random.PRNGKey(0), backend._cfg)
        backend._ensure_model = lambda: None
        # warm the jit cache so the worker thread isn't stuck compiling
        from videogpa_tpu.models.da3.model import da3_inference

        da3_inference(
            backend._params,
            np.zeros((1, backend._cfg.img_size, backend._cfg.img_size, 3), np.uint8),
            backend._cfg,
        )

        server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(backend))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            status = json.loads(urllib.request.urlopen(f"{base}/status").read())
            assert status["status"] == "ok"

            index = urllib.request.urlopen(f"{base}/").read().decode()
            assert "Depth Anything 3" in index and "/infer" in index

            img_path = str(tmp_path / "img.png")
            cv2.imwrite(img_path, np.zeros((56, 56, 3), np.uint8))
            req = urllib.request.Request(
                f"{base}/infer",
                data=json.dumps({"images": [img_path], "export": "npz"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            task_id = json.loads(urllib.request.urlopen(req).read())["task_id"]
            for _ in range(240):
                task = json.loads(
                    urllib.request.urlopen(f"{base}/tasks/{task_id}").read()
                )
                if task["status"] in ("done", "error"):
                    break
                time.sleep(0.5)
            assert task["status"] == "done", task
            assert os.path.exists(task["result"])

            tasks = json.loads(urllib.request.urlopen(f"{base}/tasks").read())
            assert len(tasks["tasks"]) == 1
            bad = urllib.request.Request(f"{base}/infer", data=b"{}",
                                         headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(bad)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400

            def run_task(payload):
                req = urllib.request.Request(
                    f"{base}/infer", data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                )
                tid = json.loads(urllib.request.urlopen(req).read())["task_id"]
                for _ in range(240):
                    task = json.loads(
                        urllib.request.urlopen(f"{base}/tasks/{tid}").read()
                    )
                    if task["status"] in ("done", "error"):
                        return task
                    time.sleep(0.5)
                return task

            # video input: fps sampling (reference VideoHandler,
            # services/input_handlers.py:221-286)
            from videogpa_tpu.data.video_io import write_video

            vid_path = str(tmp_path / "clip.mp4")
            write_video(
                vid_path,
                np.zeros((16, 56, 56, 3), np.uint8),
                fps=8,
            )
            task = run_task({"video": vid_path, "fps": 4, "export": "npz"})
            assert task["status"] == "done", task
            assert task["n_frames"] == 8, task  # 16 frames @ 8fps -> 4fps

            # non-positive fps is rejected with a clean 400 at submit time
            for bad_fps in (0, -1, "nan"):
                req = urllib.request.Request(
                    f"{base}/infer",
                    data=json.dumps(
                        {"video": vid_path, "fps": bad_fps}
                    ).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    urllib.request.urlopen(req)
                    assert False, f"expected 400 for fps={bad_fps}"
                except urllib.error.HTTPError as e:
                    assert e.code == 400

            # colmap input: images + sparse model -> pose-conditioned infer
            # (reference ColmapHandler, services/input_handlers.py:108-160)
            scene = tmp_path / "scene"
            (scene / "images").mkdir(parents=True)
            (scene / "sparse").mkdir()
            with open(scene / "sparse" / "cameras.txt", "w") as f:
                f.write("1 PINHOLE 56 56 60 60 28 28\n")
            with open(scene / "sparse" / "images.txt", "w") as f:
                for i in range(2):
                    f.write(f"{i + 1} 1 0 0 0 {i * 0.1} 0 1 1 im_{i}.png\n\n")
                    cv2.imwrite(
                        str(scene / "images" / f"im_{i}.png"),
                        np.zeros((56, 56, 3), np.uint8),
                    )
            task = run_task({"colmap": str(scene), "export": "npz"})
            assert task["status"] == "done", task
            assert task["n_frames"] == 2, task
        finally:
            server.shutdown()


class TestPrefetch:
    def test_prefetch_order_and_content(self):
        from videogpa_tpu.data.prefetch import prefetch_to_device

        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), buffer_size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            np.testing.assert_allclose(np.asarray(b["x"]), i)

    def test_prefetch_propagates_errors(self):
        from videogpa_tpu.data.prefetch import prefetch_to_device

        def gen():
            yield {"x": np.zeros(2)}
            raise RuntimeError("boom")

        it = prefetch_to_device(gen())
        next(it)
        with pytest.raises(RuntimeError):
            list(it)

    def test_batch_loader(self):
        from videogpa_tpu.data.prefetch import BatchLoader

        data = list(range(10))
        loader = BatchLoader(
            data, range(10), batch_size=3,
            collate=lambda items: np.asarray(items), num_workers=2,
            shuffle_seed=0,
        )
        batches = list(loader)
        assert len(batches) == 3
        seen = np.concatenate(batches)
        assert len(np.unique(seen)) == 9


class TestInputProcessor:
    def test_all_methods_divisible_by_14(self):
        """Mirror of the reference inline self-test assertions
        (input_processor.py:391-460)."""
        from videogpa_tpu.data.input_processor import METHODS, process_one

        rng = np.random.default_rng(0)
        for (h, w) in [(480, 720), (377, 504), (700, 500)]:
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for method in METHODS:
                out, _ = process_one(img, 518, method)
                assert out.shape[1] % 14 == 0 and out.shape[2] % 14 == 0, (method, out.shape)
                if method.startswith("upper"):
                    assert max(out.shape[1:]) <= 518 + 7
                else:
                    assert min(out.shape[1:]) >= 518 - 7

    def test_intrinsics_tracking(self):
        from videogpa_tpu.data.input_processor import process_one

        rng = np.random.default_rng(1)
        h, w = 480, 720
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        K = np.array([[1200.0, 0, w / 2], [0, 1100.0, h / 2], [0, 0, 1]])
        out, K2 = process_one(img, 518, "upper_bound_resize", K)
        Ho, Wo = out.shape[1:]
        # focal scales with the resize ratio
        np.testing.assert_allclose(K2[0, 0] / K[0, 0], Wo / w, rtol=0.05)
        np.testing.assert_allclose(K2[1, 1] / K[1, 1], Ho / h, rtol=0.05)
        # principal point stays centered
        np.testing.assert_allclose(K2[0, 2], Wo / 2, rtol=0.05)

    def test_batch_processor(self):
        from videogpa_tpu.data.input_processor import InputProcessor

        rng = np.random.default_rng(2)
        imgs = [rng.integers(0, 255, (480, 720, 3), dtype=np.uint8) for _ in range(3)]
        batch, Ks = InputProcessor()(imgs)
        assert batch.shape[0] == 3 and batch.shape[1] == 3
        assert batch.shape[2] % 14 == 0 and batch.shape[3] % 14 == 0
        assert Ks == [None, None, None]


class TestGSVideoExport:
    def test_gs_video_fallback(self, tmp_path):
        import numpy as np

        from videogpa_tpu.models.da3.export import export
        from videogpa_tpu.models.da3.model import DA3Prediction

        S, H, W = 2, 32, 32
        rng = np.random.default_rng(0)
        extr = np.tile(np.eye(4, dtype=np.float32)[:3], (S, 1, 1))
        extr[1, 0, 3] = 0.05
        pred = DA3Prediction(
            depth=np.full((S, H, W), 2.0, np.float32),
            conf=np.ones((S, H, W), np.float32),
            extrinsics=extr,
            intrinsics=np.tile(np.array(
                [[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32),
                (S, 1, 1)),
            processed_images=rng.uniform(0, 255, (S, H, W, 3)).astype(np.float32),
        )
        path = export(pred, "gs_video", str(tmp_path), trj_mode="original",
                      max_per_tile=128)
        import os
        assert os.path.exists(path) and os.path.getsize(path) > 0


class TestStageTimer:
    def test_stage_accumulation_and_report(self):
        import time as _t

        from videogpa_tpu.utils import StageTimer

        syncs = []
        t = StageTimer(sync=lambda: syncs.append(1))
        for _ in range(3):
            with t.stage("forward"):
                _t.sleep(0.01)
        with t.stage("decode"):
            _t.sleep(0.005)
        s = t.summary()
        assert s["forward"]["count"] == 3
        assert s["forward"]["mean_ms"] >= 9
        assert len(syncs) == 8  # 2 per stage enter/exit
        assert "forward" in t.report() and "decode" in t.report()
