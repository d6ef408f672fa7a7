"""DA3 model-serving backend (stdlib HTTP).

Functional equivalent of the reference FastAPI backend
(``depth_anything_3/services/backend.py:96-201,1156-1368``): a persistent
model held by a worker thread draining a task queue, with endpoints

    GET  /status          server + model state
    POST /infer           {"images": [b64 or path, ...], "export": "npz"}
                          {"video": path, "fps": 1.0, ...}
                          {"colmap": dir, "sparse_subdir": "", ...}
    GET  /tasks           task listing
    GET  /tasks/<id>      task state/result path
    GET  /memory          device memory introspection
    POST /reload          reload model weights

Tasks are garbage-collected after a TTL like the reference (:392-457).
fastapi/uvicorn are not available in this environment, so this is built on
``http.server.ThreadingHTTPServer``.
"""

from __future__ import annotations

import base64
import json
import os
import queue
import tempfile
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

TASK_TTL_SECONDS = 3600.0


def _sample_video_fps(video_path: str, fps: float = 1.0):
    """Sample frames from a video at ~fps frames/second -> (S, H, W, 3) uint8.

    Mirrors the reference VideoHandler: frame interval
    ``max(1, int(video_fps / fps))``; requesting more than the native rate
    decodes every frame (``services/input_handlers.py:221-286``). Uses
    OpenCV metadata instead of ffprobe (same fields).
    """
    import cv2
    import numpy as np

    if not fps > 0:
        raise ValueError(f"fps must be > 0, got {fps}")
    if not os.path.exists(video_path):
        raise FileNotFoundError(f"video not found: {video_path}")
    cap = cv2.VideoCapture(video_path)
    try:
        video_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()
    if total <= 0:
        from videogpa_tpu.data.video_io import read_video_frames

        frames = read_video_frames(video_path)
        total = len(frames)
        interval = max(1, int(video_fps / fps))
        return frames[::interval]
    interval = max(1, int(video_fps / fps))
    idx = np.arange(0, total, interval)
    from videogpa_tpu.data.video_io import read_video_frames

    return read_video_frames(video_path, idx)


class ModelBackend:
    """Persistent model + background inference worker with a task queue."""

    def __init__(self, model_dir: Optional[str] = None, out_root: Optional[str] = None):
        self.model_dir = model_dir
        self.out_root = out_root or tempfile.mkdtemp(prefix="da3_backend_")
        self.tasks: Dict[str, Dict[str, Any]] = {}
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._params = None
        self._cfg = None
        self.started = time.time()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        self._gc = threading.Thread(target=self._gc_loop, daemon=True)
        self._gc.start()

    # -- model ---------------------------------------------------------

    def _ensure_model(self):
        if self._params is None:
            from videogpa_tpu.models.loader import load_da3

            self._params, self._cfg = load_da3(
                self.model_dir or "depth-anything/DA3-Large"
            )

    def reload(self):
        with self._lock:
            self._params = None
        self._ensure_model()

    # -- tasks ---------------------------------------------------------

    def submit(self, request: Dict[str, Any]) -> str:
        """Queue an inference request. ``request`` carries one input source —
        ``images`` (b64/path list), ``video`` (path + optional ``fps``), or
        ``colmap`` (project dir + optional ``sparse_subdir``) — plus
        ``export`` (reference input surface:
        ``depth_anything_3/services/input_handlers.py:66-286``)."""
        task_id = uuid.uuid4().hex[:12]
        self.tasks[task_id] = {
            "id": task_id,
            "status": "queued",
            "created": time.time(),
            "export": request.get("export", "npz"),
        }
        self._queue.put((task_id, request))
        return task_id

    def _resolve_input(self, request: Dict[str, Any]):
        """request -> (frames (S, H, W, 3) uint8, gt_extrinsics or None)."""
        import numpy as np

        if request.get("images"):
            frames = np.stack(
                [self._decode_image(i) for i in request["images"]]
            )
            return frames, None
        if request.get("video"):
            frames = _sample_video_fps(
                request["video"], float(request.get("fps", 1.0))
            )
            return np.stack([self._resize_14(f) for f in frames]), None
        if request.get("colmap"):
            from videogpa_tpu.models.da3.colmap_io import load_colmap_scene

            files, extrinsics, _intrinsics = load_colmap_scene(
                request["colmap"], request.get("sparse_subdir", "")
            )
            frames = np.stack([self._decode_image(p) for p in files])
            return frames, extrinsics
        raise ValueError("one of images/video/colmap required")

    def _drain(self):
        while True:
            task_id, request = self._queue.get()
            task = self.tasks.get(task_id)
            if task is None:
                continue
            task["status"] = "running"
            try:
                from videogpa_tpu.models.da3.export import export
                from videogpa_tpu.models.da3.model import da3_inference

                self._ensure_model()
                frames, gt_extrinsics = self._resolve_input(request)
                pred = da3_inference(
                    self._params, frames, self._cfg,
                    gt_extrinsics=gt_extrinsics,
                )
                out_dir = os.path.join(self.out_root, task_id)
                path = export(pred, request.get("export", "npz"), out_dir)
                task.update(status="done", result=path, n_frames=len(frames),
                            finished=time.time())
            except Exception as e:
                task.update(status="error", error=str(e), finished=time.time())

    @staticmethod
    def _decode_image(item: str):
        import cv2
        import numpy as np

        if os.path.exists(item):
            img = cv2.cvtColor(cv2.imread(item), cv2.COLOR_BGR2RGB)
        else:
            raw = np.frombuffer(base64.b64decode(item), np.uint8)
            img = cv2.cvtColor(cv2.imdecode(raw, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        return ModelBackend._resize_14(img)

    @staticmethod
    def _resize_14(img):
        """Resize so max side ~518 and both sides are /14-divisible."""
        import cv2

        h, w = img.shape[:2]
        scale = 518 / max(h, w)
        nh = max(14, round(h * scale / 14) * 14)
        nw = max(14, round(w * scale / 14) * 14)
        return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)

    def _gc_loop(self):
        while True:
            time.sleep(60)
            now = time.time()
            stale = [
                tid for tid, t in list(self.tasks.items())
                if t.get("finished") and now - t["finished"] > TASK_TTL_SECONDS
            ]
            for tid in stale:
                self.tasks.pop(tid, None)

    # -- introspection -------------------------------------------------

    def status(self) -> dict:
        return {
            "status": "ok",
            "model_loaded": self._params is not None,
            "model_dir": self.model_dir,
            "uptime_sec": round(time.time() - self.started, 1),
            "pending": self._queue.qsize(),
            "tasks": len(self.tasks),
        }

    @staticmethod
    def memory() -> dict:
        import jax

        out = {}
        for d in jax.devices():
            stats = None
            try:
                stats = d.memory_stats()
            except Exception:
                pass
            out[str(d)] = stats or {"memory_stats": "unavailable"}
        return out


_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>DA3 backend</title>
<style>body{font-family:sans-serif;max-width:48em;margin:2em auto}
pre{background:#f4f4f4;padding:1em;overflow:auto}</style></head>
<body>
<h1>Depth Anything 3 — TPU backend</h1>
<p>Pick images, submit for inference, poll the task below.</p>
<input type="file" id="files" multiple accept="image/*">
<select id="fmt"><option>npz</option><option>mini_npz</option><option>ply</option>
<option>glb</option><option>depth_vis</option><option>gs_ply</option></select>
<button onclick="run()">Infer</button>
<h3>Status</h3><pre id="status">-</pre>
<h3>Tasks</h3><pre id="tasks">-</pre>
<script>
async function refresh(){
  document.getElementById('status').textContent =
    JSON.stringify(await (await fetch('/status')).json(), null, 2);
  document.getElementById('tasks').textContent =
    JSON.stringify(await (await fetch('/tasks')).json(), null, 2);
}
async function run(){
  const files = document.getElementById('files').files;
  const imgs = [];
  for (const f of files){
    imgs.push(await new Promise(r => {
      const rd = new FileReader();
      rd.onload = () => r(rd.result.split(',')[1]);
      rd.readAsDataURL(f);
    }));
  }
  await fetch('/infer', {method:'POST', body: JSON.stringify(
    {images: imgs, export: document.getElementById('fmt').value})});
  refresh();
}
refresh(); setInterval(refresh, 3000);
</script></body></html>
"""


def make_handler(backend: ModelBackend):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                # minimal browser UI (the reference ships a gradio app/;
                # gradio is unavailable here, so a stdlib page covers the
                # upload -> infer -> inspect loop against the same endpoints)
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            if self.path == "/status":
                return self._send(200, backend.status())
            if self.path == "/memory":
                return self._send(200, backend.memory())
            if self.path == "/tasks":
                return self._send(200, {"tasks": list(backend.tasks.values())})
            if self.path.startswith("/tasks/"):
                task = backend.tasks.get(self.path.split("/")[-1])
                if task is None:
                    return self._send(404, {"error": "unknown task"})
                return self._send(200, task)
            return self._send(404, {"error": "unknown endpoint"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                return self._send(400, {"error": "invalid JSON"})
            if self.path == "/infer":
                if not any(payload.get(k) for k in ("images", "video", "colmap")):
                    return self._send(
                        400, {"error": "one of images/video/colmap required"}
                    )
                if "fps" in payload:
                    try:
                        fps_ok = float(payload["fps"]) > 0
                    except (TypeError, ValueError):
                        fps_ok = False
                    if not fps_ok:
                        return self._send(
                            400, {"error": "fps must be a number > 0"}
                        )
                task_id = backend.submit(payload)
                return self._send(200, {"task_id": task_id})
            if self.path == "/reload":
                try:
                    backend.reload()
                    return self._send(200, {"status": "reloaded"})
                except Exception as e:
                    return self._send(500, {"error": str(e)})
            return self._send(404, {"error": "unknown endpoint"})

        def log_message(self, *args):  # quiet
            pass

    return Handler


def serve(model_dir: Optional[str] = None, host: str = "127.0.0.1", port: int = 8000):
    backend = ModelBackend(model_dir)
    server = ThreadingHTTPServer((host, port), make_handler(backend))
    print(f"DA3 backend listening on http://{host}:{port}")
    server.serve_forever()
