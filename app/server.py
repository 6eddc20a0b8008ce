"""VGQA web interface.

Parity with the reference FastAPI app (/root/reference/app/server.py:45-298)
on the Python stdlib (FastAPI/uvicorn are not available here): same
endpoints — GET /api/health, /api/videos, /api/meta, POST /api/predict,
/api/qa, /api/generate-queries — same path-traversal-safe video resolution
(server.py:57-63), and static SPA + /videos mounts. Where the reference's
single-flight accelerator lock 409s every concurrent caller
(server.py:53,149-150), BOTH inference endpoints here coalesce concurrent
requests into batched accelerator calls instead of rejecting them
(net-new — see the coalescer below).
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional
from urllib.parse import parse_qs, urlparse

PROJECT_ROOT = Path(__file__).resolve().parents[1]
if str(PROJECT_ROOT) not in sys.path:
    sys.path.insert(0, str(PROJECT_ROOT))

from vgqa_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

DEFAULT_VIDEOS = PROJECT_ROOT / "videos"
VIDEOS_ROOT = Path(os.getenv("VGQA_VIDEOS_DIR", str(DEFAULT_VIDEOS))).resolve()
STATIC_DIR = Path(__file__).resolve().parent / "static"

GROUNDING_CONFIG = os.getenv("VGQA_GROUNDING_CONFIG", "configs/grounding_vidstg.yaml")
GROUNDING_CKPT = os.getenv("VGQA_GROUNDING_CKPT", "checkpoints/grounding/vidstg")
QA_MODEL_DIR = os.getenv("VGQA_QA_MODEL_DIR", "checkpoints/qa/InternVideo2_5_Chat_8B")

# single concurrent inference (accelerator protection)
_infer_lock = threading.Lock()


class HTTPError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _contained(p: Path, root: Path) -> bool:
    # strict containment: a plain str prefix check would also admit sibling
    # dirs sharing the prefix (/root/videos-private vs /root/videos)
    return p == root or p.is_relative_to(root)


def _safe_join_video(name: str) -> Path:
    p = (VIDEOS_ROOT / name).resolve()
    if not _contained(p, VIDEOS_ROOT):
        raise HTTPError(400, "Invalid path")
    if not p.exists() or not p.is_file():
        raise HTTPError(404, "Video not found")
    return p


def _list_videos_in(dir_path: Optional[str]) -> List[str]:
    base = VIDEOS_ROOT if not dir_path else (VIDEOS_ROOT / dir_path)
    base = base.resolve()
    if not _contained(base, VIDEOS_ROOT):
        raise HTTPError(400, "Invalid directory")
    if not base.exists():
        return []
    exts = {".mp4", ".avi", ".mov", ".mkv", ".webm"}
    return sorted(
        f.name for f in base.iterdir() if f.is_file() and f.suffix.lower() in exts
    )


def _video_meta(path: Path) -> Dict[str, Any]:
    from vgqa_tpu.data.video_io import video_info

    total, fps, w, h = video_info(str(path))
    return {"fps": fps, "total_frames": total, "width": w, "height": h}


def _parse_queries_from_answer(answer: str) -> List[str]:
    """Parity with server.py:257-291."""
    queries: List[str] = []
    patterns = [r"^\d+[\.)]\s*(.+)$", r"^[-•]\s*(.+)$"]
    for line in answer.split("\n"):
        line = line.strip()
        if not line:
            continue
        for pattern in patterns:
            m = re.match(pattern, line)
            if m:
                q = m.group(1).strip().strip("\"'.,:")
                if q and len(q) > 5:
                    queries.append(q)
                break
    if not queries and answer:
        for sentence in re.split(r"[.!?]\s+", answer):
            sentence = sentence.strip()
            if 10 < len(sentence) < 100:
                queries.append(sentence)
    return queries[:20]


# -- request coalescing -------------------------------------------------------
# The reference serves strictly one request at a time: its single-flight
# lock 409s every concurrent caller (/root/reference/app/server.py:149-150).
# Here BOTH inference endpoints COALESCE instead: each handler thread
# enqueues a job and blocks; a drain thread groups up to max_batch pending
# jobs into ONE batched accelerator call —
#   * QA: lockstep batched decode (vgqa_tpu.inference.qa.predict_many ->
#     QAEngine.chat_batch); every job keeps its own generation settings
#     (sampled rows use independent per-row RNG streams), so coalescing
#     never changes what a request would have answered solo.
#   * Grounding: videos sharing a frame count ride ONE V=2N forward
#     (vgqa_tpu.inference.grounding.predict_many) — at 420px batch 2
#     videos run at the latency of one (BASELINE.md), doubling aggregate
#     throughput under concurrent load.
# Aggregate throughput scales with concurrent load instead of rejecting it.


class _Coalescer:
    """Queue + drain-thread request coalescer around a batched runner.

    ``run_batch(requests) -> list[result | Exception]`` executes one
    drained batch (aligned with its input); per-slot Exceptions fail only
    their own caller."""

    def __init__(self, max_batch: int, timeout_s: float, run_batch):
        self.max_batch = max(1, max_batch)
        self.timeout_s = timeout_s
        self.run_batch = run_batch
        self._jobs: List[Dict[str, Any]] = []
        self._mutex = threading.Lock()
        self._alive = False

    def _run_jobs(self, jobs: List[Dict[str, Any]]) -> None:
        try:
            with _infer_lock:  # queued work waits for the accelerator
                results = self.run_batch([j["request"] for j in jobs])
            for job, res in zip(jobs, results):
                if isinstance(res, Exception):
                    job["error"] = res
                else:
                    job["result"] = res
        except Exception as e:  # noqa: BLE001 - engine failure fails all
            for job in jobs:
                if job["result"] is None and job["error"] is None:
                    job["error"] = e
        finally:
            for job in jobs:
                job["done"].set()

    def _drain_loop(self) -> None:
        while True:
            with self._mutex:
                if not self._jobs:
                    self._alive = False
                    return
                batch = self._jobs[: self.max_batch]
                del self._jobs[: self.max_batch]
            self._run_jobs(batch)

    def submit(self, request: Dict[str, Any]) -> Dict[str, Any]:
        job: Dict[str, Any] = {
            "request": request,
            "done": threading.Event(),
            "result": None,
            "error": None,
        }
        with self._mutex:
            self._jobs.append(job)
            if not self._alive:
                self._alive = True
                threading.Thread(target=self._drain_loop,
                                 daemon=True).start()
        if not job["done"].wait(timeout=self.timeout_s):
            # withdraw the job if it is still queued so the drain thread
            # does not spend an accelerator slot computing an answer nobody
            # will read (if already in flight, the result is discarded)
            with self._mutex:
                try:
                    self._jobs.remove(job)
                except ValueError:
                    pass
            raise HTTPError(504, "request timed out in queue")
        if job["error"] is not None:
            err = job["error"]
            # HTTPError and FileNotFoundError keep their pre-coalescer
            # status mapping (do_POST: FileNotFoundError -> 503 "model dir
            # missing"; video paths were validated before enqueue)
            if isinstance(err, (HTTPError, FileNotFoundError)):
                raise err
            raise HTTPError(500, f"{type(err).__name__}: {err}")
        return job["result"]


def _run_qa_batch(requests: List[Dict[str, Any]]) -> List[Any]:
    from vgqa_tpu.inference.qa import predict_many

    return predict_many(requests, model_dir=QA_MODEL_DIR)


def _run_ground_batch(requests: List[Dict[str, Any]]) -> List[Any]:
    from vgqa_tpu.inference.grounding import predict_many

    return predict_many(requests, GROUNDING_CONFIG, GROUNDING_CKPT)


_qa_coalescer = _Coalescer(
    int(os.getenv("VGQA_QA_MAX_BATCH", "4")),
    float(os.getenv("VGQA_QA_TIMEOUT_S", "600")),
    _run_qa_batch,
)
# grounding throughput plateaus past 2 videos/forward (BASELINE.md: batch
# 4 clip-halves = batch 2), so the default drain is pairs
_ground_coalescer = _Coalescer(
    int(os.getenv("VGQA_GROUND_MAX_BATCH", "2")),
    float(os.getenv("VGQA_GROUND_TIMEOUT_S", "600")),
    _run_ground_batch,
)


def _submit_qa(request: Dict[str, Any]) -> Dict[str, Any]:
    return _qa_coalescer.submit(request)


# -- endpoint implementations (pure functions for testability) --------------
def handle_health() -> Dict[str, Any]:
    return {"ok": True}


def handle_videos(dir_path: Optional[str]) -> Dict[str, Any]:
    return {"directory": str(VIDEOS_ROOT), "files": _list_videos_in(dir_path)}


def handle_meta(video: str) -> Dict[str, Any]:
    return _video_meta(_safe_join_video(video))


def handle_predict(body: Dict[str, Any]) -> Dict[str, Any]:
    path = _safe_join_video(body["video"])
    meta = _video_meta(path)

    res = _ground_coalescer.submit(
        {"video_path": str(path), "query": body["query"]}
    )
    return {
        "video": {"name": path.name, "url": f"/videos/{path.name}"},
        "meta": meta,
        "result": res,
    }


def handle_qa(body: Dict[str, Any]) -> Dict[str, Any]:
    path = _safe_join_video(body["video"])
    bound = None
    if body.get("bound_start") is not None and body.get("bound_end") is not None:
        bound = (body["bound_start"], body["bound_end"])

    return _submit_qa({
        "video_path": str(path),
        "question": body["question"],
        "bound": bound,
        "num_frames": body.get("num_frames", 32),
        "max_new_tokens": body.get("max_tokens", 256),
    })


def handle_generate_queries(body: Dict[str, Any]) -> Dict[str, Any]:
    path = _safe_join_video(body["video"])
    question = (
        f"Generate {body.get('num_queries', 10)} text queries for video "
        "grounding. Each query should be a short phrase describing a visible "
        "action (e.g., 'a person walking to the left', 'a red ball rolling', "
        "'someone waving hand'). List them numbered."
    )

    res = _submit_qa({
        "video_path": str(path),
        "question": question,
        "bound": None,
        "num_frames": body.get("num_frames", 64),
        "max_new_tokens": body.get("max_tokens", 300),
    })
    answer = res.get("answer", "")
    return {"queries": _parse_queries_from_answer(answer), "raw_answer": answer}


# -- stdlib HTTP plumbing ----------------------------------------------------
class Handler(BaseHTTPRequestHandler):
    server_version = "VGQA/0.1"

    def _send_json(self, obj: Any, status: int = 200):
        data = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _send_file(self, path: Path, content_type: str, ranged: bool = False):
        """Stream a file in constant memory; with ``ranged`` honor a
        ``Range: bytes=`` header with a 206 + Content-Range response so the
        browser <video> element can seek (parity with the reference's
        StaticFiles mount, /root/reference/app/server.py:41-44).
        """
        size = path.stat().st_size
        start, end = 0, size - 1
        status = 200
        range_header = self.headers.get("Range") if ranged else None
        if range_header:
            m = re.match(r"bytes=(\d*)-(\d*)$", range_header.strip())
            if not m or (not m.group(1) and not m.group(2)):
                return self._send_json({"detail": "invalid Range"}, 416)
            if m.group(1):
                start = int(m.group(1))
                end = int(m.group(2)) if m.group(2) else size - 1
            else:  # suffix range: last N bytes
                start = max(0, size - int(m.group(2)))
            end = min(end, size - 1)
            if start >= size or start > end:
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{size}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            status = 206
        length = end - start + 1
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(length))
        if ranged:
            self.send_header("Accept-Ranges", "bytes")
        if status == 206:
            self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
        self.end_headers()
        with path.open("rb") as f:
            f.seek(start)
            remaining = length
            while remaining > 0:
                chunk = f.read(min(1 << 20, remaining))
                if not chunk:
                    break
                self.wfile.write(chunk)
                remaining -= len(chunk)

    def log_message(self, fmt, *args):  # quiet by default
        if os.getenv("VGQA_SERVER_VERBOSE"):
            super().log_message(fmt, *args)

    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            if url.path in ("/", "/app", "/app/"):
                index = STATIC_DIR / "index.html"
                if index.exists():
                    return self._send_file(index, "text/html")
                return self._send_json(
                    {"message": "Static UI not found. Visit /app if configured."}
                )
            if url.path == "/api/health":
                return self._send_json(handle_health())
            if url.path == "/api/videos":
                return self._send_json(handle_videos(q.get("dir")))
            if url.path == "/api/meta":
                if "video" not in q:
                    raise HTTPError(422, "missing required query param: video")
                return self._send_json(handle_meta(q["video"]))
            if url.path.startswith("/videos/"):
                p = _safe_join_video(url.path[len("/videos/") :])
                return self._send_file(p, "video/mp4", ranged=True)
            if url.path.startswith("/app/"):
                rel = url.path[len("/app/") :]
                p = (STATIC_DIR / rel).resolve()
                if not _contained(p, STATIC_DIR) or not p.exists():
                    raise HTTPError(404, "Not found")
                ctype = "text/html" if p.suffix == ".html" else "text/plain"
                return self._send_file(p, ctype)
            raise HTTPError(404, "Not found")
        except HTTPError as e:
            self._send_json({"detail": e.message}, e.status)
        except Exception as e:  # pragma: no cover
            self._send_json({"detail": f"{type(e).__name__}: {e}"}, 500)

    def do_POST(self):
        url = urlparse(self.path)
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            routes = {
                "/api/predict": (handle_predict, ("video", "query")),
                "/api/qa": (handle_qa, ("video", "question")),
                "/api/generate-queries": (handle_generate_queries, ("video",)),
            }
            if url.path not in routes:
                raise HTTPError(404, "Not found")
            fn, required = routes[url.path]
            missing = [k for k in required if k not in body]
            if missing:
                raise HTTPError(422, f"missing required fields: {missing}")
            return self._send_json(fn(body))
        except HTTPError as e:
            self._send_json({"detail": e.message}, e.status)
        except json.JSONDecodeError:
            self._send_json({"detail": "invalid JSON body"}, 400)
        except FileNotFoundError as e:
            self._send_json({"detail": str(e)}, 503)
        except Exception as e:  # pragma: no cover
            self._send_json({"detail": f"Inference failed: {type(e).__name__}: {e}"}, 500)


def make_server(port: int = 8000) -> ThreadingHTTPServer:
    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


if __name__ == "__main__":
    port = int(os.getenv("PORT", "8000"))
    print(f"VGQA server listening on :{port} (videos: {VIDEOS_ROOT})")
    make_server(port).serve_forever()
