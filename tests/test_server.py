"""Drive the web app over a real socket (stdlib server)."""

import json
import os
import threading
import urllib.request
import urllib.error

import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    videos = tmp_path_factory.mktemp("videos")
    from vgqa_tpu.data.synthetic import write_synthetic_video

    write_synthetic_video(str(videos / "demo.mp4"), 12, (64, 48), seed=0)
    os.environ["VGQA_VIDEOS_DIR"] = str(videos)
    os.environ["VGQA_QA_MODEL_DIR"] = "__tiny__"

    import sys

    sys.path.insert(0, "app")
    import importlib

    server_mod = importlib.import_module("server")
    # module resolved VIDEOS_ROOT at import; repoint for the test
    server_mod.VIDEOS_ROOT = type(server_mod.VIDEOS_ROOT)(str(videos))
    server_mod.QA_MODEL_DIR = "__tiny__"

    srv = server_mod.make_server(0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", server_mod
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_health(server):
    base, _ = server
    status, body = _get(base + "/api/health")
    assert status == 200 and body == {"ok": True}


def test_videos_and_meta(server):
    base, _ = server
    _, body = _get(base + "/api/videos")
    assert body["files"] == ["demo.mp4"]
    _, meta = _get(base + "/api/meta?video=demo.mp4")
    assert meta["total_frames"] == 12 and meta["width"] == 64


def test_meta_missing_param(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/api/meta")
    assert e.value.code == 422


def test_path_traversal_blocked(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/api/meta?video=../../../etc/passwd")
    assert e.value.code in (400, 404)


def test_unknown_video_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/api/meta?video=nope.mp4")
    assert e.value.code == 404


def test_qa_endpoint(server):
    base, _ = server
    status, body = _post(
        base + "/api/qa",
        {"video": "demo.mp4", "question": "what moves?", "num_frames": 2,
         "max_tokens": 4},
    )
    assert status == 200
    assert "answer" in body


def test_qa_missing_fields(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/api/qa", {"video": "demo.mp4"})
    assert e.value.code == 422


def test_grounding_coalesces_concurrent_requests(server):
    """Concurrent grounding requests queue and coalesce into one V=2N
    forward (net-new vs the reference, which 409s every concurrent
    caller)."""
    import vgqa_tpu.inference.grounding as g_mod

    base, mod = server
    mod.GROUNDING_CONFIG = "configs/grounding_vidstg_tiny.yaml"
    mod.GROUNDING_CKPT = ""
    batch_sizes = []
    real_many = g_mod.predict_many

    def spying_many(requests, cfg_path=g_mod.DEFAULT_CONFIG_PATH,
                    ckpt_path=g_mod.DEFAULT_CHECKPOINT_PATH):
        batch_sizes.append(len(requests))
        return real_many(requests, cfg_path, ckpt_path)

    g_mod.predict_many = spying_many
    # hold the accelerator lock so submitted jobs pile up in the queue,
    # then release: the drain groups them into one coalesced forward
    assert mod._infer_lock.acquire(blocking=False)
    results = [None] * 3
    try:
        def call(i):
            results[i] = _post(
                base + "/api/predict",
                {"video": "demo.mp4", "query": f"a square {i}"},
            )

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        # wait until the later jobs are queued (the first may already be
        # popped by the drain thread, which is then blocked on the lock)
        for _ in range(200):
            with mod._ground_coalescer._mutex:
                n = len(mod._ground_coalescer._jobs)
            if n >= 2:
                break
            import time

            time.sleep(0.05)
    finally:
        mod._infer_lock.release()
    for t in threads:
        t.join(timeout=280)
    g_mod.predict_many = real_many
    assert all(r is not None and r[0] == 200 for r in results)
    for _, body in results:
        assert set(body["result"].keys()) == {"temporal", "tube"}
    # at least one drain served a pair in one coalesced V=2N forward
    assert batch_sizes and max(batch_sizes) >= 2, batch_sizes


def test_qa_coalesces_concurrent_requests(server):
    """Concurrent QA requests queue and coalesce into one batched decode
    (net-new vs the reference, which 409s every concurrent caller)."""
    import vgqa_tpu.inference.qa as qa_mod

    base, mod = server
    batch_sizes = []
    real_many = qa_mod.predict_many

    def spying_many(requests, model_dir=qa_mod.DEFAULT_MODEL_DIR):
        batch_sizes.append(len(requests))
        return real_many(requests, model_dir=model_dir)

    qa_mod.predict_many = spying_many
    # hold the accelerator lock so submitted jobs pile up in the queue,
    # then release: the drain groups them into one chat_batch call
    assert mod._infer_lock.acquire(blocking=False)
    results = [None] * 3
    try:
        def call(i):
            results[i] = _post(
                base + "/api/qa",
                {"video": "demo.mp4", "question": f"what moves {i}?",
                 "num_frames": 2, "max_tokens": 4},
            )

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        # wait until all three jobs are queued (first may already be
        # popped by the drain thread, which is then blocked on the lock)
        for _ in range(200):
            with mod._qa_coalescer._mutex:
                n = len(mod._qa_coalescer._jobs)
            if n >= 2:
                break
            import time

            time.sleep(0.05)
    finally:
        mod._infer_lock.release()
    for t in threads:
        t.join(timeout=300)
    qa_mod.predict_many = real_many

    for status, body in results:
        assert status == 200
        assert "answer" in body
    # at least one drain served >1 request in a single batched decode
    assert batch_sizes and max(batch_sizes) >= 2, batch_sizes


def test_video_range_request(server):
    base, mod = server
    full = (mod.VIDEOS_ROOT / "demo.mp4").read_bytes()

    # whole-file GET advertises range support
    with urllib.request.urlopen(base + "/videos/demo.mp4", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Accept-Ranges"] == "bytes"
        assert r.read() == full

    # bounded range -> 206 with the exact slice
    req = urllib.request.Request(
        base + "/videos/demo.mp4", headers={"Range": "bytes=10-29"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 206
        assert r.headers["Content-Range"] == f"bytes 10-29/{len(full)}"
        assert r.read() == full[10:30]

    # open-ended range
    req = urllib.request.Request(
        base + "/videos/demo.mp4", headers={"Range": f"bytes={len(full)-5}-"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 206
        assert r.read() == full[-5:]

    # suffix range (last N bytes)
    req = urllib.request.Request(
        base + "/videos/demo.mp4", headers={"Range": "bytes=-7"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 206
        assert r.read() == full[-7:]

    # unsatisfiable -> 416
    req = urllib.request.Request(
        base + "/videos/demo.mp4",
        headers={"Range": f"bytes={len(full)+100}-"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 416


def test_sibling_prefix_dir_blocked(server, tmp_path):
    # a sibling directory sharing the string prefix must not be reachable
    _, mod = server
    root = mod.VIDEOS_ROOT
    sibling = type(root)(str(root) + "-private")
    sibling.mkdir(exist_ok=True)
    (sibling / "secret.mp4").write_bytes(b"x")
    try:
        with pytest.raises(mod.HTTPError) as e:
            mod._safe_join_video(f"../{sibling.name}/secret.mp4")
        assert e.value.status == 400
    finally:
        (sibling / "secret.mp4").unlink()
        sibling.rmdir()


def test_index_served(server):
    base, _ = server
    with urllib.request.urlopen(base + "/", timeout=30) as r:
        html = r.read().decode()
    assert "VGQA" in html and "runGrounding" in html


def test_parse_queries_from_answer(server):
    """Numbered / bulleted / fallback parsing parity with the reference's
    regex parse (server.py:257-291)."""
    _, mod = server
    numbered = "Here are queries:\n1. a person walking left\n2) a red ball rolling\n- someone waving hand\n3. hi\n"
    qs = mod._parse_queries_from_answer(numbered)
    assert qs == [
        "a person walking left",
        "a red ball rolling",
        "someone waving hand",
    ]  # "hi" dropped (len <= 5)
    # no list structure -> sentence-split fallback, length-bounded
    fallback = mod._parse_queries_from_answer(
        "The person walks to the door. Then he waves. ok."
    )
    assert "The person walks to the door" in fallback
    assert "ok" not in fallback
    assert mod._parse_queries_from_answer("") == []


def test_generate_queries_endpoint(server):
    base, _ = server
    status, body = _post(
        base + "/api/generate-queries",
        {"video": "demo.mp4", "num_queries": 3, "num_frames": 2,
         "max_tokens": 8},
    )
    assert status == 200
    assert "queries" in body and "raw_answer" in body
    assert isinstance(body["queries"], list)


def test_predict_endpoint_tiny(server):
    """/api/predict end-to-end with the tiny grounding config (random
    weights — the pipeline/schema is the test, as with /api/qa)."""
    base, mod = server
    old = mod.GROUNDING_CONFIG
    mod.GROUNDING_CONFIG = "configs/grounding_vidstg_tiny.yaml"
    try:
        status, body = _post(
            base + "/api/predict", {"video": "demo.mp4", "query": "a square"}
        )
    finally:
        mod.GROUNDING_CONFIG = old
    assert status == 200
    assert body["video"]["name"] == "demo.mp4"
    assert "temporal" in body["result"] and "tube" in body["result"]
    t = body["result"]["temporal"]
    assert 0 <= t["start"] <= t["end"]
    assert len(body["result"]["tube"]) > 0
