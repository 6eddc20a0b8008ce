"""Multi-host evaluator merge: size-negotiated gather of unbounded payloads.

Simulates a 2-process gather by faking ``process_allgather`` (the virtual
CPU mesh is still one process), with a rank-1 payload > 4 MB — the fixed
padding the old implementation used — to prove size negotiation.
"""

import json
import os

import numpy as np
import pytest


def _write_gt(data_dir, n_items):
    os.makedirs(os.path.join(data_dir, "data_cache"), exist_ok=True)
    gt = [
        {
            "item_id": i,
            "vid": f"v{i}",
            "bboxs": {str(f): [0.0, 0.0, 10.0, 10.0] for f in range(2, 6)},
            "description": "d",
            "qtype": "declar",
            "gt_temp_bound": [2, 5],
            "segment_bound": [0, 9],
        }
        for i in range(n_items)
    ]
    with open(
        os.path.join(data_dir, "data_cache", "vidstg-test-anno.json"), "w"
    ) as f:
        json.dump(gt, f)


def _rank_payload(item_id, n_frames=4):
    pred = {
        item_id: {f: [[0.0, 0.0, 10.0, 10.0]] for f in range(2, 2 + n_frames)}
    }
    return {
        "predictions": pred,
        "att": {item_id: {2: 1.0}},
        "video": {item_id: {"sted": [2, 6], "qtype": "declar"}},
        "kf": {item_id: (0.5, 0.25)},
    }


def test_sync_between_processes_merges_large_payloads(tmp_path, monkeypatch):
    import jax

    from vgqa_tpu.data.metrics.evaluator import VidSTGEvaluator
    from vgqa_tpu.parallel import distributed as dist_mod

    data_dir = str(tmp_path)
    _write_gt(data_dir, 2)

    ev = VidSTGEvaluator(None, data_dir, "test", [0.3, 0.5])

    # rank 0 holds item 0; rank 1 holds item 1 with a huge prediction dict
    local = _rank_payload(0)
    remote = _rank_payload(1)
    # inflate rank 1 beyond the old 4 MB fixed pad
    remote["predictions"][1].update(
        {f: [[float(f), 0.0, 10.0, 10.0]] for f in range(100, 120000)}
    )
    remote_json = json.dumps(remote, default=dist_mod._json_default)
    assert len(remote_json) > (1 << 22), "test payload must exceed 4 MB"
    remote_bytes = remote_json.encode()

    calls = {"n": 0}

    def fake_allgather(arr):
        calls["n"] += 1
        arr = np.asarray(arr)
        if arr.dtype == np.int64:  # size negotiation rounds
            return np.stack(
                [arr, np.array([len(remote_bytes)], np.int64)]
            )
        row2 = np.zeros(arr.shape, np.uint8)
        row2[: len(remote_bytes)] = np.frombuffer(remote_bytes, np.uint8)
        return np.stack([arr, row2])

    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    ev.update(local["predictions"])
    ev.update_att(local["att"])
    ev.video_update(local["video"])
    ev.update_kf_pr(local["kf"])

    ev.synchronize_between_processes()
    assert calls["n"] >= 2  # negotiated, not fixed-size

    # both items present with native key/type forms
    assert set(ev.predictions) == {0, 1}
    assert set(ev.video_predictions) == {0, 1}
    assert all(isinstance(k, int) for k in ev.predictions[1])
    assert isinstance(ev.kf_pred[1], tuple)
    assert len(ev.predictions[1]) > 100000

    res = ev.summarize()
    assert np.isfinite(res["declar_tiou"]) and res["declar_tiou"] > 0.0


def test_json_default_handles_numpy_and_tuples():
    from vgqa_tpu.parallel.distributed import _json_default

    out = json.dumps(
        {
            "a": np.float32(1.5),
            "b": np.arange(3),
            "c": (1, 2),
            "d": np.int64(7),
        },
        default=_json_default,
    )
    assert json.loads(out) == {"a": 1.5, "b": [0, 1, 2], "c": [1, 2], "d": 7}


def test_non_encodable_raises_at_sender():
    from vgqa_tpu.parallel.distributed import _json_default

    class Opaque:
        pass

    with pytest.raises(TypeError):
        json.dumps({"x": Opaque()}, default=_json_default)
