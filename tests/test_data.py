import os

import numpy as np
import pytest

from vgqa_tpu.config import build_default_cfg
from vgqa_tpu.data.synthetic import make_synthetic_dataset, write_synthetic_video
from vgqa_tpu.data.video_io import read_frames, uniform_sample_indices, video_info
from vgqa_tpu.data.words import clean_description


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidstg"))
    make_synthetic_dataset(d, num_videos=2, frames_per_video=30)
    return d


def _test_cfg(data_dir):
    cfg = build_default_cfg()
    cfg.DATA_DIR = data_dir
    cfg.INPUT.RESOLUTION = 64
    cfg.INPUT.TRAIN_SAMPLE_NUM = 8
    cfg.DATALOADER.NUM_WORKERS = 0
    return cfg


def test_video_io_roundtrip(tmp_path):
    path = str(tmp_path / "v.mp4")
    boxes = write_synthetic_video(path, 20, (64, 48), seed=1)
    assert len(boxes) == 20
    total, fps, w, h = video_info(path)
    assert total == 20 and w == 64 and h == 48
    frames = read_frames(path, [0, 5, 5, 19])
    assert frames.shape == (4, 48, 64, 3)
    np.testing.assert_array_equal(frames[1], frames[2])


def test_uniform_sample_indices():
    assert uniform_sample_indices(10, 10) == list(range(10))
    idx = uniform_sample_indices(100, 5)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 5


def test_clean_description():
    assert clean_description("Whtie Dog, runs LEFT!") == "white dog runs left"
    # underscore compounds survive the split and expand to two words
    assert clean_description("a baby_seat next_to it") == "a baby seat next to it"
    # digit-only tokens drop; tokens with a letter survive
    assert clean_description("frame 42 shows 1another man") == (
        "frame shows another man"
    )


def test_clean_description_matches_reference_table():
    """Every entry of the reference's typo dict must clean identically
    (/root/reference/vgqa/data/words.py:1-168 applied by clean_anno,
    vidstg_dataset.py:40-56)."""
    import re

    ref_ns = {}
    with open("/root/reference/vgqa/data/words.py") as f:
        exec(f.read(), ref_ns)  # constant data table only
    ref_dict = ref_ns["replace_dict"]

    from vgqa_tpu.data.words import REPLACE_WORDS

    assert REPLACE_WORDS == ref_dict

    split = re.compile(r"(\W+)")
    word_pt = re.compile(r"[A-Za-z]", re.S)

    def ref_clean(sentence):
        words = split.split(sentence.strip())
        words = [w.lower() for w in words if len(w) > 0 and w != " "]
        words = [w for w in words if word_pt.search(w)]
        words = [ref_dict.get(w, w) for w in words]
        return " ".join(words)

    for typo in ref_dict:
        s = f"the {typo} person waves"
        assert clean_description(s) == ref_clean(s), typo


def test_annotations_and_dataset(data_dir):
    from vgqa_tpu.data.dataset import build_dataset

    cfg = _test_cfg(data_dir)
    ds = build_dataset(cfg, "train")
    assert len(ds) == 4  # 2 videos x (caption + question)
    s = ds[0]
    assert s["frames"].shape[0] <= 8
    assert s["frames"].shape[1] == 64 and s["frames"].shape[2] == 64
    assert s["boxes"].ndim == 2 and s["boxes"].shape[1] == 4
    # normalized cxcywh after NormalizeAndPad
    assert (s["boxes"] >= 0).all() and (s["boxes"] <= 1).all()
    assert s["actioness"].sum() == s["boxes"].shape[0]
    assert s["text"].startswith("the green square")


def test_uint8_feed_matches_float_pipeline():
    """TPU.UINT8_FEED canvases, normalized the way the jitted step does it
    (u8/255 -> ImageNet stats -> pad re-zeroed), must reproduce the float
    pipeline's canvases to within pixel-quantization error; geometry
    (boxes, masks, letterbox) must be identical."""
    from vgqa_tpu.data.transforms import build_transforms

    frames = np.random.RandomState(0).rand(3, 48, 80, 3).astype(np.float32)
    boxes = np.array([[5, 6, 40, 30]] * 3, np.float32)

    outs = {}
    for emit in (False, True):
        cfg = build_default_cfg()
        cfg.INPUT.RESOLUTION = 64
        cfg.TPU.UINT8_FEED = emit
        tf = build_transforms(cfg, is_train=False)
        outs[emit] = tf({
            "frames": frames.copy(), "boxes": boxes.copy(), "text": "t",
            "letterbox": np.array([1, 1, 0, 0], np.float32),
        })
    f, u = outs[False], outs[True]
    assert u["frames"].dtype == np.uint8 and f["frames"].dtype == np.float32
    np.testing.assert_array_equal(f["pixel_mask"], u["pixel_mask"])
    np.testing.assert_allclose(f["boxes"], u["boxes"])
    np.testing.assert_allclose(f["letterbox"], u["letterbox"])

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    recon = (u["frames"].astype(np.float32) / 255.0 - mean) / std
    recon = np.where(u["pixel_mask"][None, :, :, None], recon, 0.0)
    # 0.5/255 pixel quantization -> <= 0.5/255/std ~ 0.0088 normalized
    np.testing.assert_allclose(recon, f["frames"], atol=0.01)


def test_eval_forward_uint8_matches_float():
    """make_eval_forward normalizes uint8 batches on device to the same
    outputs as the float feed."""
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.training.evaluator import make_eval_forward
    from vgqa_tpu.utils.containers import TextBatch, VideoBatch

    model = VSTGNet(GroundingConfig.tiny_test())
    res, t = 64, 4
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (1, t, res, res, 3), np.uint8)
    pixel_mask = np.ones((1, res, res), bool)
    pixel_mask[:, 56:, :] = False  # letterbox band
    time_mask = np.ones((1, t), bool)
    time_mask[:, -1] = False  # time-padded frame (collate zero-fills it)
    u8[:, -1] = 0
    text = TextBatch(jnp.asarray([[5, 8, 2]]), jnp.ones((1, 3), bool))

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    f32 = np.where(pixel_mask[:, None, :, :, None], f32, 0.0)
    f32 = np.where(time_mask[:, :, None, None, None], f32, 0.0)

    vid_f = VideoBatch(jnp.asarray(f32), jnp.asarray(pixel_mask),
                       jnp.asarray(time_mask))
    params = model.init(jax.random.PRNGKey(0), vid_f, text, train=False)
    fwd = make_eval_forward(model)
    ori = jnp.asarray([[res, res]], jnp.float32)
    lb = jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32)
    ref_packed, ref_span = fwd(params, vid_f, text, ori, lb)

    vid_u = VideoBatch(jnp.asarray(u8), jnp.asarray(pixel_mask),
                       jnp.asarray(time_mask))
    got_packed, got_span = fwd(params, vid_u, text, ori, lb)
    np.testing.assert_allclose(
        np.asarray(got_packed), np.asarray(ref_packed), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(got_span), np.asarray(ref_span))


def test_annotation_cache_reused(data_dir):
    from vgqa_tpu.data.annotations import load_items

    items1 = load_items(data_dir, "train")
    assert os.path.exists(
        os.path.join(data_dir, "data_cache", "vidstg-train-input.json")
    )
    items2 = load_items(data_dir, "train")
    assert [i["item_id"] for i in items1] == [i["item_id"] for i in items2]


def test_loader_batches(data_dir):
    from vgqa_tpu.data.loader import make_data_loader

    cfg = _test_cfg(data_dir)
    cfg.SOLVER.MAX_EPOCH = 1
    loader = make_data_loader(cfg, "train")
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    v = b["video"]
    assert v.frames.shape == (1, 8, 64, 64, 3)
    assert b["text"].token_ids.shape == (1, 26)
    t = b["targets"]
    assert t["boxes"].shape == (1, 8, 4)
    assert t["sted"].shape == (1, 2)
    s0, s1 = int(t["sted"][0, 0]), int(t["sted"][0, 1])
    act = np.asarray(t["actioness"][0])
    assert act[s0] == 1 and act[s1] == 1
    # boxes nonzero exactly on the GT span
    bx = np.asarray(t["boxes"][0])
    assert (np.abs(bx[s0 : s1 + 1]).sum(-1) > 0).all()
    assert b["targets"]["attr_labels"].shape == (1, cfg.DATASET.APP_NUM)


def test_loader_resume_and_shuffle(data_dir):
    from vgqa_tpu.data.loader import make_data_loader

    cfg = _test_cfg(data_dir)
    cfg.SOLVER.MAX_EPOCH = 2
    loader = make_data_loader(cfg, "train")
    all_iters = [b["iteration"] for b in loader]
    assert all_iters == list(range(len(loader)))
    resumed = make_data_loader(cfg, "train", start_iter=3)
    assert [b["iteration"] for b in resumed] == list(range(3, len(loader)))
