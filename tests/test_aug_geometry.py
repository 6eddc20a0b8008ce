"""Golden geometry parity: the ACTUAL reference transform modules vs ours.

Loads /root/reference/vgqa/data/transforms.py (+ its BoxList) and runs it
against ``vgqa_tpu.data.transforms`` on identical inputs with identical RNG
streams, asserting every random geometric decision — flip, branch select,
resize ladder under the 720 long-side cap, size-crop retries — lands on the
same output geometry and box coordinates (VERDICT r2 Missing #2).

torchvision is absent in this environment, so a minimal geometry-exact stub
supplies F.hflip/resize/crop/normalize and RandomCrop.get_params with the
same randint bounds/order torchvision uses; pixel VALUES are not compared
(cv2 vs interpolate differ), only shapes, boxes, and text.
"""

import importlib.util
import random
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference/vgqa"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    T = types.ModuleType("torchvision.transforms")
    F = types.ModuleType("torchvision.transforms.functional")

    def hflip(x):
        return x.flip(-1)

    def resize(img, size, antialias=None):
        import torch.nn.functional as tnf

        return tnf.interpolate(
            img, size=tuple(size), mode="bilinear", align_corners=False,
            antialias=bool(antialias),
        )

    def crop(img, top, left, h, w):
        return img[..., top : top + h, left : left + w]

    def normalize(x, mean, std):
        m = torch.tensor(mean).view(-1, 1, 1)
        s = torch.tensor(std).view(-1, 1, 1)
        return (x - m) / s

    F.hflip, F.resize, F.crop, F.normalize = hflip, resize, crop, normalize

    class RandomCrop:
        @staticmethod
        def get_params(img, output_size):
            # torchvision order: i (top) first, then j (left), both
            # uniform inclusive of h-th / w-tw
            th, tw = output_size
            h, w = img.shape[-2], img.shape[-1]
            i = random.randint(0, h - th)
            j = random.randint(0, w - tw)
            return i, j, th, tw

    class ColorJitter:
        def __init__(self, **kw):
            pass

        def __call__(self, x):
            return x

    T.RandomCrop = RandomCrop
    T.ColorJitter = ColorJitter
    T.functional = F
    tv.transforms = T
    tv.__version__ = "stub"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = T
    sys.modules["torchvision.transforms.functional"] = F


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    _install_torchvision_stub()
    for pkg in ("vgqa", "vgqa.utils", "vgqa.data"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    bb = _load_module("vgqa.utils.bounding_boxes", f"{REF}/utils/bounding_boxes.py")
    tr = _load_module("vgqa.data.transforms", f"{REF}/data/transforms.py")
    yield types.SimpleNamespace(T=tr, BoxList=bb.BoxList)
    # uninstall the stubs: a lingering spec-less torchvision stub breaks
    # any later FIRST import of transformers (find_spec raises
    # "torchvision.__spec__ is None"), and test_fullchain_parity stubs a
    # different torchvision shape (ops.boxes, no transforms)
    for name in list(sys.modules):
        if (name == "torchvision" or name.startswith("torchvision.")
                or name == "vgqa" or name.startswith("vgqa.")):
            sys.modules.pop(name, None)


def _make_cfg(res=420):
    from vgqa_tpu.config import build_default_cfg

    cfg = build_default_cfg()
    cfg.INPUT.RESOLUTION = res
    cfg.INPUT.AUG_SCALE = True
    cfg.INPUT.FLIP_PROB_TRAIN = 0.5
    return cfg


def _sample(h, w, t=2, seed=0):
    """One fixed video sample in both layouts; boxes with >=40 px margin so
    crop-validity decisions can't flip on float noise between the stacks."""
    g = np.random.default_rng(seed)
    frames = g.random((t, h, w, 3), dtype=np.float32)
    boxes = []
    for _ in range(t):
        x0 = g.uniform(0.1 * w, 0.4 * w)
        y0 = g.uniform(0.1 * h, 0.4 * h)
        boxes.append([x0, y0, x0 + 0.4 * w, y0 + 0.4 * h])
    boxes = np.asarray(boxes, np.float32)
    text = "the dog on the left of the red car"
    return frames, boxes, text


def _ref_train_pipeline(refmod, res):
    T = refmod.T
    candidates = [res - 32 * i for i in range(4)]
    # exactly /root/reference/vgqa/data/build.py:26-46 (minus Normalize:
    # geometry only)
    return T.Compose(
        [
            T.RandomHorizontalFlip(0.5),
            T.RandomSelect(
                T.RandomResize(candidates, max_size=720),
                T.Compose(
                    [
                        T.RandomResize([400, 500, 600]),
                        T.RandomSizeCrop(384, 600),
                        T.RandomResize(candidates, max_size=720),
                    ]
                ),
            ),
        ]
    )


SIZES = [(480, 640), (720, 1280), (360, 480), (600, 600)]


@pytest.mark.parametrize("h,w", SIZES)
def test_train_geometry_matches_reference(ref, h, w):
    from vgqa_tpu.data.transforms import Compose, build_pre_canvas_transforms

    cfg = _make_cfg(res=420)
    ours_pipeline = Compose(build_pre_canvas_transforms(cfg, is_train=True))
    ref_pipeline = _ref_train_pipeline(ref, 420)

    for seed in range(25):
        frames, boxes, text = _sample(h, w, seed=seed)

        random.seed(seed)
        r = ref_pipeline(
            {
                "frames": torch.from_numpy(frames).permute(0, 3, 1, 2),
                "boxs": ref.BoxList(torch.from_numpy(boxes), (w, h), mode="xyxy"),
                "text": text,
            }
        )
        ref_hw = tuple(r["frames"].shape[-2:])
        ref_boxes = r["boxs"].bbox.numpy()

        random.seed(seed)
        o = ours_pipeline(
            {"frames": frames, "boxes": boxes.copy(), "text": text,
             "letterbox": np.array([1, 1, 0, 0], np.float32)}
        )
        assert o["frames"].shape[1:3] == ref_hw, (seed, h, w)
        np.testing.assert_allclose(o["boxes"], ref_boxes, atol=0.1, rtol=1e-4)
        assert o["text"] == r["text"]


@pytest.mark.parametrize("h,w", SIZES + [(1080, 1920), (640, 360)])
def test_eval_geometry_matches_reference(ref, h, w):
    from vgqa_tpu.data.transforms import Compose, build_pre_canvas_transforms

    cfg = _make_cfg(res=420)
    ours = Compose(build_pre_canvas_transforms(cfg, is_train=False))
    ref_pipeline = ref.T.RandomResize(420, max_size=720)

    frames, boxes, text = _sample(h, w, t=1)
    random.seed(7)
    r = ref_pipeline(
        {
            "frames": torch.from_numpy(frames).permute(0, 3, 1, 2),
            "boxs": ref.BoxList(torch.from_numpy(boxes), (w, h), mode="xyxy"),
            "text": text,
        }
    )
    random.seed(7)
    o = ours({"frames": frames, "boxes": boxes.copy(), "text": text})
    assert o["frames"].shape[1:3] == tuple(r["frames"].shape[-2:])
    np.testing.assert_allclose(o["boxes"], r["boxs"].bbox.numpy(), atol=0.1,
                               rtol=1e-4)


def test_letterbox_affine_roundtrip():
    """The tracked ori->canvas affine reproduces the pipeline's own box
    mapping, and inverts back to original pixels (the postprocess
    contract)."""
    from vgqa_tpu.data.transforms import build_transforms

    for h, w in [(480, 640), (720, 1280), (360, 480)]:
        cfg = _make_cfg(res=420)
        tf = build_transforms(cfg, is_train=False)
        frames, boxes, text = _sample(h, w, t=1)
        sample = {
            "frames": frames,
            "boxes": boxes.copy(),
            "text": text,
            "letterbox": np.array([1, 1, 0, 0], np.float32),
        }
        out = tf(sample)
        ch, cw = out["frames"].shape[1:3]
        assert (ch, cw) == (420, 420)
        sx, sy, ox, oy = out["letterbox"]

        # forward: affine applied to ORIGINAL boxes == pipeline's boxes
        got = out["boxes"]  # normalized cxcywh on canvas
        xyxy = np.stack(
            [
                (got[:, 0] - got[:, 2] / 2) * cw,
                (got[:, 1] - got[:, 3] / 2) * ch,
                (got[:, 0] + got[:, 2] / 2) * cw,
                (got[:, 1] + got[:, 3] / 2) * ch,
            ],
            axis=1,
        )
        expect = boxes * np.array([sx, sy, sx, sy]) + np.array([ox, oy, ox, oy])
        np.testing.assert_allclose(xyxy, expect, atol=0.51)

        # inverse: canvas pixels back to original pixels
        inv = (xyxy - np.array([ox, oy, ox, oy])) / np.array([sx, sy, sx, sy])
        np.testing.assert_allclose(inv, boxes, atol=1.0)


def test_postprocess_letterbox_inversion():
    """postprocess(letterbox=...) undoes the eval letterbox on device."""
    import jax.numpy as jnp

    from vgqa_tpu.data.transforms import build_transforms
    from vgqa_tpu.models.postprocess import postprocess

    cfg = _make_cfg(res=420)
    tf = build_transforms(cfg, is_train=False)
    frames, boxes, text = _sample(480, 640, t=1)
    out = tf({"frames": frames, "boxes": boxes.copy(), "text": text,
              "letterbox": np.array([1, 1, 0, 0], np.float32)})
    ch, cw = out["frames"].shape[1:3]
    lb = np.asarray(out["letterbox"]) / np.array([cw, ch, cw, ch], np.float32)

    pred = jnp.asarray(out["boxes"][None])  # [1, T, 4] canvas cxcywh
    sted = jnp.zeros((1, pred.shape[1], 2))
    tm = jnp.ones((1, pred.shape[1]), bool)
    ori = jnp.asarray([[480.0, 640.0]])
    got, _, _ = postprocess(pred, sted, ori, tm, letterbox=jnp.asarray(lb[None]))
    np.testing.assert_allclose(np.asarray(got[0]), boxes, atol=1.0)


def test_rect_canvas():
    """INPUT.CANVAS=[448, 736] letterboxes reference-scale content with no
    downscale (420-short/720-long fits), mask marks the content region."""
    from vgqa_tpu.data.transforms import build_transforms, canvas_hw

    cfg = _make_cfg(res=420)
    cfg.INPUT.CANVAS = [448, 736]
    assert canvas_hw(cfg) == (448, 736)
    tf = build_transforms(cfg, is_train=False)
    frames, boxes, text = _sample(480, 640, t=1)
    out = tf({"frames": frames, "boxes": boxes.copy(), "text": text})
    assert out["frames"].shape[1:] == (448, 736, 3)
    # 480x640 -> eval resize (420, 560): content untouched by scale-to-fit
    assert out["pixel_mask"].sum() == 420 * 560
