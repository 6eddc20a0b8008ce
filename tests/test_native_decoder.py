import numpy as np
import pytest

from vgqa_tpu.data.synthetic import write_synthetic_video
from vgqa_tpu.native import videodec


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vid") / "v.mp4")
    write_synthetic_video(p, 30, (64, 48), seed=0)
    return p


needs_native = pytest.mark.skipif(
    not videodec.available(), reason="native decoder not built (no libav)"
)


@needs_native
def test_info(video):
    total, fps, w, h = videodec.video_info(video)
    assert (total, w, h) == (30, 64, 48)
    assert abs(fps - 10.0) < 0.1


@needs_native
def test_selective_decode_matches_cv2(video):
    from vgqa_tpu.data.video_io import _cv2_read_frames

    ids = [0, 3, 11, 11, 29]
    native = videodec.read_frames(video, ids)
    assert native.shape == (5, 48, 64, 3)
    np.testing.assert_array_equal(native[2], native[3])
    cv = _cv2_read_frames(video, ids)
    diff = np.abs(native.astype(int) - cv.astype(int)).mean()
    assert diff < 3.0  # same decoder family; tiny colorspace rounding allowed


@needs_native
def test_unordered_and_backward_ids(video):
    fr = videodec.read_frames(video, [20, 5, 5, 0])
    fwd = videodec.read_frames(video, [0, 5, 20])
    np.testing.assert_array_equal(fr[3], fwd[0])
    np.testing.assert_array_equal(fr[1], fwd[1])
    np.testing.assert_array_equal(fr[0], fwd[2])


@needs_native
def test_out_of_range_clamps(video):
    fr = videodec.read_frames(video, [29, 35])
    np.testing.assert_array_equal(fr[0], fr[1])


@needs_native
def test_video_io_prefers_native(video):
    from vgqa_tpu.data import video_io

    frames = video_io.read_frames(video, [1, 2])
    assert frames.shape == (2, 48, 64, 3)


@needs_native
def test_scaled_decode_matches_resize(video):
    """size=(w,h) scales inside the decoder's swscale pass; pixels must be
    close to a separate decode + bilinear resize (methods differ slightly)."""
    import cv2

    from vgqa_tpu.data import video_io

    scaled = video_io.read_frames(video, [0, 7, 15], size=(32, 24))
    assert scaled.shape == (3, 24, 32, 3)
    raw = video_io.read_frames(video, [0, 7, 15])
    for i in range(3):
        ref = cv2.resize(raw[i], (32, 24), interpolation=cv2.INTER_LINEAR)
        err = np.abs(ref.astype(int) - scaled[i].astype(int)).mean()
        assert err < 16, err


@needs_native
def test_mt_decode_bit_identical(tmp_path_factory):
    """Thread-sliced decode (independent demux/codec contexts over
    contiguous frame ranges) must be bit-identical to single-thread, on a
    long-GOP video where slices start mid-GOP."""
    p = str(tmp_path_factory.mktemp("vidmt") / "long.mp4")
    write_synthetic_video(p, 120, (64, 48), seed=3)
    ids = list(range(0, 120, 3))
    single = videodec.read_frames(p, ids, threads=1)
    for k in (2, 4, 7):
        multi = videodec.read_frames(p, ids, threads=k)
        np.testing.assert_array_equal(single, multi)
    # scaled path too
    s1 = videodec.read_frames(p, ids, size=(32, 24), threads=1)
    s4 = videodec.read_frames(p, ids, size=(32, 24), threads=4)
    np.testing.assert_array_equal(s1, s4)


@needs_native
def test_sparse_sampling_skip_nonref(tmp_path_factory):
    """Sparse sampling (the 128-of-N serving pattern) engages the
    skip-nonref fast path; every emitted frame must still be exact."""
    p = str(tmp_path_factory.mktemp("vidsk") / "long.mp4")
    write_synthetic_video(p, 200, (64, 48), seed=5)
    ids = [0, 57, 123, 199]  # gaps >> kSkipMargin
    got = videodec.read_frames(p, ids, threads=1)
    dense = videodec.read_frames(p, list(range(200)), threads=1)
    for i, f in enumerate(ids):
        np.testing.assert_array_equal(got[i], dense[f])


@needs_native
def test_yuv_decode_matches_rgb(tmp_path_factory):
    """Scaled I420 output + host BT.601 conversion must match the decoder's
    own RGB path within colorspace/chroma-siting rounding (the serving path
    runs this exact conversion fused on device, inference/grounding.py)."""
    p = str(tmp_path_factory.mktemp("vidyuv") / "v.mp4")
    write_synthetic_video(p, 40, (64, 48), seed=7)
    ids = [0, 9, 21, 39]
    w, h = 32, 24
    rgb = videodec.read_frames(p, ids, size=(w, h), threads=1)
    flat, full_range = videodec.read_frames_yuv(p, ids, size=(w, h), threads=1)
    assert flat.shape == (4, (w * h * 3) // 2)
    assert full_range is False  # cv2-written mp4v is limited-range

    npx, nc = w * h, (w // 2) * (h // 2)
    y = flat[:, :npx].reshape(4, h, w).astype(np.float64)
    u = flat[:, npx:npx + nc].reshape(4, h // 2, w // 2).astype(np.float64)
    v = flat[:, npx + nc:].reshape(4, h // 2, w // 2).astype(np.float64)
    u = np.repeat(np.repeat(u, 2, 1), 2, 2) - 128.0
    v = np.repeat(np.repeat(v, 2, 1), 2, 2) - 128.0
    yl = 1.1643835616 * (y - 16.0)
    r = yl + 1.5960267857 * v
    g = yl - 0.3917622768 * u - 0.8129676339 * v
    b = yl + 2.0172321429 * u
    ours = np.clip(np.stack([r, g, b], -1), 0, 255)

    diff = np.abs(ours - rgb.astype(np.float64))
    assert diff.mean() < 4.0, diff.mean()
    assert np.percentile(diff, 99) < 40.0, np.percentile(diff, 99)


@needs_native
def test_yuv_mt_bit_identical(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vidyuvmt") / "v.mp4")
    write_synthetic_video(p, 90, (64, 48), seed=8)
    ids = list(range(0, 90, 2))
    f1, r1 = videodec.read_frames_yuv(p, ids, size=(32, 24), threads=1)
    f4, r4 = videodec.read_frames_yuv(p, ids, size=(32, 24), threads=4)
    assert r1 == r4
    np.testing.assert_array_equal(f1, f4)


@needs_native
def test_yuv_odd_size_rejected(video):
    with pytest.raises(ValueError):
        videodec.read_frames_yuv(video, [0], size=(33, 24))
