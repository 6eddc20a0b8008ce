import jax.numpy as jnp
import numpy as np

from vgqa_tpu.utils import boxes as B


def test_cxcywh_xyxy_roundtrip():
    b = jnp.array([[0.5, 0.5, 0.2, 0.4], [0.3, 0.7, 0.1, 0.1]])
    xyxy = B.box_cxcywh_to_xyxy(b)
    np.testing.assert_allclose(
        np.asarray(xyxy), [[0.4, 0.3, 0.6, 0.7], [0.25, 0.65, 0.35, 0.75]], atol=1e-6
    )
    back = B.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-6)


def test_paired_iou_hand_values():
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b2 = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    iou, union = B.paired_box_iou(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), [1.0 / 7.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(union), [7.0], atol=1e-6)


def test_paired_giou_identical_and_disjoint():
    b = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(B.paired_generalized_box_iou(b, b)), [1.0], atol=1e-6
    )
    far = jnp.array([[2.0, 2.0, 3.0, 3.0]])
    # IoU 0; enclosing box area 9, union 2 -> giou = -(9-2)/9
    np.testing.assert_allclose(
        np.asarray(B.paired_generalized_box_iou(b, far)), [-7.0 / 9.0], atol=1e-6
    )


def test_paired_matches_matrix_diag():
    rng = np.random.RandomState(0)
    raw = rng.rand(8, 4).astype(np.float32)
    b1 = np.concatenate([raw[:, :2], raw[:, :2] + raw[:, 2:] + 0.05], axis=-1)
    raw2 = rng.rand(8, 4).astype(np.float32)
    b2 = np.concatenate([raw2[:, :2], raw2[:, :2] + raw2[:, 2:] + 0.05], axis=-1)
    m = B.box_iou_matrix(jnp.asarray(b1), jnp.asarray(b2))
    p, _ = B.paired_box_iou(jnp.asarray(b1), jnp.asarray(b2))
    np.testing.assert_allclose(np.diag(np.asarray(m)), np.asarray(p), atol=1e-5)


def test_np_box_iou_matches_jax():
    rng = np.random.RandomState(1)
    b1 = np.abs(rng.rand(4, 4)).astype(np.float32)
    b1[:, 2:] += b1[:, :2] + 0.1
    b2 = np.abs(rng.rand(5, 4)).astype(np.float32)
    b2[:, 2:] += b2[:, :2] + 0.1
    np.testing.assert_allclose(
        B.np_box_iou(b1, b2),
        np.asarray(B.box_iou_matrix(jnp.asarray(b1), jnp.asarray(b2))),
        atol=1e-5,
    )


def test_video_batch_padding_and_subsample():
    from vgqa_tpu.utils import VideoBatch

    clips = [np.ones((6, 8, 10, 3), np.float32), np.ones((4, 6, 6, 3), np.float32)]
    vb = VideoBatch.from_clip_list(clips, pad_t=8)
    assert vb.frames.shape == (2, 8, 8, 10, 3)
    assert bool(vb.time_mask[0, 5]) and not bool(vb.time_mask[0, 6])
    assert bool(vb.time_mask[1, 3]) and not bool(vb.time_mask[1, 4])
    assert bool(vb.pixel_mask[1, 5, 5]) and not bool(vb.pixel_mask[1, 5, 7])

    even = vb.subsample(2, 0)
    odd = vb.subsample(2, 1)
    assert even.frames.shape == (2, 4, 8, 10, 3)
    assert odd.frames.shape == (2, 4, 8, 10, 3)
    assert int(even.time_mask[1].sum()) == 2
