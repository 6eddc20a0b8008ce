import numpy as np
import pytest

from vgqa_tpu.utils.boxlist import FLIP_LEFT_RIGHT, BoxList


def test_convert_roundtrip():
    b = BoxList([[0, 0, 10, 10], [2, 2, 6, 8]], (20, 20))
    c = b.convert("xywh")
    np.testing.assert_allclose(c.bbox[0], [5, 5, 10, 10])
    np.testing.assert_allclose(c.convert("xyxy").bbox, b.bbox)


def test_resize_uniform_and_aspect():
    b = BoxList([[0, 0, 10, 10]], (10, 10))
    np.testing.assert_allclose(b.resize((5, 5)).bbox, [[0, 0, 5, 5]])
    r = b.resize((20, 10))
    np.testing.assert_allclose(r.bbox, [[0, 0, 20, 10]])


def test_transpose_flip():
    b = BoxList([[1, 2, 4, 6]], (10, 10))
    f = b.transpose(FLIP_LEFT_RIGHT)
    np.testing.assert_allclose(f.bbox, [[6, 2, 9, 6]])


def test_crop_and_validity():
    b = BoxList([[2, 2, 8, 8]], (10, 10))
    c = b.crop((1, 1, 5, 5))  # top, left, h, w
    np.testing.assert_allclose(c.bbox, [[1, 1, 5, 5]])
    assert b.check_crop_valid((1, 1, 5, 5))
    assert not b.check_crop_valid((9, 9, 1, 1))


def test_normalize_to_cxcywh():
    b = BoxList([[0, 0, 10, 20]], (20, 40))
    n = b.normalize()
    assert n.mode == "xywh"
    np.testing.assert_allclose(n.bbox, [[0.25, 0.25, 0.5, 0.5]])


def test_area_and_indexing():
    b = BoxList([[0, 0, 2, 3], [0, 0, 4, 4]], (10, 10))
    np.testing.assert_allclose(b.area(), [6, 16])
    assert len(b[0:1]) == 1


def test_invalid_shapes_rejected():
    with pytest.raises(ValueError):
        BoxList([1, 2, 3, 4], (10, 10))
    with pytest.raises(ValueError):
        BoxList([[1, 2, 3]], (10, 10))
