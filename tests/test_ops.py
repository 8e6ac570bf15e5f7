"""Rotated IoU / NMS / gaussian-target unit tests against analytic truths."""
import numpy as np
import jax.numpy as jnp

from sparse2dense_tpu.ops.rotated_iou import rotated_iou_matrix, box_to_corners
from sparse2dense_tpu.ops.nms import rotated_nms, circle_nms
from sparse2dense_tpu.core.center_utils import gaussian_radius, draw_gaussian


def test_iou_identical():
    b = jnp.array([[0.0, 0.0, 2.0, 4.0, 0.3]])
    iou = rotated_iou_matrix(b, b)
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)


def test_iou_axis_aligned():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])  # overlap 1x2=2, union 8-2=6
    iou = rotated_iou_matrix(a, b)
    np.testing.assert_allclose(iou, [[2.0 / 6.0]], atol=1e-5)


def test_iou_disjoint_and_rotated():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[10.0, 10.0, 2.0, 2.0, 1.0]])
    np.testing.assert_allclose(rotated_iou_matrix(a, b), [[0.0]], atol=1e-6)
    # 45-degree square over same center: intersection is a regular octagon
    c = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    inter = 8 * (np.sqrt(2) - 1)  # area of octagon from unit square pair
    expect = inter / (8 - inter)
    np.testing.assert_allclose(rotated_iou_matrix(a, c), [[expect]], atol=1e-4)


def test_iou_full_rotation_invariance():
    a = jnp.array([[3.0, -2.0, 2.0, 5.0, 0.7]])
    b = jnp.array([[3.0, -2.0, 2.0, 5.0, 0.7 + np.pi]])  # same rect, flipped
    np.testing.assert_allclose(rotated_iou_matrix(a, b), [[1.0]], atol=1e-4)


def test_corners_ccw():
    c = np.asarray(box_to_corners(jnp.array([1.0, 2.0, 2.0, 4.0, 0.0])))
    # shoelace positive => CCW
    area = 0.5 * np.sum(c[:, 0] * np.roll(c[:, 1], -1) - c[:, 1] * np.roll(c[:, 0], -1))
    np.testing.assert_allclose(area, 8.0, atol=1e-5)


def test_rotated_nms_basic():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],   # heavy overlap with 0
        [5.0, 5.0, 2.0, 2.0, 0.0],   # far away
        [0.0, 0.0, 0.0, 0.0, 0.0],   # padding
    ])
    scores = jnp.array([0.9, 0.8, 0.7, -jnp.inf])
    sel = rotated_nms(boxes, scores, iou_threshold=0.5, post_max_size=4)
    assert list(np.asarray(sel)) == [0, 2, -1, -1]


def test_circle_nms_basic():
    centers = jnp.array([[0.0, 0.0], [0.5, 0.0], [3.0, 0.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    sel = circle_nms(centers, scores, min_radius=1.0, post_max_size=3)
    assert list(np.asarray(sel)) == [0, 2, -1]


def test_gaussian_radius_positive():
    r = gaussian_radius((10.0, 6.0), min_overlap=0.1)
    assert r > 0
    # shifting by r must be a weaker constraint for higher overlap
    assert gaussian_radius((10.0, 6.0), 0.7) < gaussian_radius((10.0, 6.0), 0.1)


def test_draw_gaussian_center_and_clip():
    hm = np.zeros((10, 10), np.float32)
    draw_gaussian(hm, (3.4, 7.8), radius=2)
    assert hm[7, 3] == 1.0  # peak at int center (y, x)
    hm2 = np.zeros((10, 10), np.float32)
    draw_gaussian(hm2, (0, 0), radius=3)  # clipped at the corner, no crash
    assert hm2[0, 0] == 1.0
    assert hm2.max() == 1.0
