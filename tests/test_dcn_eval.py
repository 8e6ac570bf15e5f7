"""DCN (gather-based deformable conv) + local mAP evaluator."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sparse2dense_tpu.models.dcn import DeformConv
from sparse2dense_tpu.core.eval import evaluate_detections


def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets DCN must reduce to a plain 3x3 convolution."""
    b, h, w, cin, cout = 1, 6, 7, 4, 5
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    offset = jnp.zeros((b, h, w, 4 * 9 * 2))
    m = DeformConv(cout, 3, 4)
    v = m.init(jax.random.PRNGKey(0), x, offset)
    out = m.apply(v, x, offset)

    wk = np.asarray(v["params"]["kernel"]).reshape(3, 3, cin, cout)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wk), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_deform_conv_offset_shifts_sampling(rng):
    """A +1 x-offset on every tap equals sampling the x-shifted image."""
    b, h, w, cin, cout = 1, 6, 8, 3, 2
    x = rng.randn(b, h, w, cin).astype(np.float32)
    m = DeformConv(cout, 3, 1)
    off0 = jnp.zeros((b, h, w, 9 * 2))
    v = m.init(jax.random.PRNGKey(1), jnp.asarray(x), off0)
    # offset layout (..., tap, (dy, dx)): set dx=1
    off1 = jnp.tile(jnp.asarray([0.0, 1.0]), (b, h, w, 9)).reshape(b, h, w, 18)
    out_shifted = m.apply(v, jnp.asarray(x), off1)
    x_roll = np.zeros_like(x)
    x_roll[:, :, :-1] = x[:, :, 1:]  # shift left; boundary differs (zeros)
    out_ref = m.apply(v, jnp.asarray(x_roll), off0)
    np.testing.assert_allclose(
        np.asarray(out_shifted)[:, 1:-1, 2:-2],
        np.asarray(out_ref)[:, 1:-1, 2:-2], rtol=1e-4, atol=1e-4,
    )


def test_map_perfect_and_empty():
    gt_boxes = np.array([[0, 0, 0, 2, 4, 2, 0.0], [5, 5, 0, 1, 1, 2, 0.5]],
                        np.float32)
    gts = {"f0": {"gt_boxes": gt_boxes, "gt_classes": np.array([1, 2])}}
    dets = {"f0": {
        "box3d_lidar": gt_boxes.copy(),
        "label_preds": np.array([0, 1]),
        "scores": np.array([0.9, 0.8]),
    }}
    res = evaluate_detections(gts, dets, ["VEHICLE", "PEDESTRIAN"])
    assert res["VEHICLE"]["ap"] == pytest.approx(1.0)
    assert res["PEDESTRIAN"]["ap"] == pytest.approx(1.0)
    assert res["mAP"] == pytest.approx(1.0)

    res0 = evaluate_detections(gts, {"f0": {}}, ["VEHICLE", "PEDESTRIAN"])
    assert res0["mAP"] == 0.0


def test_map_false_positive_penalized():
    gt_boxes = np.array([[0, 0, 0, 2, 4, 2, 0.0]], np.float32)
    gts = {"f0": {"gt_boxes": gt_boxes, "gt_classes": np.array([1])}}
    dets = {"f0": {
        "box3d_lidar": np.array([[0, 0, 0, 2, 4, 2, 0.0],
                                 [20, 20, 0, 2, 4, 2, 0.0]], np.float32),
        "label_preds": np.array([0, 0]),
        "scores": np.array([0.5, 0.9]),  # FP ranked first
    }}
    res = evaluate_detections(gts, dets, ["VEHICLE"])
    assert 0.0 < res["VEHICLE"]["ap"] < 1.0
