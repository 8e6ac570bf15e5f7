"""Two-stage detector: BEV extraction, proposal sampling, RoIHead."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.models.second_stage.bev import bilinear_interpolate, box_centers
from sparse2dense_tpu.models.roi_heads.roi_head import (
    canonical_targets,
    generate_predicted_boxes,
    subsample_rois,
)
from sparse2dense_tpu.ops.iou3d import boxes_iou3d
from sparse2dense_tpu.training.synthetic import make_batch

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "two_stage_tiny.py")


def test_iou3d_identity_and_disjoint():
    a = jnp.asarray([[0, 0, 0, 2, 4, 2, 0.3], [10, 10, 0, 1, 1, 1, 0.0]], jnp.float32)
    iou = np.asarray(boxes_iou3d(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    assert iou[0, 1] < 1e-6


def test_bilinear_interpolate_exact():
    im = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    # interior integer coordinates hit grid values exactly (at the clamped
    # last row/col the reference's weight formula returns 0 — same here)
    v = bilinear_interpolate(im, jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(v)[:, 0], [1.0, 6.0])
    # midpoint averages
    v = bilinear_interpolate(im, jnp.asarray([0.5]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(v)[0, 0], 0.5)


def test_box_centers_five_point():
    boxes = jnp.asarray([[[1.0, 2.0, 0.5, 2.0, 4.0, 1.0, 0.0]]])
    pts = np.asarray(box_centers(boxes, 5))[0]
    assert pts.shape == (5, 3)
    np.testing.assert_allclose(pts[0], [1, 2, 0.5])
    np.testing.assert_allclose(pts[1], [2, 2, 0.5], atol=1e-6)   # +x edge
    np.testing.assert_allclose(pts[3], [1, 4, 0.5], atol=1e-6)   # +y edge


def test_canonical_targets_identity_roi():
    rois = jnp.asarray([[[1.0, 2.0, 0.5, 2.0, 4.0, 1.0, 0.3]]])
    ct = np.asarray(canonical_targets(rois, rois))[0, 0]
    np.testing.assert_allclose(ct[:3], 0.0, atol=1e-6)
    np.testing.assert_allclose(ct[3:6], [2, 4, 1], atol=1e-6)
    np.testing.assert_allclose(ct[6], 0.0, atol=1e-6)
    # round-trip: predicted deltas of zero recover the roi
    back = np.asarray(generate_predicted_boxes(rois, jnp.zeros((1, 1, 7))))[0, 0]
    np.testing.assert_allclose(back, np.asarray(rois)[0, 0], atol=1e-6)


def test_subsample_counts():
    cfg = dict(ROI_PER_IMAGE=8, FG_RATIO=0.5, REG_FG_THRESH=0.55,
               CLS_FG_THRESH=0.75, CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
               HARD_BG_RATIO=0.8)
    ious = jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.3, 0.2, 0.05, 0.02, 0.6, 0.01])
    valid = jnp.ones(10, bool)
    idx = np.asarray(subsample_rois(ious, valid, cfg, jax.random.PRNGKey(0)))
    assert idx.shape == (8,)
    sel = np.asarray(ious)[idx]
    # 4 fg (>=0.55), 4 bg
    assert (sel >= 0.55).sum() == 4
    assert (sel < 0.55).sum() == 4


@pytest.fixture(scope="module")
def setup():
    cfg = Config.fromfile(CFG)
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.voxel_generator)
    batch = make_batch(cfg, batch_size=2, max_voxels=256, n_points=500, n_obj=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "proposal": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch, train=True,
    )
    return cfg, model, batch, variables


def test_two_stage_train_and_loss(setup):
    cfg, model, batch, variables = setup
    out, _ = model.apply(
        variables, batch, train=True, mutable=["batch_stats"],
        rngs={"proposal": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert out["rcnn_cls"].shape == (2, 16, 1)
    assert out["rcnn_reg"].shape == (2, 16, 7)
    total, logs = model.loss(out, batch)
    assert np.isfinite(float(total))
    assert "rcnn_loss_cls" in logs and "rcnn_loss_reg" in logs


def test_two_stage_eval_predict(setup):
    cfg, model, batch, variables = setup
    out = model.apply(variables, batch, train=False)
    assert out["rcnn_cls"].shape == (2, 16, 1)
    det = model.predict(out)
    assert det["box3d_lidar"].shape == (2, 16, 7)
    assert det["scores"].shape == (2, 16)
    s = np.asarray(det["scores"])
    assert ((s >= 0) & (s <= 1)).all()
