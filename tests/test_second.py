"""SECOND path: anchors, box coder, target assignment, MultiGroupHead."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.core import box_np_ops
from sparse2dense_tpu.core.box_coder import GroundBox3dCoder
from sparse2dense_tpu.core.anchors import build_target_assigner
from sparse2dense_tpu.training.synthetic import make_batch

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "second_tiny.py")


def test_box_coder_roundtrip(rng):
    coder = GroundBox3dCoder()
    anchors = np.abs(rng.randn(20, 7).astype(np.float32)) + 0.5
    boxes = anchors * rng.uniform(0.8, 1.2, (20, 7)).astype(np.float32)
    enc = coder.encode(boxes, anchors)
    dec = coder.decode(enc, anchors)
    np.testing.assert_allclose(dec, boxes, rtol=1e-4, atol=1e-4)
    # jnp decode path agrees with numpy
    dec_j = coder.decode(jnp.asarray(enc), jnp.asarray(anchors), xp=jnp)
    np.testing.assert_allclose(np.asarray(dec_j), dec, rtol=1e-5, atol=1e-5)


def test_nearest_iou_identical_boxes():
    boxes = np.array([[0, 0, 2, 4, 0.0], [5, 5, 1, 1, 1.57]], np.float32)
    sim = box_np_ops.nearest_iou_similarity(boxes, boxes)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-6)
    assert sim[0, 1] == 0.0


def test_anchor_generation_counts():
    cfg = Config.fromfile(CFG)
    ta = build_target_assigner(cfg.target_assigner, cfg.box_coder)
    d = ta.generate_anchors_dict([1, 4, 4])
    assert list(d.keys()) == ["VEHICLE", "PEDESTRIAN", "CYCLIST"]
    for v in d.values():
        assert v["anchors"].shape == (1, 4, 4, 2, 7)
    full = ta.generate_anchors([1, 4, 4])
    assert full["anchors"].shape == (1, 4, 4, 6, 7)


def test_assignment_labels_positive_on_gt():
    cfg = Config.fromfile(CFG)
    ta = build_target_assigner(cfg.target_assigner, cfg.box_coder)
    d = ta.generate_anchors_dict([1, 4, 4])
    # a vehicle gt sitting exactly on an anchor
    anchors = d["VEHICLE"]["anchors"].reshape(-1, 7)
    gt = anchors[5:6].copy()
    gt[0, 2] = 1.0  # z center
    td = ta.assign_v2(
        d, gt, gt_classes=np.array([1], np.int32),
        gt_names=np.array(["VEHICLE"]),
    )
    assert (td["labels"] == 1).sum() >= 1
    pos = td["labels"] > 0
    assert np.isfinite(td["bbox_targets"][pos]).all()
    assert (td["reg_weights" if "reg_weights" in td else "bbox_outside_weights"][pos] == 1).all()


@pytest.fixture(scope="module")
def setup():
    cfg = Config.fromfile(CFG)
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.voxel_generator)
    batch = make_batch(cfg, batch_size=2, max_voxels=192, n_points=400, n_obj=3)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, batch, variables


def test_second_forward_loss_predict(setup):
    cfg, model, batch, variables = setup
    preds = model.apply(variables, batch, train=False)
    assert preds[0]["box_preds"].shape == (2, 4, 4, 6 * 7)
    assert preds[0]["cls_preds"].shape == (2, 4, 4, 6 * 3)
    assert preds[0]["dir_cls_preds"].shape == (2, 4, 4, 12)

    total, logs = model.loss(preds, batch)
    assert np.isfinite(float(total))
    assert "dir_loss_0" in logs

    out = model.predict(preds, cfg.test_cfg, example=batch)
    assert out["box3d_lidar"].shape == (2, 16, 7)
    assert out["valid"].dtype == bool


def test_second_grads(setup):
    cfg, model, batch, variables = setup

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
        )
        return model.loss(preds, batch)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in flat))) > 0
