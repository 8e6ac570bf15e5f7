"""Detection visualization (reference tools/visual.py — open3d 3D viewer).

This environment has no display / open3d, so the rebuild renders BEV (top
down) matplotlib figures: point cloud + gt boxes (green) + detections
(red, alpha by score).

CLI: python -m sparse2dense_tpu.tools.visual <frame.pkl> [--detections D.pkl]
     [--token T] [--out out.png]
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def _box_corners_bev(box):
    """(7,) box -> (4, 2) BEV corners."""
    cx, cy, _, w, l, _, yaw = box[[0, 1, 2, 3, 4, 5, -1]]
    c, s = np.cos(yaw), np.sin(yaw)
    local = np.array([[w, l], [-w, l], [-w, -l], [w, -l]]) / 2
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([cx, cy])


def plot_bev(points, gt_boxes=None, det_boxes=None, det_scores=None,
             out_path="bev.png", lim=80.0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.05, c="gray", alpha=0.5)
    for boxes, color, scores in (
        (gt_boxes, "limegreen", None),
        (det_boxes, "red", det_scores),
    ):
        if boxes is None:
            continue
        for i, b in enumerate(np.asarray(boxes)):
            cs = _box_corners_bev(b)
            cs = np.vstack([cs, cs[:1]])
            alpha = float(scores[i]) if scores is not None else 1.0
            ax.plot(cs[:, 0], cs[:, 1], color=color,
                    alpha=max(0.2, min(alpha, 1.0)), linewidth=0.8)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("frame", help="per-frame lidar pickle")
    p.add_argument("--detections", default=None)
    p.add_argument("--token", default=None)
    p.add_argument("--out", default="bev.png")
    args = p.parse_args()

    from ..data.pipelines.loading import get_obj, read_single_waymo

    points = read_single_waymo(get_obj(args.frame))
    det_boxes = det_scores = None
    if args.detections:
        with open(args.detections, "rb") as f:
            dets = pickle.load(f)
        key = args.token or next(iter(dets))
        det_boxes = dets[key]["box3d_lidar"]
        det_scores = dets[key]["scores"]
    out = plot_bev(points, det_boxes=det_boxes, det_scores=det_scores,
                   out_path=args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
