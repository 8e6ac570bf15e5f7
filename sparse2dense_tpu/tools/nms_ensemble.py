"""Offline detection ensembling + re-NMS (reference tools/nms_better.py).

Merges any number of saved detection pickles (token -> {box3d_lidar, scores,
label_preds}) and re-runs class-aware rotated NMS over the union — the
reference's post-hoc "better NMS"/ensemble experiment.

CLI: python -m sparse2dense_tpu.tools.nms_ensemble out.pkl in1.pkl in2.pkl ...
     [--iou 0.25] [--post_max 200]
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def ensemble_frame(dets, iou_threshold=0.25, post_max=200):
    import jax.numpy as jnp

    from ..ops.nms import rotated_nms

    boxes = np.concatenate([np.asarray(d["box3d_lidar"]) for d in dets], axis=0)
    scores = np.concatenate([np.asarray(d["scores"]) for d in dets], axis=0)
    labels = np.concatenate([np.asarray(d["label_preds"]) for d in dets], axis=0)
    if len(boxes) == 0:
        return {"box3d_lidar": boxes, "scores": scores, "label_preds": labels}
    keep_all = []
    for cls in np.unique(labels):
        sel = np.where(labels == cls)[0]
        bev = boxes[sel][:, [0, 1, 3, 4, boxes.shape[-1] - 1]]
        k = len(sel)
        idx = rotated_nms(
            jnp.asarray(bev, jnp.float32), jnp.asarray(scores[sel], jnp.float32),
            iou_threshold, min(post_max, k),
        )
        idx = np.asarray(idx)
        keep_all.append(sel[idx[idx >= 0]])
    keep = np.concatenate(keep_all) if keep_all else np.zeros((0,), int)
    order = np.argsort(-scores[keep])
    keep = keep[order][:post_max]
    return {
        "box3d_lidar": boxes[keep],
        "scores": scores[keep],
        "label_preds": labels[keep],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--iou", type=float, default=0.25)
    p.add_argument("--post_max", type=int, default=200)
    args = p.parse_args()

    all_dets = []
    for path in args.inputs:
        with open(path, "rb") as f:
            all_dets.append(pickle.load(f))
    tokens = set()
    for d in all_dets:
        tokens |= set(d)
    merged = {}
    for t in sorted(tokens):
        frame = [d[t] for d in all_dets if t in d]
        merged[t] = ensemble_frame(frame, args.iou, args.post_max)
    with open(args.output, "wb") as f:
        pickle.dump(merged, f)
    print(f"ensembled {len(args.inputs)} sources over {len(merged)} frames "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
