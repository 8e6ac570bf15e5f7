"""Offline greedy center-distance tracker (host side).

Rebuild of the reference PubTracker (tools/waymo_tracking/tracker.py:9-160 and
tools/nusc_tracking/pub_tracker.py — the same algorithm with per-dataset class
lists): per frame, predicted detections are matched greedily to live tracks by
center distance, gated by a per-class maximum-velocity error and class
identity; unmatched high-score detections open tracks; unmatched tracks
survive ``max_age`` frames.

CLI: ``python -m sparse2dense_tpu.tools.tracking <detections.pkl>
     [--dataset waymo|nusc] [--output tracking.pkl] [--max_age N]``
where detections.pkl maps ordered frame tokens to
{box3d_lidar, scores, label_preds} (the output of tools/test.py /
simple_inference.py).
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np

WAYMO_TRACKING_NAMES = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]
NUSC_TRACKING_NAMES = [
    "bicycle", "bus", "car", "motorcycle", "pedestrian", "trailer", "truck",
]
# per-class gating distance in meters (velocity error x time lag heuristic)
WAYMO_CLS_VELOCITY_ERROR = {"VEHICLE": 2.0, "PEDESTRIAN": 0.4, "CYCLIST": 1.2}
NUSC_CLS_VELOCITY_ERROR = {
    "car": 4, "truck": 4, "bus": 5.5, "trailer": 3, "pedestrian": 1,
    "motorcycle": 13, "bicycle": 3,
}


def greedy_assignment(dist):
    """(reference tracker.py:9-18): row-wise argmin with column knockout."""
    matched = []
    if dist.shape[1] == 0:
        return np.zeros((0, 2), np.int32)
    for i in range(dist.shape[0]):
        j = dist[i].argmin()
        if dist[i][j] < 1e16:
            dist[:, j] = 1e18
            matched.append([i, j])
    return np.array(matched, np.int32).reshape(-1, 2)


class PubTracker:
    def __init__(self, max_age=0, max_dist=None, score_thresh=0.1,
                 tracking_names=WAYMO_TRACKING_NAMES):
        self.max_age = max_age
        self.max_dist = max_dist or WAYMO_CLS_VELOCITY_ERROR
        self.score_thresh = score_thresh
        self.tracking_names = tracking_names
        self.reset()

    def reset(self):
        self.id_count = 0
        self.tracks = []

    def step_centertrack(self, results, time_lag):
        """results: list of dicts with detection_name, translation, velocity,
        score. Returns tracked dicts with tracking_id (reference :42-160)."""
        if len(results) == 0:
            self.tracks = []
            return []
        temp = []
        for det in results:
            if det["detection_name"] not in self.tracking_names:
                continue
            det["ct"] = np.array(det["translation"][:2])
            det["tracking"] = np.array(det.get("velocity", [0, 0])[:2]) * -1 * time_lag
            det["label_preds"] = self.tracking_names.index(det["detection_name"])
            temp.append(det)
        results = temp
        if not results:
            return []

        n, m = len(results), len(self.tracks)
        dets = np.array([d["ct"] + d["tracking"].astype(np.float32)
                         for d in results], np.float32)
        item_cat = np.array([d["label_preds"] for d in results], np.int32)
        track_cat = np.array([t["label_preds"] for t in self.tracks], np.int32)
        max_diff = np.array([self.max_dist[d["detection_name"]]
                             for d in results], np.float32)
        tracks = np.array([t["ct"] for t in self.tracks], np.float32)

        if m > 0:
            dist = np.sqrt(
                (((tracks.reshape(1, -1, 2) - dets.reshape(-1, 1, 2)) ** 2)
                 .sum(axis=2))
            )
            invalid = (dist > max_diff.reshape(n, 1)) | (
                item_cat.reshape(n, 1) != track_cat.reshape(1, m)
            )
            dist = dist + invalid * 1e18
            matched = greedy_assignment(dist.copy())
        else:
            matched = np.zeros((0, 2), np.int32)

        unmatched_dets = [d for d in range(n) if d not in matched[:, 0]]
        unmatched_tracks = [t for t in range(m) if t not in matched[:, 1]]

        ret = []
        for i, j in matched:
            track = results[i]
            track["tracking_id"] = self.tracks[j]["tracking_id"]
            track["age"] = 1
            track["active"] = self.tracks[j]["active"] + 1
            ret.append(track)
        for i in unmatched_dets:
            track = results[i]
            if track["score"] > self.score_thresh:
                self.id_count += 1
                track["tracking_id"] = self.id_count
                track["age"] = 1
                track["active"] = 1
                ret.append(track)
        for j in unmatched_tracks:
            track = self.tracks[j]
            if track["age"] < self.max_age:
                track["age"] += 1
                track["active"] = 0
                ct = track["ct"]
                if "tracking" in track:
                    offset = track["tracking"] * -1  # move forward
                    track["ct"] = ct + offset
                ret.append(track)
        self.tracks = ret
        return [t for t in ret if t["active"] > 0]


def detections_to_track_inputs(det, class_names):
    boxes = np.asarray(det["box3d_lidar"])
    scores = np.asarray(det["scores"])
    labels = np.asarray(det["label_preds"])
    out = []
    for i in range(len(scores)):
        vel = boxes[i, 6:8].tolist() if boxes.shape[-1] > 7 else [0.0, 0.0]
        out.append({
            "detection_name": class_names[int(labels[i])],
            "translation": boxes[i, :3].tolist(),
            "velocity": vel,
            "score": float(scores[i]),
            "box3d_lidar": boxes[i],
        })
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("detections")
    p.add_argument("--dataset", choices=["waymo", "nusc"], default="waymo")
    p.add_argument("--output", default="tracking.pkl")
    p.add_argument("--max_age", type=int, default=3)
    p.add_argument("--time_lag", type=float, default=0.1)
    args = p.parse_args()

    names = WAYMO_TRACKING_NAMES if args.dataset == "waymo" else NUSC_TRACKING_NAMES
    max_dist = (WAYMO_CLS_VELOCITY_ERROR if args.dataset == "waymo"
                else NUSC_CLS_VELOCITY_ERROR)
    tracker = PubTracker(max_age=args.max_age, max_dist=max_dist,
                         tracking_names=names)
    with open(args.detections, "rb") as f:
        detections = pickle.load(f)
    results = {}
    for token in detections:
        frame = detections_to_track_inputs(detections[token], names)
        results[token] = tracker.step_centertrack(frame, args.time_lag)
    with open(args.output, "wb") as f:
        pickle.dump(results, f)
    print(f"tracked {len(results)} frames -> {args.output}")


if __name__ == "__main__":
    main()
