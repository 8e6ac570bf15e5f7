"""Tracker hyperparameter grid search (reference tools/waymo_tracking/
line_search.py): sweep per-class gating distances and max_age over saved
detections, scoring with the local mAP-style ID-switch-free proxy (number of
stable tracks vs fragmentations) when no devkit is present.

CLI: python -m sparse2dense_tpu.tools.line_search <detections.pkl>
     [--dataset waymo] [--out results.json]
"""
from __future__ import annotations

import argparse
import itertools
import json
import pickle

import numpy as np

from .tracking import (
    NUSC_CLS_VELOCITY_ERROR,
    NUSC_TRACKING_NAMES,
    WAYMO_CLS_VELOCITY_ERROR,
    WAYMO_TRACKING_NAMES,
    PubTracker,
    detections_to_track_inputs,
)


def run_tracker(detections, names, max_dist, max_age, time_lag=0.1):
    tracker = PubTracker(max_age=max_age, max_dist=max_dist,
                         tracking_names=names)
    n_tracks, n_obs = 0, 0
    seen = set()
    for token in detections:
        frame = detections_to_track_inputs(detections[token], names)
        out = tracker.step_centertrack(frame, time_lag)
        for t in out:
            n_obs += 1
            if t["tracking_id"] not in seen:
                seen.add(t["tracking_id"])
                n_tracks += 1
    # proxy score: observations per track (longer, stabler tracks are better)
    return n_obs / max(n_tracks, 1), n_tracks, n_obs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("detections")
    p.add_argument("--dataset", choices=["waymo", "nusc"], default="waymo")
    p.add_argument("--out", default="line_search.json")
    args = p.parse_args()

    names = WAYMO_TRACKING_NAMES if args.dataset == "waymo" else NUSC_TRACKING_NAMES
    base = (WAYMO_CLS_VELOCITY_ERROR if args.dataset == "waymo"
            else NUSC_CLS_VELOCITY_ERROR)
    with open(args.detections, "rb") as f:
        detections = pickle.load(f)

    results = []
    for scale, max_age in itertools.product((0.5, 0.75, 1.0, 1.5, 2.0),
                                            (1, 2, 3)):
        max_dist = {k: v * scale for k, v in base.items()}
        score, n_tracks, n_obs = run_tracker(detections, names, max_dist, max_age)
        results.append({"scale": scale, "max_age": max_age,
                        "track_length": score, "tracks": n_tracks,
                        "observations": n_obs})
        print(f"scale={scale} max_age={max_age}: "
              f"{n_tracks} tracks, mean length {score:.2f}")
    best = max(results, key=lambda r: r["track_length"])
    print(f"best: {best}")
    with open(args.out, "w") as f:
        json.dump({"results": results, "best": best}, f, indent=2)


if __name__ == "__main__":
    main()
