"""Greedy center-distance tracker (PubTracker) behavior."""
import numpy as np

from sparse2dense_tpu.tools.tracking import (
    WAYMO_CLS_VELOCITY_ERROR,
    WAYMO_TRACKING_NAMES,
    PubTracker,
    greedy_assignment,
)


def _det(x, y, name="VEHICLE", score=0.9, vel=(1.0, 0.0)):
    return {"detection_name": name, "translation": [x, y, 0.5],
            "velocity": list(vel), "score": score}


def test_greedy_assignment_knockout():
    dist = np.array([[0.1, 5.0], [0.2, 0.3]])
    m = greedy_assignment(dist.copy())
    assert m.tolist() == [[0, 0], [1, 1]]  # row 1 can't reuse column 0


def test_track_identity_maintained():
    tracker = PubTracker(max_age=2, max_dist=WAYMO_CLS_VELOCITY_ERROR,
                         tracking_names=WAYMO_TRACKING_NAMES)
    # object moving +1m/frame in x with matching velocity
    out1 = tracker.step_centertrack([_det(0.0, 0.0)], time_lag=1.0)
    tid = out1[0]["tracking_id"]
    out2 = tracker.step_centertrack([_det(1.0, 0.0)], time_lag=1.0)
    assert out2[0]["tracking_id"] == tid
    # a far-away new object opens a new track
    out3 = tracker.step_centertrack([_det(2.0, 0.0), _det(30.0, 30.0)],
                                    time_lag=1.0)
    ids = {t["tracking_id"] for t in out3}
    assert tid in ids and len(ids) == 2


def test_class_gating():
    tracker = PubTracker(max_age=2, max_dist=WAYMO_CLS_VELOCITY_ERROR,
                         tracking_names=WAYMO_TRACKING_NAMES)
    tracker.step_centertrack([_det(0.0, 0.0, "VEHICLE")], time_lag=1.0)
    # same position, different class -> new id
    out = tracker.step_centertrack([_det(1.0, 0.0, "PEDESTRIAN", vel=(0, 0))],
                                   time_lag=1.0)
    assert out[0]["tracking_id"] == 2


def test_max_age_expiry():
    tracker = PubTracker(max_age=1, max_dist=WAYMO_CLS_VELOCITY_ERROR,
                         tracking_names=WAYMO_TRACKING_NAMES)
    tracker.step_centertrack([_det(0.0, 0.0)], time_lag=1.0)
    tracker.step_centertrack([_det(50.0, 50.0)], time_lag=1.0)  # miss
    tracker.step_centertrack([_det(50.0, 50.0)], time_lag=1.0)  # expired
    out = tracker.step_centertrack([_det(1.0, 0.0)], time_lag=1.0)
    assert out[0]["tracking_id"] != 1 or len(tracker.tracks) <= 2
