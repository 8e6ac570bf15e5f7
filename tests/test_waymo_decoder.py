"""Waymo range-image decoder math, tested without the devkit.

The proto plumbing (decode_frame / convert_tfrecord) needs waymo_open_dataset
and is exercised only where installed; the geometry — the part the reference
delegates to TF's range_image_utils (waymo_decoder.py:71-155) — is pure NumPy
here and is pinned by synthesizing range images from KNOWN points and
requiring exact round-trips.
"""
import struct

import numpy as np
import pytest

from sparse2dense_tpu.data.datasets.waymo_decoder import (
    _rotmat_zyx,
    compute_inclination,
    range_image_to_points,
    read_tfrecord,
)


def _synth_range_image(points_sensor, h, w, inclinations, az_correction=0.0):
    """Place known sensor-frame points into the (H, W) range image grid."""
    r = np.linalg.norm(points_sensor, axis=-1)
    incl = np.arcsin(points_sensor[:, 2] / r)
    az = np.arctan2(points_sensor[:, 1], points_sensor[:, 0])
    # row: inclinations reversed top-first
    rows = (len(inclinations) - 1) - np.argmin(
        np.abs(incl[:, None] - inclinations[None, :]), axis=1)
    # column from azimuth: az = ((w - col - 0.5)/w * 2 - 1) * pi - az_corr
    cols = np.round(w - 0.5 - (az + az_correction + np.pi) * w / (2 * np.pi)
                    ).astype(int) % w
    ri = np.zeros((h, w), np.float32)
    ri[rows, cols] = r
    return ri, rows, cols


def test_inclination_bins():
    inc = compute_inclination(-0.5, 0.3, 8)
    assert inc.shape == (8,)
    np.testing.assert_allclose(inc[0], -0.5 + 0.5 / 8 * 0.8, rtol=1e-6)
    np.testing.assert_allclose(inc[-1], 0.3 - 0.5 / 8 * 0.8, rtol=1e-6)


def test_range_image_round_trip_identity_extrinsic():
    rng = np.random.RandomState(0)
    h, w = 64, 2650
    inclinations = compute_inclination(-0.3, 0.2, h)
    # points generated exactly on beam directions so the round trip is exact
    rows = rng.randint(0, h, 50)
    cols = rng.randint(0, w, 50)
    r = rng.uniform(5, 70, 50).astype(np.float32)
    incl = inclinations[::-1][rows]
    az = ((w - cols - 0.5) / w * 2 - 1) * np.pi
    az = (np.pi - (cols + 0.5) * 2 * np.pi / w)
    pts = np.stack([np.cos(incl) * np.cos(az) * r,
                    np.cos(incl) * np.sin(az) * r,
                    np.sin(incl) * r], -1)
    ri = np.zeros((h, w), np.float32)
    ri[rows, cols] = r
    out = range_image_to_points(ri, np.eye(4), inclinations)
    got = out[rows, cols]
    np.testing.assert_allclose(got, pts, atol=1e-3)


def test_range_image_extrinsic_transform():
    """A yawed+translated sensor: decoded points must land in vehicle frame."""
    h, w = 32, 1024
    inclinations = compute_inclination(-0.2, 0.2, h)
    yaw = 0.7
    extr = np.eye(4)
    extr[:3, :3] = _rotmat_zyx(np.float64(0), np.float64(0), np.float64(yaw))
    extr[:3, 3] = [1.0, -2.0, 0.5]

    row, col = 10, 321
    r = 25.0
    incl = inclinations[::-1][row]
    az_corr = np.arctan2(extr[1, 0], extr[0, 0])
    az = ((w - col - 0.5) / w * 2 - 1) * np.pi - az_corr
    p_sensor = np.array([np.cos(incl) * np.cos(az) * r,
                         np.cos(incl) * np.sin(az) * r,
                         np.sin(incl) * r])
    want = extr[:3, :3] @ p_sensor + extr[:3, 3]

    ri = np.zeros((h, w), np.float32)
    ri[row, col] = r
    out = range_image_to_points(ri, extr, inclinations)
    np.testing.assert_allclose(out[row, col], want, atol=1e-3)


def test_range_image_pixel_pose_roundtrip():
    """pixel_pose == frame_pose must be a no-op (global == vehicle frame)."""
    h, w = 16, 256
    inclinations = compute_inclination(-0.2, 0.2, h)
    rng = np.random.RandomState(1)
    ri = (rng.rand(h, w) > 0.9).astype(np.float32) * rng.uniform(5, 50, (h, w))
    frame_pose = np.eye(4)
    frame_pose[:3, :3] = _rotmat_zyx(np.float64(0.1), np.float64(-0.05),
                                     np.float64(0.4))
    frame_pose[:3, 3] = [100.0, -50.0, 3.0]
    rpy = np.zeros((h, w, 6), np.float32)
    rpy[..., 0], rpy[..., 1], rpy[..., 2] = 0.1, -0.05, 0.4
    rpy[..., 3:] = frame_pose[:3, 3]

    base = range_image_to_points(ri, np.eye(4), inclinations)
    out = range_image_to_points(ri, np.eye(4), inclinations,
                                pixel_pose=rpy, frame_pose=frame_pose)
    np.testing.assert_allclose(out, base, atol=1e-3)


def test_read_tfrecord_framing(tmp_path):
    payloads = [b"hello", b"", b"x" * 1000]
    path = str(tmp_path / "t.tfrecord")
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)))
            f.write(b"\x00" * 4)
            f.write(p)
            f.write(b"\x00" * 4)
    assert list(read_tfrecord(path)) == payloads


def test_decode_frame_devkit_gated():
    pytest.importorskip("waymo_open_dataset")
