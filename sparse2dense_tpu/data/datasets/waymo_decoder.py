"""Waymo Open Dataset tfrecord -> per-frame pickle decoder.

Rebuild of the reference converter/decoder (det3d/datasets/waymo/
waymo_converter.py:25-56, waymo_decoder.py:22-199) with the TensorFlow tensor
math replaced by pure NumPy, so the only optional dependency is the
``waymo_open_dataset`` protos (the reference additionally needs TF +
pyquaternion):

- :func:`read_tfrecord` — minimal TFRecord framing reader (length-delimited
  records; CRCs skipped), no TF required;
- :func:`compute_inclination`, :func:`range_image_to_points` — the
  range-image -> cartesian-point math of
  waymo_open_dataset.utils.range_image_utils, in NumPy (unit-tested on
  synthesized range images in tests/test_waymo_decoder.py);
- :func:`decode_frame` / :func:`decode_annos` — Frame-proto decoding, gated
  on the devkit protos;
- :func:`convert_tfrecord` — one .tfrecord -> lidar/anno pickles, the
  waymo_converter.convert equivalent.

Output pickle schema matches the reference exactly (keys consumed by
tools/create_data.fill_infos and data/pipelines/loading.py).
"""
from __future__ import annotations

import os
import pickle
import struct
import zlib
from typing import Iterator, Optional

import numpy as np

TYPE_LIST = ("UNKNOWN", "VEHICLE", "PEDESTRIAN", "SIGN", "CYCLIST")


# ------------------------------------------------------------- tfrecord io

def read_tfrecord(path: str) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file.

    Framing: uint64 length, uint32 masked-crc(length), payload,
    uint32 masked-crc(payload). CRCs are not verified (same trust model as
    TF's default reader options in the reference converter).
    """
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (length,) = struct.unpack("<Q", head)
            f.read(4)  # length crc
            payload = f.read(length)
            if len(payload) < length:
                raise IOError(f"truncated tfrecord {path}")
            f.read(4)  # payload crc
            yield payload


# --------------------------------------------------- range image geometry

def compute_inclination(inclination_min: float, inclination_max: float,
                        height: int) -> np.ndarray:
    """Beam inclinations for lasers without a calibrated list
    (range_image_utils.compute_inclination): bin centers between min..max."""
    diff = inclination_max - inclination_min
    return ((0.5 + np.arange(height)) / height * diff + inclination_min
            ).astype(np.float32)


def _rotmat_zyx(roll, pitch, yaw):
    """Rotation from Euler angles, extrinsic x-y-z order (the transform in
    range_image_top_pose rows: transform_utils.get_rotation_matrix)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    o = np.ones_like(roll)
    z = np.zeros_like(roll)
    rz = np.stack([np.stack([cy, -sy, z], -1),
                   np.stack([sy, cy, z], -1),
                   np.stack([z, z, o], -1)], -2)
    ry = np.stack([np.stack([cp, z, sp], -1),
                   np.stack([z, o, z], -1),
                   np.stack([-sp, z, cp], -1)], -2)
    rx = np.stack([np.stack([o, z, z], -1),
                   np.stack([z, cr, -sr], -1),
                   np.stack([z, sr, cr], -1)], -2)
    return rz @ ry @ rx


def range_image_to_points(range_image: np.ndarray, extrinsic: np.ndarray,
                          inclinations: np.ndarray,
                          pixel_pose: Optional[np.ndarray] = None,
                          frame_pose: Optional[np.ndarray] = None) -> np.ndarray:
    """(H, W) range image -> (H, W, 3) vehicle-frame cartesian points.

    NumPy port of range_image_utils.extract_point_cloud_from_range_image:
    column azimuths sweep from +pi to -pi corrected by the sensor yaw; row
    inclinations are ``inclinations`` reversed (top row = steepest beam);
    points go sensor-frame -> vehicle-frame via ``extrinsic``; for the TOP
    lidar, ``pixel_pose`` (H, W, 6) [roll,pitch,yaw,x,y,z] re-projects each
    pixel through its global pose and back through ``frame_pose``.
    """
    h, w = range_image.shape[:2]
    az_correction = float(np.arctan2(extrinsic[1, 0], extrinsic[0, 0]))
    ratios = (np.arange(w, 0, -1, dtype=np.float32) - 0.5) / w
    azimuth = (ratios * 2.0 - 1.0) * np.pi - az_correction  # (W,)
    incl = inclinations[::-1].astype(np.float32)  # top row first

    cos_az, sin_az = np.cos(azimuth)[None, :], np.sin(azimuth)[None, :]
    cos_in, sin_in = np.cos(incl)[:, None], np.sin(incl)[:, None]
    r = range_image.astype(np.float32)
    x = cos_in * cos_az * r
    y = cos_in * sin_az * r
    z = sin_in * r
    pts = np.stack([x, y, z], axis=-1)  # sensor frame (H, W, 3)

    # sensor -> vehicle
    rot, tr = extrinsic[:3, :3].astype(np.float32), extrinsic[:3, 3].astype(np.float32)
    pts = pts @ rot.T + tr
    if pixel_pose is not None:
        # vehicle(at pixel time) -> global -> vehicle(at frame time)
        prot = _rotmat_zyx(pixel_pose[..., 0], pixel_pose[..., 1],
                           pixel_pose[..., 2]).astype(np.float32)
        ptr = pixel_pose[..., 3:6].astype(np.float32)
        pts = np.einsum("hwij,hwj->hwi", prot, pts) + ptr
        inv = np.linalg.inv(frame_pose.astype(np.float64)).astype(np.float32)
        pts = pts @ inv[:3, :3].T + inv[:3, 3]
    return pts


def _parse_matrix(proto) -> np.ndarray:
    return np.array(proto.data, np.float32).reshape(proto.shape.dims)


def extract_points_from_range_image(laser, calibration, frame_pose_proto):
    """Both returns of one laser -> list of (N, 6) [x y z intensity elongation
    nlz] arrays (reference waymo_decoder.py:71-155, NumPy)."""
    from waymo_open_dataset import dataset_pb2

    if laser.name != calibration.name:
        raise ValueError("laser and calibration do not match")
    pixel_pose = frame_pose = None
    if laser.name == dataset_pb2.LaserName.TOP:
        frame_pose = np.reshape(np.array(frame_pose_proto.transform), (4, 4))
        pose_proto = dataset_pb2.MatrixFloat.FromString(
            zlib.decompress(laser.ri_return1.range_image_pose_compressed))
        pixel_pose = _parse_matrix(pose_proto)  # (H, W, 6)

    extrinsic = np.reshape(np.array(calibration.extrinsic.transform), (4, 4))
    out = []
    for ret in (laser.ri_return1, laser.ri_return2):
        ri_proto = dataset_pb2.MatrixFloat.FromString(
            zlib.decompress(ret.range_image_compressed))
        ri = _parse_matrix(ri_proto)  # (H, W, 4): range, intensity, elong, nlz
        if calibration.beam_inclinations:
            incl = np.asarray(calibration.beam_inclinations, np.float32)
        else:
            incl = compute_inclination(calibration.beam_inclination_min,
                                       calibration.beam_inclination_max,
                                       ri.shape[0])
        pts = range_image_to_points(ri[..., 0], extrinsic, incl,
                                    pixel_pose, frame_pose)
        mask = ri[..., 0] > 0
        out.append(np.concatenate(
            [pts[mask], ri[..., 1:4][mask]], axis=-1).astype(np.float32))
    return out


def extract_points(lasers, laser_calibrations, frame_pose):
    """All lasers -> {'points_xyz', 'points_feature'} dict (reference
    waymo_decoder.extract_points)."""
    key = lambda x: x.name  # noqa: E731
    xyz, feat = [], []
    for laser, calib in zip(sorted(lasers, key=key),
                            sorted(laser_calibrations, key=key)):
        pts = np.concatenate(
            extract_points_from_range_image(laser, calib, frame_pose), axis=0)
        xyz.append(pts[:, :3])
        feat.append(pts[:, 3:5])
    return {"points_xyz": np.concatenate(xyz, 0).astype(np.float32),
            "points_feature": np.concatenate(feat, 0).astype(np.float32)}


# ----------------------------------------------------------- frame decode

def _frame_name(frame):
    return "{}_{}_{}_{}".format(frame.context.name,
                                frame.context.stats.location,
                                frame.context.stats.time_of_day,
                                frame.timestamp_micros)


def decode_frame(frame, frame_id: int) -> dict:
    lidars = extract_points(frame.lasers, frame.context.laser_calibrations,
                            frame.pose)
    return {"scene_name": frame.context.name, "frame_name": _frame_name(frame),
            "frame_id": frame_id, "lidars": lidars}


def _global_vel_to_ref(vel, global_from_ref_rotation):
    """Global-frame (vx, vy) -> reference(vehicle)-frame: rotate by the
    inverse rotation (the reference routes this through pyquaternion for
    normalization; a direct transpose of the orthonormal block is the same
    map)."""
    v = np.array([vel[0], vel[1], 0.0])
    ref = np.asarray(global_from_ref_rotation).T @ v
    return [float(ref[0]), float(ref[1]), 0.0]


def decode_annos(frame, frame_id: int) -> dict:
    veh_to_global = np.array(frame.pose.transform)
    ref_pose = np.reshape(veh_to_global, (4, 4))
    rot = ref_pose[:3, :3]
    objects = []
    for object_id, label in enumerate(frame.laser_labels):
        box = label.box
        npts = label.num_lidar_points_in_box
        if npts <= 0:
            difficulty = 999
        elif label.detection_difficulty_level == 0:
            difficulty = 1 if npts >= 5 else 2
        else:
            difficulty = label.detection_difficulty_level
        vel = _global_vel_to_ref(
            [label.metadata.speed_x, label.metadata.speed_y], rot)
        objects.append({
            "id": object_id,
            "name": label.id,
            "label": label.type,
            "box": np.array([box.center_x, box.center_y, box.center_z,
                             box.length, box.width, box.height,
                             vel[0], vel[1], box.heading], np.float32),
            "num_points": npts,
            "detection_difficulty_level": label.detection_difficulty_level,
            "combined_difficulty_level": difficulty,
            "global_speed": np.array(
                [label.metadata.speed_x, label.metadata.speed_y], np.float32),
            "global_accel": np.array(
                [label.metadata.accel_x, label.metadata.accel_y], np.float32),
        })
    return {"scene_name": frame.context.name, "frame_name": _frame_name(frame),
            "frame_id": frame_id, "veh_to_global": veh_to_global,
            "objects": objects}


def convert_tfrecord(tfrecord_path: str, lidar_dir: str, anno_dir: str,
                     seq_idx: int) -> int:
    """One .tfrecord -> seq_{i}_frame_{j}.pkl lidar/anno pairs (reference
    waymo_converter.convert). Returns the frame count."""
    from waymo_open_dataset import dataset_pb2

    os.makedirs(lidar_dir, exist_ok=True)
    os.makedirs(anno_dir, exist_ok=True)
    n = 0
    for frame_id, payload in enumerate(read_tfrecord(tfrecord_path)):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(payload)
        name = f"seq_{seq_idx}_frame_{frame_id}.pkl"
        with open(os.path.join(lidar_dir, name), "wb") as f:
            pickle.dump(decode_frame(frame, frame_id), f)
        with open(os.path.join(anno_dir, name), "wb") as f:
            pickle.dump(decode_annos(frame, frame_id), f)
        n += 1
    return n
