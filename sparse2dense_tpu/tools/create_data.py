"""Data preparation CLI (reference tools/create_data.py:11-31 +
det3d/datasets/waymo/waymo_common.py:196-340 + datasets/utils/
create_gt_database.py:16).

Subcommands:
- waymo_data_prep  --root_path D [--split train] [--nsweeps 1] [--gt_database]
  builds infos_<split>_XXsweeps_filter_zero_gt.pkl from decoded per-frame
  pickles (the tfrecord->pkl decoding itself needs the Waymo devkit + TF; see
  waymo_decoder notes below) and optionally the GT-AUG database.
- nuscenes_data_prep is delegated to the nuscenes devkit when available.
"""
from __future__ import annotations

import argparse
import os
import pickle
from functools import reduce

import numpy as np

TYPE_LIST = ["UNKNOWN", "VEHICLE", "PEDESTRIAN", "SIGN", "CYCLIST"]


def get_obj(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def veh_pos_to_transform(veh_pos):
    rot = veh_pos[:3, :3]
    tran = veh_pos[:3, 3]
    global_from_car = np.eye(4)
    global_from_car[:3, :3] = rot
    global_from_car[:3, 3] = tran
    car_from_global = np.eye(4)
    car_from_global[:3, :3] = rot.T
    car_from_global[:3, 3] = -rot.T @ tran
    return global_from_car, car_from_global


def sort_frames(frames):
    def key(f):
        return int(f.split("_")[1]) * 1000 + int(f.split("_")[3][:-4])

    return sorted(frames, key=key)


def fill_infos(root_path, frames, split="train", nsweeps=1):
    """(reference waymo_common.py:196-289): per-frame info dicts with sweep
    pose chains, Waymo->KITTI box conversion, and the gt_signs object IDs
    keying the dense object set."""
    infos = []
    for frame_name in frames:
        lidar_path = os.path.join(root_path, split, "lidar", frame_name)
        ref_path = os.path.join(root_path, split, "annos", frame_name)
        ref_obj = get_obj(ref_path)
        ref_time = 1e-6 * int(ref_obj["frame_name"].split("_")[-1])
        ref_pose = np.reshape(ref_obj["veh_to_global"], [4, 4])
        _, ref_from_global = veh_pos_to_transform(ref_pose)

        info = {"path": lidar_path, "anno_path": ref_path, "token": frame_name,
                "timestamp": ref_time, "sweeps": []}
        sequence_id = int(frame_name.split("_")[1])
        frame_id = int(frame_name.split("_")[3][:-4])

        prev_id = frame_id
        sweeps = []
        while len(sweeps) < nsweeps - 1:
            if prev_id <= 0:
                sweeps.append(sweeps[-1] if sweeps else {
                    "path": lidar_path, "token": frame_name,
                    "transform_matrix": None, "time_lag": 0,
                })
            else:
                prev_id -= 1
                curr_name = f"seq_{sequence_id}_frame_{prev_id}.pkl"
                curr_lidar = os.path.join(root_path, split, "lidar", curr_name)
                curr_obj = get_obj(os.path.join(root_path, split, "annos", curr_name))
                curr_pose = np.reshape(curr_obj["veh_to_global"], [4, 4])
                global_from_car, _ = veh_pos_to_transform(curr_pose)
                tm = reduce(np.dot, [ref_from_global, global_from_car])
                time_lag = ref_time - 1e-6 * int(
                    curr_obj["frame_name"].split("_")[-1])
                sweeps.append({"path": curr_lidar, "transform_matrix": tm,
                               "time_lag": time_lag})
        info["sweeps"] = sweeps

        if split != "test":
            annos = ref_obj["objects"]
            num_points = np.array([a["num_points"] for a in annos])
            gt_boxes = np.array([a["box"] for a in annos]).reshape(-1, 9)
            gt_ids = np.array([a["name"] for a in annos])
            if len(gt_boxes):
                # Waymo -> KITTI box convention (waymo_common.py:272-276)
                gt_boxes[:, -1] = -np.pi / 2 - gt_boxes[:, -1]
                gt_boxes[:, [3, 4]] = gt_boxes[:, [4, 3]]
            gt_names = np.array([TYPE_LIST[a["label"]] for a in annos])
            mask = (num_points > 0).reshape(-1)
            info["gt_boxes"] = gt_boxes[mask].astype(np.float32)
            info["gt_names"] = gt_names[mask].astype(str)
            info["gt_signs"] = gt_ids[mask].astype(str)
        infos.append(info)
    return infos


def create_waymo_infos(root_path, split="train", nsweeps=1):
    frames = sort_frames(os.listdir(os.path.join(root_path, split, "lidar")))
    infos = fill_infos(root_path, frames, split, nsweeps)
    out = os.path.join(
        root_path, f"infos_{split}_{nsweeps:02d}sweeps_filter_zero_gt.pkl")
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} infos to {out}")
    return out


def create_gt_database(root_path, info_path, used_classes=None, nsweeps=1):
    """Crop per-object point clouds into a GT-AUG database
    (reference datasets/utils/create_gt_database.py:16-170)."""
    from ..core import box_np_ops
    from ..data.pipelines.loading import get_obj as _load, read_single_waymo

    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    db_path = os.path.join(root_path, f"gt_database_{nsweeps}sweeps_withvelo")
    os.makedirs(db_path, exist_ok=True)
    db_infos = {}
    for info in infos:
        points = read_single_waymo(_load(info["path"]))
        gt_boxes = info["gt_boxes"]
        names = info["gt_names"]
        signs = info.get("gt_signs", [""] * len(names))
        if len(gt_boxes) == 0:
            continue
        masks = box_np_ops.points_in_rbbox(points, gt_boxes[:, [0, 1, 2, 3, 4, 5, -1]])
        for i in range(len(gt_boxes)):
            name = names[i]
            if used_classes and name not in used_classes:
                continue
            obj_points = points[masks[:, i]].copy()
            if len(obj_points) == 0:
                continue
            obj_points[:, :3] -= gt_boxes[i, :3]
            fname = f"{info['token']}_{name}_{i}.bin"
            obj_points.astype(np.float32).tofile(os.path.join(db_path, fname))
            db_infos.setdefault(name, []).append({
                "name": name,
                "path": os.path.join(os.path.basename(db_path), fname),
                "gt_signs": str(signs[i]),
                "image_idx": info["token"],
                "gt_idx": i,
                "box3d_lidar": gt_boxes[i][[0, 1, 2, 3, 4, 5, -1]].astype(np.float32),
                "num_points_in_gt": int(masks[:, i].sum()),
                "difficulty": 0,
            })
    out = os.path.join(root_path, f"dbinfos_train_{nsweeps}sweeps_withvelo.pkl")
    with open(out, "wb") as f:
        pickle.dump(db_infos, f)
    print(f"wrote gt database: "
          f"{ {k: len(v) for k, v in db_infos.items()} } -> {out}")
    return out


def decode_tfrecords(tfrecord_dir, out_dir, split, workers=8):
    """tfrecord -> per-frame pickles (reference waymo_converter.py:25-56,
    waymo_decoder.py:22-199). The range-image -> point math runs in NumPy
    (data/datasets/waymo_decoder.py, unit-tested without the devkit); only
    the Frame-proto parsing needs the waymo_open_dataset package."""
    try:
        from waymo_open_dataset import dataset_pb2  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            "tfrecord decoding needs the waymo_open_dataset protos "
            f"(not installed here): {e}. Decode on a machine with the devkit, "
            "then run waymo_data_prep on the resulting pickles."
        )
    import glob as _glob
    from multiprocessing import Pool

    from ..data.datasets.waymo_decoder import convert_tfrecord

    records = sorted(_glob.glob(os.path.join(tfrecord_dir, "*.tfrecord")))
    lidar_dir = os.path.join(out_dir, split, "lidar")
    anno_dir = os.path.join(out_dir, split, "annos")
    args = [(rec, lidar_dir, anno_dir, i) for i, rec in enumerate(records)]
    if workers > 1:
        with Pool(workers) as pool:
            counts = pool.starmap(convert_tfrecord, args)
    else:
        counts = [convert_tfrecord(*a) for a in args]
    print(f"decoded {sum(counts)} frames from {len(records)} tfrecords "
          f"-> {out_dir}/{split}")
    return sum(counts)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    w = sub.add_parser("waymo_data_prep")
    w.add_argument("--root_path", required=True)
    w.add_argument("--split", default="train")
    w.add_argument("--nsweeps", type=int, default=1)
    w.add_argument("--gt_database", action="store_true")
    d = sub.add_parser("waymo_decode",
                       help="decode raw .tfrecord files to per-frame pickles")
    d.add_argument("--tfrecord_dir", required=True)
    d.add_argument("--root_path", required=True)
    d.add_argument("--split", default="train")
    d.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    if args.cmd == "waymo_data_prep":
        info_path = create_waymo_infos(args.root_path, args.split, args.nsweeps)
        if args.gt_database and args.split == "train":
            create_gt_database(args.root_path, info_path, nsweeps=args.nsweeps)
    elif args.cmd == "waymo_decode":
        decode_tfrecords(args.tfrecord_dir, args.root_path, args.split,
                         workers=args.workers)


if __name__ == "__main__":
    main()
