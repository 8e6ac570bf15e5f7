"""Reformat stage: the pipeline result -> a flat example dict.

Rebuild of the reference det3d/datasets/pipelines/formating.py:14-117.
"""
from __future__ import annotations


class Reformat:
    def __init__(self, distillation=False, **kwargs):
        self.distillation = distillation
        self.double_flip = kwargs.get("double_flip", False)

    def __call__(self, res, info):
        meta = res.get("metadata")
        voxels = res["lidar"]["voxels"]
        bundle = dict(
            metadata=meta,
            points=res["lidar"]["points"],
            voxels=voxels["voxels"],
            shape=voxels["shape"],
            num_points=voxels["num_points"],
            num_voxels=voxels["num_voxels"],
            coordinates=voxels["coordinates"],
        )
        if self.distillation:
            dense = res["lidar"]["dense_voxels"]
            bundle.update(
                dense_points=res["lidar"]["dense_points"],
                dense_voxels=dense["voxels"],
                dense_num_points=dense["num_points"],
                dense_num_voxels=dense["num_voxels"],
                dense_coordinates=dense["coordinates"],
                reconstruction_points=res["lidar"]["reconstruction_points"],
            )
            for tag in ("", "_2", "_4"):
                rv = res["lidar"][f"reconstruction_voxels{tag}"]
                bundle[f"reconstruction_voxels{tag}"] = rv["voxels"]
                bundle[f"reconstruction_coordinates{tag}"] = rv["coordinates"]
                bundle[f"reconstruction_num_voxels{tag}"] = rv["num_voxels"]
                bundle[f"reconstruction_num_points{tag}"] = rv["num_points"]
        if res["mode"] in ("train", "val") and "targets" in res["lidar"]:
            bundle.update(res["lidar"]["targets"])
        if self.double_flip and res["mode"] != "train":
            # 4-way TTA: [orig, yflip, xflip, double] bundles, collated as a
            # group of 4 (reference formating.py:75-114)
            bundles = [bundle]
            for key in ("yflip", "xflip", "double_flip"):
                v = res["lidar"][f"{key}_voxels"]
                bundles.append(dict(
                    metadata=meta,
                    voxels=v["voxels"],
                    shape=v["shape"],
                    num_points=v["num_points"],
                    num_voxels=v["num_voxels"],
                    coordinates=v["coordinates"],
                ))
            return bundles, info
        return bundle, info


class Empty:
    """No-op stage (reference configs emit dict(type="Empty") when a TTA
    stage is disabled)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, res, info):
        return res, info


class Compose:
    """Sequential (res, info) threading (reference pipelines/compose.py)."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, res, info):
        for t in self.transforms:
            res, info = t(res, info)
            if res is None:
                return None, None
        return res, info


def build_pipeline(stage_cfgs, distillation=None):
    """Build a Compose from the reference's pipeline stage-dict list."""
    from .loading import LoadPointCloudFromFile, LoadPointCloudAnnotations
    from .preprocess import Preprocess, Voxelization
    from .assign_label import AssignLabel
    from .assign_target import AssignTarget
    from .preprocess import DoubleFlip

    registry = {
        "LoadPointCloudFromFile": LoadPointCloudFromFile,
        "LoadPointCloudAnnotations": LoadPointCloudAnnotations,
        "Preprocess": Preprocess,
        "Voxelization": Voxelization,
        "AssignLabel": AssignLabel,
        "AssignTarget": AssignTarget,
        "DoubleFlip": DoubleFlip,
        "Empty": Empty,
        "Reformat": Reformat,
    }
    stages = []
    for cfg in stage_cfgs:
        cfg = dict(cfg)
        kind = cfg.pop("type")
        if kind not in registry:
            raise KeyError(f"unknown pipeline stage {kind}")
        stages.append(registry[kind](**cfg))
    return Compose(stages)
