"""Benchmark: single-frame CenterPoint-Pillar inference on the Waymo grid.

Measures end-to-end on-device latency (reader -> scatter -> RPN -> CenterHead
-> decode -> rotated NMS, one jitted function, batch 1) and reports
frames/sec/chip. ``vs_baseline`` compares against the closest published
reference throughput: 31 FPS for the CenterPoint-Pillar model on a TITAN RTX
(reference configs/nusc/README.md:26-35; the reference publishes no Waymo
latency numbers — see SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from sparse2dense_tpu.utils import Config
    from sparse2dense_tpu.models import build_detector
    from sparse2dense_tpu.training.synthetic import make_batch

    cfg = Config.fromfile(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "waymo", "pp", "pp_centerpoint_3x.py")
    )
    # Random-init heatmaps sit right at the score threshold and flood NMS
    # with ~100k fake candidates; a trained detector yields hundreds. Bias
    # the heatmap head down so the bench reflects trained-density postproc.
    cfg.S_model["bbox_head"]["init_bias"] = -6.0
    model = build_detector(cfg.S_model, test_cfg=cfg.test_cfg)
    max_voxels = int(cfg.voxel_generator["max_voxel_num"][0])
    batch = make_batch(cfg, 1, max_voxels=max_voxels, n_points=160000,
                       n_obj=32, with_targets=False)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    @jax.jit
    def infer(variables, batch):
        preds = model.apply(variables, batch, train=False)
        return model.predict(preds, None)

    # Honest timing on this tunneled TPU: the runtime memoizes executions by
    # content, so every measured dispatch must see fresh input content, and
    # the result must be pulled to host before stopping the clock.
    rng = np.random.RandomState(7)
    perturbs = [
        jax.device_put(rng.normal(0, 1e-4, (1, 1, 1, 1)).astype(np.float32))
        for _ in range(6)
    ]

    @jax.jit
    def infer_p(variables, batch, eps):
        b = dict(batch)
        b["voxels"] = b["voxels"] + eps
        preds = model.apply(variables, b, train=False)
        return model.predict(preds, None)

    out = infer_p(variables, batch, perturbs[0])
    jax.block_until_ready(out)

    times = []
    for eps in perturbs[1:]:
        t0 = time.perf_counter()
        out = infer_p(variables, batch, eps)
        float(np.asarray(out["scores"]).sum())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "pointpillars_waymo_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 31.0, 3),
    }))


if __name__ == "__main__":
    main()
