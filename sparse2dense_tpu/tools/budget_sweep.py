"""Sweep the sparse-engine budgets against the DETECTION OUTPUT.

The TPU engines replace spconv's exact ragged active sets with static
row/plane budgets (reference spconv has no budgets — exactness is the
parity risk being bounded, /root/reference/det3d/models/backbones/scn.py:89-185).
This tool quantifies that risk end to end: it runs the flagship
CenterPoint-VoxelNet+S2D student on the SAME synthetic Waymo scene under
several budget settings, decodes boxes (predict -> NMS), and reports the
decoded-output delta of each setting against the most generous one, plus
the engine overflow/miss telemetry counters.

Usage:
    python -m sparse2dense_tpu.tools.budget_sweep [--voxels 150000]
        [--settings shipped,tight,loose] [--engine ''|plane|window]

A setting only counts as safe when its telemetry counters are zero AND
its decoded boxes match the reference setting (score/center deltas ~0).
"""
import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

# budget settings: (stage_budgets, plane_budgets, tile_budgets)
SETTINGS = {
    # generous reference point: budgets at the drop-free ceiling measured
    # on the synthetic 150k scene (PERF.md round-3 occupancy table)
    "loose": ((384000, 256000, 110000, 60000), (96000, 32000, 8000)),
    # the shipped zoo configuration
    "shipped": ((320000, 210000, 90000, 48000), (80000, 26000, 6400)),
    # one notch tighter: where does output damage start?
    "tight": ((256000, 168000, 72000, 38000), (64000, 21000, 5200)),
    "vtight": ((200000, 130000, 56000, 30000), (50000, 16000, 4000)),
}


def decode(cfg_path, voxels, stage_budgets, plane_budgets, engine):
    import jax

    from ..models import build_detector
    from ..training.synthetic import make_batch
    from ..utils import Config

    cfg = Config.fromfile(cfg_path)
    cfg.S_model["bbox_head"]["init_bias"] = -6.0
    bb = cfg.S_model["backbone"]
    bb["stage_budgets"] = tuple(stage_budgets)
    bb["plane_budgets"] = tuple(plane_budgets)
    if engine:
        bb["engine"] = engine
        if engine in ("plane", "tile"):
            bb.pop("dense_from_stage", None)
    model = build_detector(cfg.S_model, test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.voxel_generator)
    batch = make_batch(cfg, 1, max_voxels=voxels, n_points=170000,
                       n_obj=32, with_targets=False)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()

    @jax.jit
    def run(batch):
        preds, tel = model.apply(variables, batch, train=False,
                                 mutable=["telemetry"])
        out = model.predict(preds, None)
        return out, tel.get("telemetry", {})

    out, tel = run(batch)
    out = {k: np.asarray(v) for k, v in out.items()
           if hasattr(v, "shape")}
    flat = {}
    def _walk(d, pfx=""):
        for k, v in d.items():
            if isinstance(v, dict):
                _walk(v, pfx + k + "/")
            else:
                try:
                    flat[pfx + k] = int(np.sum(np.asarray(v)))
                except Exception:
                    pass
    _walk(tel)
    return out, flat


def compare(ref, got, score_thr=0.3):
    """Match decoded boxes above score_thr by nearest center; report
    counts and deltas."""
    rs, gs = ref["scores"].reshape(-1), got["scores"].reshape(-1)
    rb = ref["boxes"].reshape(-1, ref["boxes"].shape[-1])
    gb = got["boxes"].reshape(-1, got["boxes"].shape[-1])
    rm, gm = rs > score_thr, gs > score_thr
    rb, rs2 = rb[rm], rs[rm]
    gb, gs2 = gb[gm], gs[gm]
    if len(rb) == 0:
        return dict(n_ref=0, n_got=int(gm.sum()), matched=0,
                    center_mae=0.0, score_mae=0.0)
    if len(gb) == 0:
        return dict(n_ref=int(rm.sum()), n_got=0, matched=0,
                    center_mae=float("inf"), score_mae=float("inf"))
    d = np.linalg.norm(rb[:, None, :2] - gb[None, :, :2], axis=-1)
    j = d.argmin(1)
    dmin = d[np.arange(len(rb)), j]
    ok = dmin < 0.5
    return dict(
        n_ref=int(len(rb)), n_got=int(len(gb)), matched=int(ok.sum()),
        center_mae=float(dmin[ok].mean()) if ok.any() else float("inf"),
        score_mae=float(np.abs(rs2[ok] - gs2[j][ok]).mean())
        if ok.any() else float("inf"),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voxels", type=int, default=150000)
    p.add_argument("--settings", default="loose,shipped,tight,vtight")
    p.add_argument("--engine", default="",
                   help="override backbone engine ('' = config default)")
    p.add_argument("--config", default=None)
    args = p.parse_args()

    cfg_path = args.config or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "waymo", "voxelnet",
        "waymo_centerpoint_voxelnet_3x_distill_interval_5.py")

    names = args.settings.split(",")
    ref_name = names[0]
    results = {}
    for name in names:
        sb, pb = SETTINGS[name]
        out, tel = decode(cfg_path, args.voxels, sb, pb, args.engine)
        results[name] = (out, tel)
        print(f"{name}: telemetry={tel}", flush=True)

    ref = results[ref_name][0]
    for name in names:
        out, tel = results[name]
        c = compare(ref, out)
        drops = {k: v for k, v in tel.items()
                 if any(s in k for s in ("drop", "miss", "resid"))}
        print(json.dumps({"setting": name, "vs": ref_name, **c,
                          "overflow": drops}), flush=True)


if __name__ == "__main__":
    main()
