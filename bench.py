"""Benchmark: single-frame inference on the Waymo grid.

Two models, both end-to-end on-device (reader -> backbone -> neck -> head ->
decode -> rotated NMS, one jitted function, batch 1):

1. CenterPoint-Pillar (baseline comparator: 31 FPS published for the pillar
   model on a TITAN RTX, reference configs/nusc/README.md:26-35);
2. the FLAGSHIP CenterPoint-VoxelNet + S2D student (KD_VoxelNet, S2D_RPN,
   150k voxels, 41x1504x1504 grid, windowed one-hot sparse-conv engine);
   comparator: ~11.5 FPS for spconv CenterPoint-VoxelNet on an RTX 3090
   (87 ms/frame, the reference's own hardware class; BASELINE.md).

Prints one JSON line per model; the FLAGSHIP line is printed LAST.

Timing methodology (this TPU is reached through a tunnel whose per-dispatch
round trip is ~30 ms — larger than the model itself):
- each measured dispatch runs the FULL inference K times via lax.scan with
  per-step input perturbations (fresh content defeats the runtime's
  content-memoization; the scan carry serializes the steps);
- per-frame time = (T(K2) - T(K1)) / (K2 - K1), which cancels the constant
  dispatch/tunnel overhead exactly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _bench_model(model, variables, batch, k1=4, k2=12):
    import jax
    import jax.numpy as jnp

    def one_frame(carry, eps):
        b = dict(batch)
        # carry feeds back so scan steps are serialized end-to-end
        b["voxels"] = b["voxels"] + eps + carry * 1e-12
        preds = model.apply(variables, b, train=False)
        out = model.predict(preds, None)
        s = jnp.sum(out["scores"])
        return s, s

    def make_runner(k):
        @jax.jit
        def run(eps_stack):
            _, sums = jax.lax.scan(one_frame, jnp.float32(0.0), eps_stack)
            return jnp.sum(sums)
        return run

    rng = np.random.RandomState(7)

    def eps_stack(k, salt):
        return jax.device_put(
            rng.normal(0, 1e-4, (k, 1, 1, 1, 1)).astype(np.float32) + salt
        )

    reps = int(os.environ.get("S2D_BENCH_REPS", "3"))

    def once(run, es, retries=4):
        # the axon tunnel intermittently fails dispatches of large
        # programs with a bare INVALID_ARGUMENT (observed r5 on the plane
        # engine; the same dispatch re-runs fine) — retry, and report
        for attempt in range(retries + 1):
            try:
                t0 = time.perf_counter()
                float(np.asarray(run(es)))
                return time.perf_counter() - t0
            except Exception as e:
                if attempt == retries:
                    raise
                print(f"[bench dispatch retry {attempt + 1}: "
                      f"{type(e).__name__}]", file=sys.stderr, flush=True)

    def timed(k):
        run = make_runner(k)
        once(run, eps_stack(k, 0.0))  # compile + warmup
        return [once(run, eps_stack(k, 1e-6 * (r + 1))) for r in range(reps)]

    ts1, ts2 = timed(k1), timed(k2)
    # per-rep frame time: pair the sorted rep lists so tunnel-slow reps
    # difference against tunnel-slow reps (per-rep spread, not cross talk)
    dts = [max((b - a) / (k2 - k1), 1e-6)
           for a, b in zip(sorted(ts1), sorted(ts2))]
    dt = float(np.median(dts))
    # run-to-run spread on stderr (PERF.md records it; the driver's stdout
    # JSON schema stays one line per metric)
    print(f"[bench spread] frame_ms median={dt*1e3:.2f} "
          f"min={min(dts)*1e3:.2f} max={max(dts)*1e3:.2f} reps={reps} "
          f"spread_pct={100*(max(dts)-min(dts))/max(dt, 1e-9):.1f}",
          file=sys.stderr, flush=True)
    return 1.0 / dt


def bench_pillar():
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
    fps = _bench_model(model, variables, batch)
    print(json.dumps({
        "metric": "pointpillars_waymo_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 31.0, 3),
    }), flush=True)


def bench_voxelnet_s2d():
    """The flagship: CenterPoint-VoxelNet + S2D/PCR student (KD_VoxelNet,
    SpMiddleResNetFHD windowed engine, S2D_RPN) at the real Waymo scale:
    150k voxels on the 41x1504x1504 grid. Baseline: spconv CenterPoint-
    VoxelNet at ~87 ms/frame (11.5 FPS) on an RTX 3090 (BASELINE.md)."""
    import jax

    from sparse2dense_tpu.utils import Config
    from sparse2dense_tpu.models import build_detector
    from sparse2dense_tpu.training.synthetic import make_batch

    cfg = Config.fromfile(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "configs", "waymo",
            "voxelnet", "waymo_centerpoint_voxelnet_3x_distill_interval_5.py")
    )
    cfg.S_model["bbox_head"]["init_bias"] = -6.0
    # engine/budget/dtype settings ship IN the config (zoo.py builders) —
    # the bench runs the user-facing configuration unmodified; S2D_ENGINE
    # only exists for engine A/B experiments
    if os.environ.get("S2D_ENGINE"):
        eng = os.environ["S2D_ENGINE"]  # "window" | "plane" | "tile:pallas"
        eng, _, backend = eng.partition(":")
        cfg.S_model["backbone"]["engine"] = eng
        if backend:
            cfg.S_model["backbone"]["tile_backend"] = backend
        if eng in ("plane", "tile"):  # these ignore dense_from_stage
            cfg.S_model["backbone"].pop("dense_from_stage", None)
    model = build_detector(cfg.S_model, test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.voxel_generator)
    batch = make_batch(cfg, 1, max_voxels=150000, n_points=170000,
                       n_obj=32, with_targets=False)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    fps = _bench_model(model, variables, batch, k1=2, k2=6)
    print(json.dumps({
        "metric": "centerpoint_voxelnet_s2d_waymo_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 11.5, 3),
    }), flush=True)


def bench_voxelizer():
    """Host voxelization throughput (named driver metric, BASELINE.json):
    the native C++ voxelizer (csrc/voxelizer.cpp) on a Waymo-scale cloud;
    falls back to the NumPy parity path if the library is absent."""
    from sparse2dense_tpu.ops.voxelize import VoxelGenerator
    from sparse2dense_tpu.training.synthetic import make_points

    rng = np.random.RandomState(3)
    pc_range = [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0]
    pts = make_points(rng, 180000, pc_range).astype(np.float32)
    vg = VoxelGenerator([0.1, 0.1, 0.15], pc_range, 5, 150000)
    vg.generate(pts)  # warm (allocators, native lib load)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        vg.generate(pts)
        ts.append(time.perf_counter() - t0)
    mpts = len(pts) / np.median(ts) / 1e6
    # comparator: the reference's numba points_to_voxel kernel measures
    # ~4-6 Mpts/s on server CPUs (det3d/ops/point_cloud/point_cloud_ops.py:112)
    print(json.dumps({
        "metric": "voxelization_throughput",
        "value": round(float(mpts), 2),
        "unit": "Mpts/s",
        "vs_baseline": round(float(mpts) / 5.0, 3),
    }), flush=True)


def bench_two_stage():
    """Two-stage CenterPoint-VoxelNet+S2D (BEV-ROI refinement on device,
    models/detectors/two_stage.py; reference two_stage.py:9-199) — the
    parity-north-star model family. Same comparator hardware class as the
    one-stage flagship (~11.5 FPS spconv/3090; the second stage adds ~3 ms
    on GPU, so the published number is reused)."""
    import jax

    from sparse2dense_tpu.utils import Config
    from sparse2dense_tpu.models import build_detector
    from sparse2dense_tpu.training.synthetic import make_batch

    cfg = Config.fromfile(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "configs", "waymo",
            "voxelnet", "two_stage",
            "waymo_centerpoint_voxelnet_two_stage_distill_interval_5.py"))
    cfg.S_model["first_stage_cfg"]["bbox_head"]["init_bias"] = -6.0
    model = build_detector(cfg.S_model, test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.voxel_generator)
    batch = make_batch(cfg, 1, max_voxels=150000, n_points=170000,
                       n_obj=32, with_targets=False)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "proposal": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, batch, train=False))()
    fps = _bench_model(model, variables, batch, k1=2, k2=6)
    print(json.dumps({
        "metric": "centerpoint_voxelnet_s2d_two_stage_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 11.5, 3),
    }), flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    which = os.environ.get("S2D_BENCH", "all")
    if which in ("all", "voxelizer"):
        bench_voxelizer()
    if which in ("all", "pillar"):
        bench_pillar()
    if which in ("all", "twostage"):
        bench_two_stage()
    if which in ("all", "voxelnet"):
        bench_voxelnet_s2d()  # the FLAGSHIP line stays last


if __name__ == "__main__":
    main()
