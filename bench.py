"""Benchmark: single-frame CenterPoint-Pillar inference on the Waymo grid.

Measures end-to-end on-device latency (reader -> scatter -> RPN -> CenterHead
-> decode -> rotated NMS, one jitted function, batch 1) and reports
frames/sec/chip. ``vs_baseline`` compares against the closest published
reference throughput: 31 FPS for the CenterPoint-Pillar model on a TITAN RTX
(reference configs/nusc/README.md:26-35; the reference publishes no Waymo
latency numbers — see SURVEY.md §6).

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


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass

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

    def timed(k, reps=3):
        run = make_runner(k)
        float(np.asarray(run(eps_stack(k, 0.0))))  # compile + warmup
        ts = []
        for r in range(reps):
            es = eps_stack(k, 1e-6 * (r + 1))
            t0 = time.perf_counter()
            float(np.asarray(run(es)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    k1, k2 = 4, 12
    t1, t2 = timed(k1), timed(k2)
    dt = max((t2 - t1) / (k2 - k1), 1e-6)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "pointpillars_waymo_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 31.0, 3),
    }))


if __name__ == "__main__":
    main()
