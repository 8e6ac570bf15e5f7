"""Stage-level latency breakdown of the CenterPoint-VoxelNet backbone on the
real chip (per-stage prefixes via SpMiddleResNetFHD.stop_after), plus full
model and head-only costs. Drives the engine work for PERF.md.

Usage: python -m sparse2dense_tpu.tools.profile_model [--voxels 150000]
       [--budgets 150000,150000,150000,150000] [--dfs 2] [--stages ...]
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import argparse
import time

import numpy as np


def timed_scan(step_fn, k1=2, k2=6, reps=2):
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def run(i0):
            _, outs = jax.lax.scan(step_fn, jnp.float32(0.0),
                                   i0 + jnp.arange(k, dtype=jnp.int32))
            return jnp.sum(outs)
        return run

    def once(run, i0, retries=4):
        # the axon tunnel intermittently fails dispatches of large
        # programs with a bare INVALID_ARGUMENT (observed r5 on the plane
        # engine; the same dispatch re-runs fine) — retry, and report
        for attempt in range(retries + 1):
            try:
                t0 = time.perf_counter()
                v = float(np.asarray(run(jnp.int32(i0))))
                return time.perf_counter() - t0, v
            except Exception as e:
                if attempt == retries:
                    raise
                print(f"  [dispatch retry {attempt + 1}: "
                      f"{type(e).__name__}]", flush=True)

    def t(k):
        run = make(k)
        once(run, 0)  # compile + warmup
        ts = []
        for r in range(reps):
            dt, _ = once(run, r + 1)
            ts.append(dt)
        return float(np.median(ts))

    return max((t(k2) - t(k1)) / (k2 - k1), 1e-9)


def synth_voxels(v, seed=0):
    """Roughly Waymo-shaped synthetic scene: points concentrated near the ego
    on a ground plane + objects, so BEV occupancy clusters like real scans."""
    rng = np.random.RandomState(seed)
    n = v * 2
    r = np.abs(rng.gamma(2.0, 12.0, n)).clip(0, 74)  # radial falloff
    th = rng.uniform(-np.pi, np.pi, n)
    x, y = r * np.cos(th), r * np.sin(th)
    z = rng.choice([0.0, 1.0], n, p=[0.7, 0.3]) * rng.uniform(0, 2.5, n) \
        + rng.normal(0, 0.2, n)
    pts = np.stack([x, y, z], -1)
    grid = np.floor((pts - np.array([-75.2, -75.2, -2.0])) /
                    np.array([0.1, 0.1, 0.15])).astype(np.int64)
    ok = ((grid >= 0).all(1) & (grid < np.array([1504, 1504, 41])).all(1))
    grid = grid[ok]
    lin = (grid[:, 2] * 1504 + grid[:, 1]) * 1504 + grid[:, 0]
    _, first = np.unique(lin, return_index=True)
    grid = grid[np.sort(first)][:v]
    coords = grid[:, [2, 1, 0]].astype(np.int32)  # zyx
    nv = len(coords)
    coords = np.pad(coords, ((0, v - nv), (0, 0)), constant_values=-1)
    feats = rng.randn(v, 5).astype(np.float32)
    feats[nv:] = 0
    print(f"synthetic scene: {nv} occupied voxels of budget {v}")
    return feats[None], coords[None]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voxels", type=int, default=150000)
    p.add_argument("--budgets", default=None)
    p.add_argument("--dfs", type=int, default=2)
    p.add_argument("--stages", default="conv1,conv2,conv3,conv4,full")
    p.add_argument("--engine", default="gather")
    p.add_argument("--dense_dtype", default=None,
                   help='e.g. "bfloat16" for the dense stages')
    p.add_argument("--tile_size", default="4,4")
    p.add_argument("--tile_tz", default="8,4,2,6")
    p.add_argument("--tile_budgets", default="72000,36000,14000,2400")
    p.add_argument("--tile_backend", default="xla",
                   help='"pallas" = fused tile-block kernel (eval path)')
    p.add_argument("--tilek_window", default="256",
                   help="rank-window tiles: one int or per-stage w0:wz,...")
    p.add_argument("--plane_budgets", default="80000,26000,6400",
                   help="plane engine: occupied-plane budgets conv2..conv4")
    p.add_argument("--plane_window", default="128",
                   help="plane engine rank-window rows: int or per-stage "
                        "w0:wy,...")
    p.add_argument("--win_window", default="384",
                   help="window engine rank rows: int or per-stage list")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    import jax.numpy as jnp

    from ..models.backbones.scn import SpMiddleResNetFHD

    budgets = (tuple(int(x) for x in args.budgets.split(","))
               if args.budgets else None)
    def parse_wins(spec):
        """'W' | 'w0:w1' | comma list mixing both (ADVICE r4: a single
        'w0:w1' spec must parse without a comma)."""
        if "," in spec or ":" in spec:
            return tuple(
                tuple(int(v) for v in w.split(":")) if ":" in w else int(w)
                for w in spec.split(","))
        return int(spec)

    tkw = parse_wins(args.tilek_window)
    pw = parse_wins(args.plane_window)
    ww = parse_wins(args.win_window)
    if isinstance(ww, tuple):
        ww = tuple(int(w) if not isinstance(w, tuple) else int(w[0])
                   for w in ww)
    feats, coords = synth_voxels(args.voxels)
    featsj, coordsj = jnp.asarray(feats), jnp.asarray(coords)

    prev = 0.0
    for stage in args.stages.split(","):
        stop = None if stage == "full" else stage
        bb = SpMiddleResNetFHD(num_input_features=5, stage_budgets=budgets,
                               dense_from_stage=args.dfs, stop_after=stop,
                               dense_compute_dtype=args.dense_dtype,
                               engine=args.engine,
                               tile_size=tuple(int(x) for x in
                                               args.tile_size.split(",")),
                               tile_tz=tuple(int(x) for x in
                                             args.tile_tz.split(",")),
                               tile_budgets=tuple(int(x) for x in
                                                  args.tile_budgets.split(",")),
                               tile_backend=args.tile_backend,
                               tilek_window=tkw,
                               plane_budgets=tuple(
                                   int(x) for x in
                                   args.plane_budgets.split(",")),
                               plane_window=pw, win_window=ww)
        variables = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), featsj,
                                            coordsj, False))()

        def step(carry, i, bb=bb, variables=variables):
            f = featsj + (carry * 1e-20 + i.astype(jnp.float32) * 1e-12)
            out, ms = bb.apply(variables, f, coordsj, False)
            leaf = out if out is not None else list(ms.values())[-1][0]
            if isinstance(leaf, tuple):  # tile engine: (buf, mask, ts)
                leaf = leaf[0]
            if hasattr(leaf, "features"):
                leaf = leaf.features
            s = jnp.sum(leaf) * 1e-20
            return carry + s, s

        secs = timed_scan(step)
        print(f"backbone through {stage:6s}: {secs*1e3:8.1f} ms "
              f"(+{(secs-prev)*1e3:7.1f} ms)", flush=True)
        prev = secs


if __name__ == "__main__":
    main()
