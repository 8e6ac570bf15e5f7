"""Primitive microbenchmarks for the sparse-conv engine design (v5e).

Answers, on real hardware, the questions that pick the round-2 engine
(PERF.md "Next-round perf plan"): how fast are XLA gathers at each row
granularity, scatter-adds, MXU matmuls at small N, dense 3D convs at the
stage geometries, and what a Pallas kernel can do (VMEM-resident dynamic
gather; raw per-row DMA gather from HBM).

Timing uses the same K-step lax.scan differencing as bench.py (the axon
tunnel adds ~30 ms per dispatch; differencing cancels it).

Usage: python -m sparse2dense_tpu.tools.microbench [suite ...]
Suites: gather scatter matmul conv sort pallas_take pallas_dma pallas_run
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def timed_scan(step_fn, k1=4, k2=12, reps=3, verbose=False):
    """step_fn(carry, i) -> (carry, out_scalar). Returns seconds/step."""

    def make(k):
        @jax.jit
        def run(i0):
            _, outs = jax.lax.scan(step_fn, jnp.float32(0.0),
                                   i0 + jnp.arange(k, dtype=jnp.int32))
            return jnp.sum(outs)
        return run

    def t(k):
        run = make(k)
        float(np.asarray(run(jnp.int32(0))))  # compile+warm
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(jnp.int32(r + 1))))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = t(k1), t(k2)
    if verbose:
        print(f"    raw: T({k1})={t1*1e3:.2f} ms, T({k2})={t2*1e3:.2f} ms",
              flush=True)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def report(name, secs, useful_bytes=None, flops=None, n=None):
    msg = f"{name:44s} {secs*1e3:9.3f} ms"
    if useful_bytes:
        msg += f"  {useful_bytes/secs/1e9:8.1f} GB/s"
    if flops:
        msg += f"  {flops/secs/1e12:7.2f} TF/s"
    if n:
        msg += f"  {n/secs/1e6:8.1f} Mrows/s"
    print(msg, flush=True)


def bench_gather():
    V = 1 << 17  # 131072 rows
    rng = np.random.RandomState(0)
    for C in (16, 64, 128):
        feat = jnp.asarray(rng.randn(V, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, V, size=(V,)).astype(np.int32))

        def step(carry, i, feat=feat, idx=idx):
            ii = idx ^ (i & 1)  # cheap per-step variation, stays in [0, V)
            out = feat[ii]
            s = jnp.sum(out) * 1e-20
            return carry + s, s

        secs = timed_scan(step, verbose=True)
        report(f"xla gather V={V} C={C} ({C*4}B rows)", secs,
               useful_bytes=V * C * 4, n=V)

    # the actual subm pattern: 27 gathers + matmul accumulate, C=16
    C = 16
    feat = jnp.asarray(rng.randn(V, C).astype(np.float32))
    nbr = jnp.asarray(rng.randint(-1, V, size=(V, 27)).astype(np.int32))
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)

    def step27(carry, i):
        out = jnp.zeros((V, C), jnp.float32)
        for tap in range(27):
            ii = nbr[:, tap] ^ (i & 1)
            m = (ii >= 0)[:, None].astype(jnp.float32)
            out = out + jnp.dot(feat[jnp.maximum(ii, 0)] * m, w[tap],
                                preferred_element_type=jnp.float32)
        s = jnp.sum(out) * 1e-20
        return carry + s, s

    secs = timed_scan(step27, k1=2, k2=6, verbose=True)
    report("gather_conv 27tap C=16 (current engine)", secs,
           useful_bytes=27 * V * C * 4, n=27 * V)


def bench_scatter():
    V = 1 << 17
    rng = np.random.RandomState(0)
    for C in (16, 32):
        rows = jnp.asarray(rng.randn(V, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, V, size=(V,)).astype(np.int32))
        canvas0 = jnp.zeros((V, C), jnp.float32)

        def step(carry, i, rows=rows, idx=idx, canvas0=canvas0):
            ii = (idx + i) % V
            c = canvas0.at[ii].add(rows)
            s = jnp.sum(c) * 1e-20
            return carry + s, s

        secs = timed_scan(step)
        report(f"xla scatter-add V={V} C={C}", secs, useful_bytes=V * C * 4, n=V)


def bench_matmul():
    rng = np.random.RandomState(0)
    for (m, k, n, dt) in [
        (131072, 432, 16, jnp.float32),
        (131072, 432, 16, jnp.bfloat16),
        (131072, 432, 128, jnp.float32),
        (131072, 432, 128, jnp.bfloat16),
        (131072, 144, 32, jnp.float32),
        (8192, 4096, 4096, jnp.bfloat16),
        (8192, 4096, 4096, jnp.float32),
    ]:
        a = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(dt)
        b = jnp.asarray(rng.randn(k, n).astype(np.float32)).astype(dt)

        def step(carry, i, a=a, b=b):
            aa = a + carry.astype(a.dtype)
            out = jnp.dot(aa, b, preferred_element_type=jnp.float32)
            s = jnp.sum(out) * 1e-20
            return carry + s * 0, s

        secs = timed_scan(step)
        report(f"matmul ({m}x{k})@({k}x{n}) {dt.__name__}", secs,
               flops=2 * m * k * n)


def bench_conv():
    rng = np.random.RandomState(0)
    shapes = [
        # (D, H, W, Cin, Cout, name)  stage geometries after each downsample
        (21, 752, 752, 32, 32, "conv2-stage"),
        (11, 376, 376, 64, 64, "conv3-stage"),
        (5, 188, 188, 128, 128, "conv4-stage"),
    ]
    for (d, h, w, ci, co, name) in shapes:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.randn(1, d, h, w, ci).astype(np.float32)).astype(dt)
            wk = jnp.asarray(
                rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.05).astype(dt)

            def step(carry, i, x=x, wk=wk):
                xx = x + carry.astype(x.dtype)
                y = jax.lax.conv_general_dilated(
                    xx, wk, (1, 1, 1), [(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)
                s = jnp.sum(y) * 1e-20
                return carry + s * 0, s

            secs = timed_scan(step, k1=2, k2=6)
            fl = 2 * d * h * w * 27 * ci * co
            report(f"dense conv3d {name} {dt.__name__}", secs, flops=fl)


def bench_sort():
    rng = np.random.RandomState(0)
    for n in (1 << 20, 1 << 22):
        keys = jnp.asarray(rng.randint(0, 1 << 30, size=(n,)).astype(np.int32))

        def step(carry, i, keys=keys):
            s = jnp.sort(keys + i)
            out = jnp.sum(s[:8]) * 1e-20
            return carry + out.astype(jnp.float32), out.astype(jnp.float32)

        secs = timed_scan(step, k1=2, k2=6)
        report(f"sort {n} int32 keys", secs, n=n)


def bench_pallas_take():
    """Dynamic gather from a VMEM-resident table inside a Pallas kernel,
    several Mosaic-lowerable formulations."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V = 1 << 17
    C = 16
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(V, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, size=(V,)).astype(np.int32))
    ref = np.asarray(feat)[np.asarray(idx)]

    idx2d = jnp.broadcast_to(idx[:, None], (V, C))

    def k_tala2d(idx_ref, feat_ref, out_ref):
        # Mosaic gather contract: operand/indices/output all same shape
        out_ref[:] = jnp.take_along_axis(feat_ref[:], idx_ref[:], axis=0)

    def make_blocked(blk):
        @jax.jit
        def take(feat, idx2d):
            grid_spec = pl.GridSpec(
                grid=(V // blk,),
                in_specs=[
                    pl.BlockSpec((blk, C), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((V, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((blk, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                k_tala2d,
                out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
                grid_spec=grid_spec,
            )(idx2d, feat)
        return take

    @jax.jit
    def take_full(feat, idx2d):
        return pl.pallas_call(
            k_tala2d,
            out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2d, feat)

    for name, take in [("tala2d(full)", take_full),
                       ("tala2d(blk2048)", make_blocked(2048))]:
        try:
            out = np.asarray(take(feat, idx2d))
            ok = np.allclose(out, ref)
            print(f"pallas {name}: compiles, correct={ok}", flush=True)
            if not ok:
                continue
        except Exception as e:
            print(f"pallas {name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue

        def step(carry, i, take=take):
            ii = idx2d ^ (i & 1)
            out = take(feat, ii)
            s = jnp.sum(out) * 1e-20
            return carry + s, s

        secs = timed_scan(step)
        report(f"pallas {name} V={V} C={C}", secs, useful_bytes=V * C * 4, n=V)


def bench_pallas_onehot():
    """Tile-blocked one-hot gather-matmul fully inside Pallas: each block of
    BLK output rows gathers from a W-row window via (BLK, W) iota==idx one-hot
    on the MXU. Models the line/tile-blocked sparse-conv engine where
    neighbor indices are local to a window."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V = 1 << 17
    C = 16
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(V, C).astype(np.float32))

    interpret = jax.devices()[0].platform == "cpu"

    for BLK, W in ((256, 512), (512, 1024)):
        # window-local indices: block b gathers rows [b*BLK .. b*BLK+W) % V
        nb = V // BLK
        local = rng.randint(0, W, size=(nb, BLK)).astype(np.int32)
        base = (np.arange(nb) * BLK).astype(np.int32)
        gidx = (base[:, None] + local) % V
        ref = np.asarray(feat)[gidx.reshape(-1)]
        lidx = jnp.asarray(local.reshape(V, 1))  # (BLK, 1) blocks tile fine

        def kernel(lidx_ref, feat_hbm, out_ref, win, sem, BLK=BLK, W=W):
            i = pl.program_id(0)
            start = jnp.minimum(i * BLK, V - W)  # clamp window at the tail
            dma = pltpu.make_async_copy(feat_hbm.at[pl.ds(start, W), :],
                                        win, sem)
            dma.start()
            dma.wait()
            onehot = (lidx_ref[:] ==
                      jax.lax.broadcasted_iota(jnp.int32, (BLK, W), 1))
            out_ref[:] = jnp.dot(onehot.astype(jnp.float32), win[:],
                                 preferred_element_type=jnp.float32)

        @partial(jax.jit, static_argnums=())
        def take(feat, lidx, kernel=kernel, BLK=BLK, W=W, nb=nb):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((W, C), jnp.float32),
                                pltpu.SemaphoreType.DMA(())],
            )
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(lidx, feat)

        try:
            out = np.asarray(take(feat, lidx))
            # block b window starts at b*BLK (wrap ignored in check tail)
            ok = np.allclose(out[:V - W], ref[:V - W])
            print(f"pallas onehot BLK={BLK} W={W}: compiles, correct={ok}",
                  flush=True)
        except Exception as e:
            print(f"pallas onehot BLK={BLK} W={W} FAILED: "
                  f"{type(e).__name__}: {str(e)[:3000]}", flush=True)
            continue

        def step(carry, i, take=take, lidx=lidx):
            ii = lidx ^ (i & 1)
            out = take(feat, ii)
            s = jnp.sum(out) * 1e-20
            return carry + s, s

        secs = timed_scan(step)
        report(f"pallas onehot BLK={BLK} W={W}", secs,
               useful_bytes=V * C * 4, n=V)


def bench_pallas_dma(run_len=1):
    """Per-row (or per-run) async DMA gather HBM->VMEM inside Pallas.

    run_len rows per descriptor (contiguous), NSLOT outstanding DMAs.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V = 1 << 17
    C = 16
    N = V // run_len  # descriptors
    NSLOT = 16
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(V, C).astype(np.float32))
    idx = jnp.asarray(
        (rng.randint(0, V // run_len, size=(N,)) * run_len).astype(np.int32))

    def kernel(idx_ref, feat_hbm, out_ref, sems):
        def get(i):
            return pltpu.make_async_copy(
                feat_hbm.at[pl.ds(idx_ref[i], run_len), :],
                out_ref.at[pl.ds(i * run_len, run_len), :],
                sems.at[i % NSLOT])

        def body(i, _):
            @pl.when(i >= NSLOT)
            def _():
                get(i - NSLOT).wait()
            get(i).start()
            return 0

        jax.lax.fori_loop(0, N, body, 0)

        def drain(i, _):
            get(i).wait()
            return 0
        jax.lax.fori_loop(N - NSLOT, N, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSLOT,))],
    )

    @jax.jit
    def dma_gather(idx, feat):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, feat)

    try:
        out = np.asarray(dma_gather(idx, feat))
        ref = np.concatenate(
            [np.asarray(feat)[i:i + run_len] for i in np.asarray(idx)])
        ok = np.allclose(out, ref)
        print(f"pallas DMA gather run_len={run_len} compiles; correct={ok}",
              flush=True)
    except Exception as e:
        print(f"pallas DMA gather run_len={run_len} FAILED: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        return

    base = jnp.asarray(rng.randint(0, V // run_len, size=(N,)).astype(np.int32))

    def step(carry, i):
        ii = ((base + i) % (V // run_len)) * run_len
        out = dma_gather(ii, feat)
        s = jnp.sum(out) * 1e-20
        return carry + s, s

    secs = timed_scan(step)
    report(f"pallas DMA gather run_len={run_len} ({run_len*C*4}B/desc)", secs,
           useful_bytes=V * C * 4, n=N)


def bench_window_ref():
    """XLA windowed one-hot conv (ops/window_conv reference) vs the gather
    engine, on a realistic clustered 131k-voxel Waymo-grid scene."""
    from ..ops import window_conv as WC
    from ..ops.sparse_conv import (build_index_grid, gather_conv,
                                   subm_neighbor_table)
    from .profile_model import synth_voxels

    V = 131072
    C = 16
    grid = (41, 1504, 1504)
    _, coords_np = synth_voxels(V)
    coords = jnp.asarray(coords_np[0])
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(V, C).astype(np.float32))
    w_zyx = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)

    valid = jnp.all(coords >= 0, axis=-1)
    feats = feats * valid[:, None]

    # gather engine baseline (table amortized: conv only)
    table = build_index_grid(coords, valid, grid)
    nbr = subm_neighbor_table(coords, valid, table, grid)

    def step_g(carry, i):
        f = feats + carry * 1e-20 + i.astype(jnp.float32) * 1e-12
        out = gather_conv(f, nbr, w_zyx)
        s = jnp.sum(out) * 1e-20
        return carry + s, s

    report("gather engine conv (table amortized)", timed_scan(step_g, 2, 6),
           n=27 * V)

    w_dyx = WC.taps_zyx_to_dyx(w_zyx)
    for block, window in ((256, 512), (128, 384), (256, 768), (512, 512)):
        sf, sc, plan = WC.make_subm_plan(feats, coords, grid, block=block,
                                         window=window, resid_budget=2048)
        print(f"  plan block={block} window={window}: n_resid="
              f"{int(plan.n_resid)}", flush=True)

        from ..ops.pallas.window_kernel import window_pass_pallas

        if (block, window) == (256, 512):
            try:
                want = np.asarray(WC._window_pass_reference(sf, plan, w_dyx))
                got = np.asarray(window_pass_pallas(sf, plan, w_dyx))
                print(f"  pallas correct vs ref: "
                      f"{np.allclose(got, want, rtol=1e-3, atol=1e-3)} "
                      f"(maxerr {np.abs(got - want).max():.2e})", flush=True)
            except Exception as e:
                print(f"  pallas correctness check FAILED: "
                      f"{type(e).__name__}: {str(e)[:500]}", flush=True)

        for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
            def step_k(carry, i, sf=sf, plan=plan, dt=dt):
                f = sf + carry * 1e-20 + i.astype(jnp.float32) * 1e-12
                out = window_pass_pallas(f, plan, w_dyx, compute_dtype=dt)
                s = jnp.sum(out) * 1e-20
                return carry + s, s

            try:
                secs = timed_scan(step_k, 2, 6)
                report(f"window PALLAS conv blk={block} W={window} {tag}",
                       secs, n=27 * V)
            except Exception as e:
                print(f"  pallas blk={block} W={window} {tag} FAILED: "
                      f"{type(e).__name__}: {str(e)[:500]}", flush=True)



def bench_window_stages():
    """Per-stage cost of the windowed Pallas engine over the REAL flagship
    stage chain (active sets derived by actually downsampling a realistic
    150k-voxel scene): kernel ms/conv per residency mode, plan/active-set
    prep ms, residual counts. Drives the round-4 dense->sparse decision for
    conv2..extra (VERDICT r3 #1)."""
    from ..ops import window_conv as WC
    from ..ops.pallas.window_kernel import window_pass_pallas
    from .profile_model import synth_voxels

    rng = np.random.RandomState(0)
    grid = (41, 1504, 1504)
    _, coords_np = synth_voxels(150000)
    coords = jnp.asarray(coords_np[0])
    valid = jnp.all(coords >= 0, axis=-1)
    feats0 = jnp.asarray(rng.randn(150000, 16).astype(np.float32))
    feats0 = feats0 * valid[:, None]

    # stage chain: (name, Cin, budget_out for the NEXT downsample)
    chain = [
        ("conv1", 16, 320000, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
        ("conv2", 32, 210000, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
        ("conv3", 64, 90000, (2, 2, 2), (0, 1, 1), (3, 3, 3)),
        ("conv4", 128, 48000, (2, 1, 1), (0, 0, 0), (3, 1, 1)),
        ("extra", 128, None, None, None, None),
    ]
    windows = {"conv1": (384, 512), "conv2": (384, 512, 768),
               "conv3": (384, 512), "conv4": (384, 512), "extra": (384,)}

    feats, coords, lin = jax.vmap(
        lambda f, c: WC.sort_rows(f, c, grid))(feats0[None], coords[None])
    feats, coords, lin = feats[0], coords[0], lin[0]

    for (name, cin, bud, stride, pad, ksz) in chain:
        v = lin.shape[0]
        n_act = int(jnp.sum(lin < WC.MISS))
        print(f"--- {name}: grid={grid} V={v} active={n_act} C={cin} ---",
              flush=True)
        f = jnp.asarray(rng.randn(v, cin).astype(np.float32))
        f = f * (lin < WC.MISS)[:, None]
        w_dyx = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.1)

        for window in windows[name]:
            # plan build cost (shared by the whole stage: 4-5 convs)
            def step_p(carry, i, lin=lin, coords=coords, grid=grid,
                       window=window):
                l2 = jnp.where(lin < WC.MISS, lin + (i - i), lin)
                pl_ = WC.make_subm_plan_presorted(l2, coords, grid,
                                                  window=window,
                                                  resid_budget=1024)
                # consume every plan component so nothing is DCE'd
                s = (jnp.sum(pl_.ws) + jnp.sum(pl_.kbase)
                     + jnp.sum(pl_.resid_nbr) + pl_.n_resid
                     + jnp.sum(pl_.windowed)).astype(jnp.float32) * 1e-20 \
                    + carry * 1e-20
                return s, s

            plan = WC.make_subm_plan_presorted(lin, coords, grid,
                                               window=window,
                                               resid_budget=1024)
            print(f"  subm plan W={window}: n_resid={int(plan.n_resid)}",
                  flush=True)
            report(f"  subm plan build W={window}", timed_scan(step_p, 2, 6))

            for res in ("vmem", "hbm"):
                if res == "vmem" and v * cin * 2 > 2 ** 23 * 4:
                    continue  # >4 channel splits: not residency-eligible
                def step_k(carry, i, f=f, plan=plan, w=w_dyx, res=res):
                    ff = f + carry * 1e-20 + i.astype(jnp.float32) * 1e-12
                    out = window_pass_pallas(ff, plan, w, residency=res)
                    s = jnp.sum(out) * 1e-20
                    return carry + s, s

                try:
                    secs = timed_scan(step_k, 2, 6)
                    report(f"  kernel {res} W={window} bf16", secs, n=27 * v)
                except Exception as e:
                    print(f"  kernel {res} W={window} FAILED: "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)

        if bud is None:
            break
        # downsample to the next stage: active set + strided plan cost
        grid_out = tuple(
            (g + 2 * p_ - k_) // s_ + 1
            for g, p_, k_, s_ in zip(grid, pad, ksz, stride))

        def act(coords=coords, grid=grid, grid_out=grid_out, stride=stride,
                pad=pad, ksz=ksz, bud=bud):
            return WC.downsample_active_set_yxz(
                coords, jnp.all(coords >= 0, -1), grid, grid_out, stride,
                pad, ksz, bud)

        def step_a(carry, i):
            oc, ol = act()
            s = jnp.sum(ol).astype(jnp.float32) * 1e-20 + carry * 1e-20
            return s, s

        report(f"  downsample active set -> {bud}", timed_scan(step_a, 2, 6))
        oc, ol = jax.jit(act)()

        def step_s(carry, i, lin=lin, ol=ol, oc=oc):
            pl_ = WC.make_strided_plan(lin, ol, oc, grid, grid_out, stride,
                                       pad, ksz, window=512,
                                       resid_budget=1024)
            s = (jnp.sum(pl_.ws) + jnp.sum(pl_.kbase)
                 + jnp.sum(pl_.resid_nbr) + pl_.n_resid
                 + jnp.sum(pl_.windowed)).astype(jnp.float32) * 1e-20 \
                + carry * 1e-20
            return s, s

        report("  strided plan build W=512", timed_scan(step_s, 2, 6))
        splan = WC.make_strided_plan(lin, ol, oc, grid, grid_out, stride,
                                     pad, ksz, window=512, resid_budget=1024)
        print(f"  strided plan: n_resid={int(splan.n_resid)}", flush=True)
        cout = {"conv1": 32, "conv2": 64, "conv3": 128, "conv4": 128}[name]
        wd = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

        def step_d(carry, i, f=f, splan=splan, wd=wd):
            ff = f + carry * 1e-20 + i.astype(jnp.float32) * 1e-12
            out = window_pass_pallas(ff, splan, wd, ksize=ksz,
                                     residency="hbm")
            s = jnp.sum(out) * 1e-20
            return carry + s, s

        try:
            report("  strided kernel hbm W=512 bf16", timed_scan(step_d, 2, 6),
                   n=27 * bud)
        except Exception as e:
            print(f"  strided kernel FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

        grid = grid_out
        coords, lin = oc, ol
        nxt = int(jnp.sum(ol < WC.MISS))
        print(f"  -> next stage active={nxt} of budget {bud}", flush=True)


def timed_scan_args(step_fn, args, k1=2, k2=6, reps=3):
    """timed_scan with big operands passed as jit ARGUMENTS (the axon
    remote-compile tunnel embeds closure constants in the request body;
    multi-hundred-MB exports trip its length limit)."""

    def make(k):
        @jax.jit
        def run(i0, *a):
            def body(carry, i):
                return step_fn(carry, i, *a)
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   i0 + jnp.arange(k, dtype=jnp.int32))
            return jnp.sum(outs)
        return run

    def t(k):
        run = make(k)
        float(np.asarray(run(jnp.int32(0), *args)))
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(jnp.int32(r + 1), *args)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max((t(k2) - t(k1)) / (k2 - k1), 1e-9)


def bench_planek_stages():
    """On-chip cost of the ACTIVE-PLANE Pallas kernel (ops/plane_conv +
    ops/pallas/plane_block_kernel, (by, bx, z) rank order) at every
    flagship stage geometry, on the REAL downsample chain of a
    150k-voxel synthetic Waymo scene: active plane counts, window
    coverage vs (w0, wy), per-conv kernel ms (bf16), and the per-frame
    prep costs (plane set / state / plan). Drives the round-4 planek
    engine decision (VERDICT r3 next #1)."""
    from ..ops import plane_conv as PK
    from ..ops import window_conv as WC
    from .profile_model import synth_voxels

    rng = np.random.RandomState(0)
    grid = (41, 1504, 1504)
    _, coords_np = synth_voxels(150000)
    coords = jnp.asarray(coords_np[0])

    chain = [
        ("conv1", 16, 320000, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
        ("conv2", 32, 210000, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
        ("conv3", 64, 90000, (2, 2, 2), (0, 1, 1), (3, 3, 3)),
        ("conv4", 128, None, None, None, None),
    ]
    windows = {"conv1": [(128, 128), (96, 96), (160, 160)],
               "conv2": [(128, 128), (96, 96)],
               "conv3": [(128, 128), (96, 96)],
               "conv4": [(128, 128)]}

    for (name, cin, bud, stride, pad, ksz) in chain:
        cnp = np.asarray(coords)
        ok = (cnp >= 0).all(1)
        keys = np.unique(
            (cnp[ok, 0].astype(np.int64) * 10**8
             + (cnp[ok, 1] // 4) * 10**4 + cnp[ok, 2] // 4))
        n_planes = len(keys)
        budget = -(-(n_planes + 64) // 128) * 128
        t1p = PK.t1p_of(budget)
        print(f"--- {name}: grid={grid} V={int(ok.sum())} planes={n_planes} "
              f"budget={budget} t1p={t1p} C={cin} ---", flush=True)

        feats = jnp.asarray(
            rng.randn(len(cnp), cin).astype(np.float32)) * ok[:, None]
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.1)

        build = jax.jit(lambda c, f: _planek_build(PK, c, f, grid, budget,
                                                   t1p, cin))
        ts, state, mask = build(coords, feats)
        state = state.astype(jnp.bfloat16)
        print(f"  plane drop={int(ts.n_drop)}", flush=True)

        def step_build(carry, i, coords, feats):
            c2 = jnp.where(i >= 0, coords, 0)  # i is dynamic: no hoisting
            ts_, st_, mk_ = _planek_build(PK, c2, feats, grid, budget, t1p,
                                          cin)
            s = (jnp.sum(st_) * 1e-20 + jnp.sum(mk_).astype(jnp.float32)
                 * 1e-20 + carry * 1e-20)
            return s, s

        report("  plane set + state build",
               timed_scan_args(step_build, (coords, feats), 2, 6))

        for (w0, wy) in windows[name]:
            plan = jax.jit(
                lambda t: PK.make_plane_plan(t, t1p, w0=w0, wy=wy))(ts)
            print(f"  plan w0={w0} wy={wy}: miss={int(plan.n_miss)}",
                  flush=True)

            def step_plan(carry, i, ts):
                nb2 = jnp.where(i >= 0, ts.nbr, 0)
                p_ = PK.make_plane_plan(ts._replace(nbr=nb2), t1p, w0=w0,
                                        wy=wy)
                s = (jnp.sum(p_.ws) + p_.n_miss).astype(jnp.float32) \
                    * 1e-20 + carry * 1e-20
                return s, s

            report(f"  plan build w0={w0} wy={wy}",
                   timed_scan_args(step_plan, (ts,), 2, 6))

            exports = jax.jit(
                lambda s: PK.make_plane_exports(s, cin))(state)
            sc16, sh16 = PK.fold_epilogue(cin)
            mask16 = PK.expand_mask(mask, cin).astype(state.dtype)

            def step_k(carry, i, state, exports, plan, mask16):
                st = state + carry.astype(state.dtype) * 0 \
                    + i.astype(state.dtype) * jnp.asarray(1e-8, state.dtype)
                out, _ = PK.pk_subm_conv(
                    st, exports, plan, w, sc16, sh16, mask16,
                    relu=True, w0=w0, wy=wy, interpret=False)
                s = jnp.sum(out.astype(jnp.float32)) * 1e-20
                return carry + s, s

            try:
                secs = timed_scan_args(
                    step_k, (state, exports, plan, mask16), 2, 6)
                report(f"  planek conv w0={w0} wy={wy} bf16", secs,
                       flops=2 * 27 * int(ok.sum()) * cin * cin)
            except Exception as e:
                print(f"  planek conv FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)

        if bud is None:
            break
        grid_out = tuple((g + 2 * p_ - k_) // s_ + 1
                         for g, p_, k_, s_ in zip(grid, pad, ksz, stride))
        oc, _ = jax.jit(lambda c: WC.downsample_active_set_yxz(
            c, jnp.all(c >= 0, -1), grid, grid_out, stride, pad, ksz,
            bud))(coords)
        grid, coords = grid_out, oc


def bench_planek_chain():
    """End-to-end planek backbone prototype: conv2..conv4 as fused plane
    kernels with chunk-glue downsamples between stages (plane state ->
    chunk planes -> tile_planes.downsample -> next plane set/state) and
    the extra conv + BEV scatter at the end. conv1 and the conv1->conv2
    downsample stay on the window engine (conv1 planes hold ~1.3 of 16
    cells — measured 7.6 ms/conv planek vs 3.85 window); this suite
    starts from the conv1->conv2 active set and measures every piece the
    round-5 'plane' engine ships. All prep is sort-free (_compact_keys
    via occupancy cumsum)."""
    from ..ops import plane_conv as PK
    from ..ops import tile_planes as TP
    from ..ops import tile_conv as TLC
    from ..ops import window_conv as WC
    from .profile_model import synth_voxels

    rng = np.random.RandomState(0)
    grid1 = (41, 1504, 1504)
    _, coords_np = synth_voxels(150000)
    coords1 = jnp.asarray(coords_np[0])

    grid2 = tuple((g + 2 * p - k) // s + 1 for g, p, k, s in
                  zip(grid1, (1, 1, 1), (3, 3, 3), (2, 2, 2)))
    oc, _ = jax.jit(lambda c: WC.downsample_active_set_yxz(
        c, jnp.all(c >= 0, -1), grid1, grid2, (2, 2, 2), (1, 1, 1),
        (3, 3, 3), 320000))(coords1)

    # (name, grid, C, plane_budget, chunk tz, chunk budget,
    #  [down: pad, tz_out, chunk_budget_out, Cout])
    P2, P3, P4 = 80000 - 128, 26000 - 80, 6400 - 128
    cfg = [
        ("conv2", grid2, 32, P2, 4, 36000, ((1, 1, 1), 2, 14000, 64)),
        ("conv3", None, 64, P3, 2, 14000, ((0, 1, 1), 6, 2400, 128)),
        ("conv4", None, 128, P4, 6, 2400, None),
    ]

    dt = jnp.bfloat16
    grid = grid2
    state = mask = ts = None
    t1p = None

    # ---- conv2 entry: plane set + state from downsampled coords --------
    c2 = cfg[0][2]
    t1p = PK.t1p_of(P2)
    feats0 = jnp.asarray(rng.randn(oc.shape[0], c2).astype(np.float32))
    feats0 = (feats0 * jnp.all(oc >= 0, -1)[:, None]).astype(dt)

    def entry(coords, feats):
        ts, _ = PK.build_plane_set(coords, grid2, P2)
        st, mk = PK.build_plane_state(feats, coords, ts, grid2, t1p)
        return ts, st, mk

    jentry = jax.jit(entry)
    ts, state, mask = jentry(oc, feats0)
    print(f"  conv2 planes={int(ts.n_tiles)} drop={int(ts.n_drop)}",
          flush=True)

    def step_entry(carry, i, coords, feats):
        c2_ = jnp.where(i >= 0, coords, 0)
        ts_, st_, mk_ = entry(c2_, feats)
        s = (jnp.sum(st_.astype(jnp.float32)) * 1e-20
             + jnp.sum(mk_).astype(jnp.float32) * 1e-20 + carry * 1e-20)
        return s, s

    report("  conv2 plane set+state build (nosort)",
           timed_scan_args(step_entry, (oc, feats0), 2, 6))

    total = 0.0
    for si, (name, _, c, pbud, tzc, tbud, down) in enumerate(cfg):
        t1p = PK.t1p_of(pbud)
        if si > 0:
            print(f"  {name} planes={int(ts.n_tiles)} drop={int(ts.n_drop)}",
                  flush=True)
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.1)
        plan = jax.jit(lambda t: PK.make_plane_plan(t, t1p, w0=128,
                                                    wy=128))(ts)
        print(f"  {name} plan miss={int(plan.n_miss)}", flush=True)
        exports = jax.jit(lambda s: PK.make_plane_exports(s, c))(state)
        sc16, sh16 = PK.fold_epilogue(c)
        mask16 = PK.expand_mask(mask, c).astype(dt)

        def stage4(st, exp, plan, mask16, w=w, sc16=sc16, sh16=sh16):
            for _ in range(4):
                st, exp = PK.pk_subm_conv(st, exp, plan, w, sc16, sh16,
                                          mask16, relu=True, w0=128, wy=128,
                                          interpret=False)
            return st

        def step_stage(carry, i, st, exp, plan, mask16):
            stt = st + i.astype(st.dtype) * jnp.asarray(1e-8, st.dtype)
            out = stage4(stt, exp, plan, mask16)
            s = jnp.sum(out.astype(jnp.float32)) * 1e-20
            return carry + s, s

        secs = timed_scan_args(step_stage, (state, exports, plan, mask16),
                               2, 6)
        report(f"  {name} stage (4 fused convs)", secs)
        total += secs
        state = jax.jit(
            lambda st, exp, plan, mask16: stage4(st, exp, plan, mask16)
        )(state, exports, plan, mask16)

        if down is None:
            break
        pad, tz_out, tbud_out, cout = down
        wd = jnp.asarray(
            rng.randn(27, c, cout).astype(np.float32) * 0.1).astype(dt)
        grid_out = tuple((g + 2 * p - 3) // 2 + 1
                         for g, p in zip(grid, pad))
        pbud_out = cfg[si + 1][3]
        t1p_out = PK.t1p_of(pbud_out)

        def glue_down(st, mk, ts, wd, grid=grid, tzc=tzc, tbud=tbud,
                      pad=pad, tz_out=tz_out, tbud_out=tbud_out,
                      pbud_out=pbud_out, t1p_out=t1p_out, t1p=t1p):
            cts = PK.chunk_set_of_planes(ts, grid, tzc, tbud)
            pocs = PK.plane_ranks_of_chunks(cts, ts, grid, tzc, t1p - 1)
            pch = PK.plane_state_to_planes(st, pocs, tzc)
            mch = PK.plane_state_to_planes(
                mk.astype(st.dtype), pocs, tzc)[..., :1]
            # mask16 is 16-wide occupancy; rebuild (N, 4, 4, 1)
            mch = PK.plane_state_to_planes(
                mk.astype(st.dtype), pocs, tzc).reshape(
                -1, 4, 4, 1)
            yo, mo, tso, go, miss = TP.downsample(
                pch, mch, cts, grid, wd, (3, 3, 3), pad, tzc, tz_out,
                tbud_out, compute_dtype=None)
            pts = PK.plane_set_from_chunk_mask(mo, tso, go, tz_out,
                                               pbud_out)
            cr = PK.chunk_ranks_of_planes(pts, tso, go, tz_out, tbud_out)
            st2 = PK.planes_to_plane_state(yo, cr, t1p_out)
            mk2 = PK.planes_to_plane_state(mo, cr, t1p_out).reshape(
                t1p_out, 16)
            return pts, st2, mk2, miss

        jglue = jax.jit(glue_down)
        ts2, state2, mask2, miss = jglue(state, mask, ts, wd)
        print(f"  {name}_down miss={int(miss)}", flush=True)

        def step_down(carry, i, st, mk, ts, wd):
            stt = st + i.astype(st.dtype) * jnp.asarray(1e-8, st.dtype)
            _, st2, mk2, _ = glue_down(stt, mk, ts, wd)
            s = (jnp.sum(st2.astype(jnp.float32)) * 1e-20
                 + jnp.sum(mk2.astype(jnp.float32)) * 1e-20)
            return carry + s, s

        secs = timed_scan_args(step_down, (state, mask, ts, wd), 2, 6)
        report(f"  {name}_down glue+downsample", secs)
        total += secs
        ts, state, mask = ts2, state2, mask2
        grid = grid_out

    # ---- extra conv + BEV ----------------------------------------------
    wz = jnp.asarray(rng.randn(3, 128, 128).astype(np.float32) * 0.1)

    def extra(st, mk, ts, wz, grid=grid):
        tzc = 6
        cts = PK.chunk_set_of_planes(ts, grid, tzc, 2400)
        pocs = PK.plane_ranks_of_chunks(cts, ts, grid, tzc, st.shape[0] - 1)
        pch = PK.plane_state_to_planes(st, pocs, tzc)
        mch = PK.plane_state_to_planes(mk.astype(st.dtype), pocs,
                                       tzc).reshape(-1, 4, 4, 1)
        y, m = TP.zconv(pch, mch, wz.astype(st.dtype), grid[0], tzc)
        g4 = ((grid[0] - 3) // 2 + 1, grid[1], grid[2])
        dense = TLC.tiles_to_dense(y, cts, g4, y.shape[1])
        b, d, h, ww, cc = 1, *dense.shape
        return jnp.transpose(dense, (1, 2, 3, 0)).reshape(h, ww, cc * d)

    jextra = jax.jit(extra)
    bev = jextra(state, mask, ts, wz)
    print(f"  bev shape={bev.shape}", flush=True)

    def step_extra(carry, i, st, mk, ts, wz):
        stt = st + i.astype(st.dtype) * jnp.asarray(1e-8, st.dtype)
        out = extra(stt, mk, ts, wz)
        s = jnp.sum(out.astype(jnp.float32)) * 1e-20
        return carry + s, s

    secs = timed_scan_args(step_extra, (state, mask, ts, wz), 2, 6)
    report("  extra conv + BEV", secs)
    total += secs
    print(f"  == chain total (excl. conv1 + conv2 entry): "
          f"{total*1e3:.1f} ms ==", flush=True)


def _planek_build(PK, coords, feats, grid, budget, t1p, cin):
    ts, _ = PK.build_plane_set(coords, grid, budget)
    state, mask = PK.build_plane_state(feats, coords, ts, grid, t1p)
    return ts, state, mask


SUITES = {
    "planek_chain": bench_planek_chain,
    "window_ref": bench_window_ref,
    "planek_stages": bench_planek_stages,
    "window_stages": bench_window_stages,
    "gather": bench_gather,
    "scatter": bench_scatter,
    "matmul": bench_matmul,
    "conv": bench_conv,
    "sort": bench_sort,
    "pallas_take": bench_pallas_take,
    "pallas_onehot": bench_pallas_onehot,
    "pallas_dma": partial(bench_pallas_dma, 1),
    "pallas_run": lambda: [bench_pallas_dma(r) for r in (8, 64)],
}


def main():
    names = sys.argv[1:] or list(SUITES)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for n in names:
        print(f"--- {n} ---", flush=True)
        SUITES[n]()


if __name__ == "__main__":
    main()
