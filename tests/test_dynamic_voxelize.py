"""On-device dynamic voxelization vs the host parity voxelizer."""
import numpy as np
import jax.numpy as jnp

from sparse2dense_tpu.ops.voxelize import VoxelGenerator
from sparse2dense_tpu.ops.dynamic_voxelize import (
    dynamic_pillar_features,
    dynamic_voxelize_mean,
    scatter_max_to_canvas,
)

VS = [0.5, 0.5, 0.25]
PC = [-8.0, -8.0, -2.0, 8.0, 8.0, 4.0]


def _cloud(rng, n=500):
    pts = rng.uniform(-7.5, 7.5, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 3.5, size=n)
    extra = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    return np.concatenate([pts, extra], axis=1)


def test_mean_voxelization_matches_host(rng):
    pts = _cloud(rng)
    gen = VoxelGenerator(VS, PC, max_num_points=64, max_voxels=4096)
    v, c, npts = gen.generate(pts)
    host = {
        tuple(cc): vv[:nn].mean(0)
        for vv, cc, nn in zip(v, c, npts)
    }

    feats, coords, valid = dynamic_voxelize_mean(
        jnp.asarray(pts), jnp.ones(len(pts), bool), VS, PC[:6],
        gen.grid_size, max_voxels=4096,
    )
    feats, coords, valid = map(np.asarray, (feats, coords, valid))
    dev = {tuple(cc): ff for cc, ff, vv in zip(coords, feats, valid) if vv}
    assert set(dev) == set(host)
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], rtol=1e-5, atol=1e-5)


def test_mean_voxelization_budget_overflow(rng):
    pts = _cloud(rng, 400)
    gen = VoxelGenerator(VS, PC, max_num_points=64, max_voxels=100000)
    _, c, _ = gen.generate(pts)
    n_cells = len(c)
    budget = n_cells // 2
    feats, coords, valid = dynamic_voxelize_mean(
        jnp.asarray(pts), jnp.ones(len(pts), bool), VS, PC, gen.grid_size,
        max_voxels=budget,
    )
    assert int(np.asarray(valid).sum()) == budget
    # kept cells are the lowest linear ids (deterministic drop)
    coords = np.asarray(coords)[np.asarray(valid)]
    gx, gy = gen.grid_size[0], gen.grid_size[1]
    lin = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    assert (np.sort(lin) == lin).all()


def test_pillar_features_and_canvas(rng):
    pts = _cloud(rng, 300)
    grid = [32, 32, 1]
    feats, flat, ok = dynamic_pillar_features(
        jnp.asarray(pts), jnp.ones(len(pts), bool), [0.5, 0.5, 6.0], PC, grid
    )
    feats = np.asarray(feats)
    assert feats.shape == (300, 10)  # 5 raw + 3 cluster + 2 center
    # cluster offsets sum to ~0 within each pillar
    flat = np.asarray(flat)
    for cell in np.unique(flat[np.asarray(ok)])[:10]:
        sel = flat == cell
        np.testing.assert_allclose(feats[sel, 5:8].sum(0), 0, atol=1e-3)
    # center offsets bounded by half a voxel
    assert np.abs(feats[np.asarray(ok), 8:10]).max() <= 0.25 + 1e-5

    canvas = np.asarray(scatter_max_to_canvas(
        jnp.asarray(feats), jnp.asarray(flat), 32, 32))
    assert canvas.shape == (32, 32, 10)
    occupied = np.unique(flat[np.asarray(ok)])
    got = np.where(np.abs(canvas).reshape(-1, 10).max(-1) > 0)[0]
    assert set(got) <= set(occupied.tolist())
