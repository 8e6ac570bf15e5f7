"""Pallas windowed-conv kernel vs the XLA reference (interpret mode on CPU;
the same pallas_call compiles via Mosaic on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops import window_conv as WC
from sparse2dense_tpu.ops.pallas.window_kernel import window_pass_pallas

from tests.test_window_conv import _clustered_scene, _pad


@pytest.mark.parametrize("block,window", [(128, 128), (128, 256)])
def test_window_pass_pallas_matches_reference(rng, block, window):
    grid = (8, 24, 24)
    feats, coords = _clustered_scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    fj = jnp.asarray(feats)
    cj = jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)
    sf, sc, plan = WC.make_subm_plan(fj * valid[:, None], cj, grid,
                                     block=block, window=window,
                                     resid_budget=512)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.2)
    want = np.asarray(WC._window_pass_reference(sf, plan, w))
    got = np.asarray(window_pass_pallas(sf, plan, w, interpret=True,
                                        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # bf16 window features (the TPU default): same structure, coarser tol
    got16 = np.asarray(window_pass_pallas(sf, plan, w, interpret=True))
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_allclose(got16 / scale, want / scale, atol=0.03)


def test_window_pass_pallas_channel_split(rng, monkeypatch):
    """Shrunk operand cap forces the channel-split path; result unchanged."""
    from sparse2dense_tpu.ops.pallas import window_kernel as wk

    grid = (8, 24, 24)
    feats, coords = _clustered_scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    fj = jnp.asarray(feats)
    cj = jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)
    sf, sc, plan = WC.make_subm_plan(fj * valid[:, None], cj, grid,
                                     block=128, window=128, resid_budget=512)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.2)
    want = np.asarray(window_pass_pallas(sf, plan, w, interpret=True,
                                         compute_dtype=jnp.float32))
    monkeypatch.setattr(wk, "OPERAND_BYTE_CAP", 384 * 4 * 4)  # -> 4 splits
    got = np.asarray(window_pass_pallas(sf, plan, w, interpret=True,
                                        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("window", [128, 256])
def test_window_pass_pallas_hbm_matches_reference(rng, window):
    """HBM-resident features + per-block rank-range DMA (the conv2+ mode):
    identical result to the whole-VMEM-resident path / XLA reference."""
    grid = (8, 24, 24)
    feats, coords = _clustered_scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    fj = jnp.asarray(feats)
    cj = jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)
    sf, sc, plan = WC.make_subm_plan(fj * valid[:, None], cj, grid,
                                     block=128, window=window,
                                     resid_budget=512)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.2)
    want = np.asarray(WC._window_pass_reference(sf, plan, w))
    got = np.asarray(window_pass_pallas(sf, plan, w, interpret=True,
                                        compute_dtype=jnp.float32,
                                        residency="hbm"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_pass_pallas_hbm_pruned_ksize(rng):
    """(3,1,1) extra-conv tap pruning through the HBM path."""
    grid = (8, 24, 24)
    feats, coords = _clustered_scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    fj = jnp.asarray(feats)
    cj = jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)
    sf, sc, plan = WC.make_subm_plan(fj * valid[:, None], cj, grid,
                                     block=128, window=128, resid_budget=512)
    w = jnp.zeros((27, 8, 6), np.float32)
    live = [dyi * 9 + 4 for dyi in range(3)]
    w = w.at[jnp.asarray(live)].set(
        jnp.asarray(rng.randn(3, 8, 6).astype(np.float32) * 0.2))
    want = np.asarray(WC._window_pass_reference(sf, plan, w))
    got = np.asarray(window_pass_pallas(sf, plan, w, ksize=(1, 3, 1),
                                        interpret=True,
                                        compute_dtype=jnp.float32,
                                        residency="hbm"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_pass_pallas_pruned_ksize(rng):
    """(3, 1, 1) downsample kernels run one tap per dy group; the dense-27
    weights carry zeros on dead taps so pruned == full-tap result."""
    grid = (8, 24, 24)
    feats, coords = _clustered_scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    fj = jnp.asarray(feats)
    cj = jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)
    sf, sc, plan = WC.make_subm_plan(fj * valid[:, None], cj, grid,
                                     block=128, window=128, resid_budget=512)
    w = jnp.zeros((27, 8, 6), np.float32)
    live = [dyi * 9 + 4 for dyi in range(3)]  # dx=dz=0 taps
    w = w.at[jnp.asarray(live)].set(
        jnp.asarray(rng.randn(3, 8, 6).astype(np.float32) * 0.2))
    want = np.asarray(WC._window_pass_reference(sf, plan, w))
    got = np.asarray(window_pass_pallas(sf, plan, w, ksize=(1, 3, 1),
                                        interpret=True,
                                        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
