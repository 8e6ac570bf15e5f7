"""Pallas windowed-conv kernel vs the XLA reference (interpret mode on CPU;
the same pallas_call compiles via Mosaic on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops import window_conv as WC
from sparse2dense_tpu.ops.pallas.window_kernel import window_pass_pallas

from tests.test_window_conv import _clustered_scene, _pad


@pytest.mark.parametrize("block,window", [(32, 128), (16, 64)])
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
    got = np.asarray(window_pass_pallas(sf, plan, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
