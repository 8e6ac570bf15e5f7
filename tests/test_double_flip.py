"""Double-flip TTA merge: if the 4 batch variants are exact flip-transforms
of the same underlying prediction, the merge must recover it."""
import numpy as np
import jax.numpy as jnp

from sparse2dense_tpu.models.heads.center_head import merge_double_flip


def _make_variants(rng, h=8, w=8):
    """variant 0 maps + the yflip/xflip/double variants a perfectly
    equivariant network would produce for flipped inputs."""
    base = {
        "hm": rng.rand(1, h, w, 3).astype(np.float32),
        "height": rng.randn(1, h, w, 1).astype(np.float32),
        "dim": rng.randn(1, h, w, 3).astype(np.float32),
        "reg": rng.rand(1, h, w, 2).astype(np.float32),
        "rot": rng.randn(1, h, w, 2).astype(np.float32),
        "vel": rng.randn(1, h, w, 2).astype(np.float32),
    }
    variants = [dict(base)]

    # yflip (y=-y): map flipped along H; reg_y -> 1-reg_y; sin same, cos -> -cos;
    # vel_y -> -vel_y
    v1 = {k: np.flip(v, axis=1).copy() for k, v in base.items()}
    v1["reg"][..., 1] = 1 - v1["reg"][..., 1]
    v1["rot"][..., 1] *= -1
    v1["vel"][..., 1] *= -1
    variants.append(v1)

    # xflip (x=-x): flipped along W; reg_x -> 1-reg_x; sin -> -sin; vel_x -> -vel_x
    v2 = {k: np.flip(v, axis=2).copy() for k, v in base.items()}
    v2["reg"][..., 0] = 1 - v2["reg"][..., 0]
    v2["rot"][..., 0] *= -1
    v2["vel"][..., 0] *= -1
    variants.append(v2)

    # double flip: both
    v3 = {k: np.flip(v, axis=(1, 2)).copy() for k, v in base.items()}
    v3["reg"][..., 0] = 1 - v3["reg"][..., 0]
    v3["reg"][..., 1] = 1 - v3["reg"][..., 1]
    v3["rot"] *= -1
    v3["vel"] *= -1
    variants.append(v3)

    stacked = {
        k: jnp.asarray(np.concatenate([v[k] for v in variants], axis=0))
        for k in base
    }
    return base, stacked


def test_merge_recovers_base(rng):
    base, stacked = _make_variants(rng)
    merged = merge_double_flip(stacked)
    for k in ("hm", "height", "dim", "reg", "vel", "rot"):
        np.testing.assert_allclose(
            np.asarray(merged[k])[0], base[k][0], rtol=1e-5, atol=1e-5,
        )
