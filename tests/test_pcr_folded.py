"""z-FOLDED PCR parity: the folded (B, H, W, D*C) PCR modules and loss
(models/necks/s2d_rpn.py, models/detectors/kd.py) must match the 5D NDHWC
formulation bit-for-bit in math and parameter tree. The 5D oracles are the
original module classes (Conv3dBNAct/ConvT3dBNRelu/nn.Conv), still used by
the pillar path; reference semantics: det3d/models/necks/rpn.py:263-337 and
det3d/models/detectors/voxelnet.py:171-185.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from sparse2dense_tpu.models.necks.s2d_rpn import (
    Conv3dBNAct, ConvT3dBNRelu, FoldedConv1x1, FoldedConv3dBNAct,
    FoldedConvT3dBNRelu,
)
from sparse2dense_tpu.models.detectors.kd import (
    mask_offset_loss, mask_offset_loss_folded, rasterize_mean_points,
    rasterize_pcr_targets_folded, world_grid,
)


def fold(x5d):
    """(B, D, H, W, C) -> (B, H, W, D*C) z-major."""
    b, d, h, w, c = x5d.shape
    return jnp.transpose(x5d, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)


def unfold(xf, d):
    b, h, w, dc = xf.shape
    return jnp.transpose(xf.reshape(b, h, w, d, dc // d), (0, 3, 1, 2, 4))


def rand5d(rng, b, d, h, w, c):
    return jnp.asarray(rng.randn(b, d, h, w, c).astype(np.float32))


def test_folded_1x1_matches_conv3d():
    rng = np.random.RandomState(0)
    x = rand5d(rng, 2, 5, 6, 7, 16)
    ref = Conv3dBNAct(8)
    v = ref.init(jax.random.PRNGKey(1), x, True)
    fol = FoldedConv3dBNAct(8, d=5)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        y_ref = ref.apply(v, x, train, **kw)
        y_f = fol.apply(v, fold(x), train, **kw)
        if train:
            (y_ref, st_ref), (y_f, st_f) = y_ref, y_f
            for k in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(st_f["batch_stats"]["norm"][k]),
                    np.asarray(st_ref["batch_stats"]["norm"][k]),
                    rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(fold(y_ref)),
                                   rtol=1e-4, atol=1e-5)


def test_folded_tconv_matches_convtranspose():
    rng = np.random.RandomState(1)
    x = rand5d(rng, 2, 5, 6, 7, 12)
    ref = ConvT3dBNRelu(9)
    v = ref.init(jax.random.PRNGKey(2), x, True)
    fol = FoldedConvT3dBNRelu(9, d=5)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        y_ref = ref.apply(v, x, train, **kw)
        y_f = fol.apply(v, fold(x), train, **kw)
        if train:
            (y_ref, st_ref), (y_f, st_f) = y_ref, y_f
            for k in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(st_f["batch_stats"]["norm"][k]),
                    np.asarray(st_ref["batch_stats"]["norm"][k]),
                    rtol=1e-5, atol=1e-6)
        assert y_f.shape == (2, 12, 14, 10 * 9)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(fold(y_ref)),
                                   rtol=1e-4, atol=1e-5)


def test_folded_head_matches_nn_conv():
    rng = np.random.RandomState(2)
    x = rand5d(rng, 2, 10, 5, 5, 16)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(3, (1, 1, 1), name="head")(x)

    class FHead(nn.Module):
        @nn.compact
        def __call__(self, xf):
            return FoldedConv1x1(3, d=10, name="head")(xf)

    ref = Head()
    v = ref.init(jax.random.PRNGKey(3), x)
    y_ref = ref.apply(v, x)
    y_f = FHead().apply(v, fold(x))
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(fold(y_ref)),
                               rtol=1e-4, atol=1e-5)


def _synth_voxels(rng, b, v, d, h, w, c, n_pts=4):
    coords = np.stack([
        rng.randint(0, d, (b, v)), rng.randint(0, h, (b, v)),
        rng.randint(0, w, (b, v))], -1).astype(np.int32)
    # dedupe cells within each sample (the voxelizer guarantees uniqueness)
    for i in range(b):
        lin = (coords[i, :, 0] * h + coords[i, :, 1]) * w + coords[i, :, 2]
        _, first = np.unique(lin, return_index=True)
        dup = np.setdiff1d(np.arange(v), first)
        coords[i, dup] = -1
    coords[:, -3:] = -1  # padding rows
    voxels = rng.randn(b, v, n_pts, c).astype(np.float32)
    nump = rng.randint(1, n_pts + 1, (b, v)).astype(np.int32)
    for i in range(b):
        for j in range(v):
            voxels[i, j, nump[i, j]:] = 0
    return jnp.asarray(voxels), jnp.asarray(nump), jnp.asarray(coords)


def test_mask_offset_loss_folded_parity():
    rng = np.random.RandomState(3)
    b, d, h, w = 2, 6, 10, 12
    pc_range = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
    voxels, nump, coords = _synth_voxels(rng, b, 50, d, h, w, 5)
    go5 = rand5d(rng, b, d, h, w, 3)
    gm5 = rand5d(rng, b, d, h, w, 1)

    gt = rasterize_mean_points(voxels, nump, coords, (d, h, w))
    grid = world_grid((d, h, w), pc_range)
    want_m, want_o = mask_offset_loss(go5, gm5, gt, grid)

    gt_off, occ = rasterize_pcr_targets_folded(
        voxels, nump, coords, (d, h, w), pc_range)
    got_m, got_o = mask_offset_loss_folded(
        fold(go5), fold(gm5)[..., :], gt_off, occ)
    np.testing.assert_allclose(float(got_m), float(want_m), rtol=1e-5)
    np.testing.assert_allclose(float(got_o), float(want_o), rtol=1e-5)


def test_pcr_full_folded_matches_5d_oracle():
    """The folded S2D_RPN._pcr vs an inline re-statement of the original 5D
    formulation, on the SAME parameter tree (names/shapes interchange)."""
    from sparse2dense_tpu.models.necks.s2d_rpn import ConvBNGelu, S2D_RPN

    class Oracle(nn.Module):
        @nn.compact
        def __call__(self, f_s_b, train):
            b, h, w, _ = f_s_b.shape
            gen = ConvBNGelu(640, kernel=1, padding=0, name="out_conv")(
                f_s_b, train)
            gen = gen.reshape(b, h, w, 128, 5)
            gen = jnp.transpose(gen, (0, 4, 1, 2, 3))
            gen = Conv3dBNAct(32, name="generator_1a")(gen, train)
            gen = ConvT3dBNRelu(32, name="generator_1b")(gen, train)
            go4 = nn.Conv(3, (1, 1, 1), name="gen_out_4")(gen)
            gm4 = nn.Conv(1, (1, 1, 1), name="gen_mask_4")(gen)
            gen = Conv3dBNAct(16, name="generator_2a")(gen, train)
            gen = ConvT3dBNRelu(3, name="generator_2b")(gen, train)
            go2 = nn.Conv(3, (1, 1, 1), name="gen_out_2")(gen)
            gm2 = nn.Conv(1, (1, 1, 1), name="gen_mask_2")(gen)
            return go2, gm2, go4, gm4

    class Folded(nn.Module):
        @nn.compact
        def __call__(self, f_s_b, train):
            return S2D_RPN._pcr(self, f_s_b, f_s_b, train)

    # borrow S2D_RPN._pcr unbound: Folded needs axis_name attr
    Folded.axis_name = None

    rng = np.random.RandomState(4)
    f_s_b = jnp.asarray(rng.randn(1, 4, 4, 256).astype(np.float32))
    oracle = Oracle()
    v = oracle.init(jax.random.PRNGKey(5), f_s_b, True)
    folded = Folded()
    v_f = folded.init(jax.random.PRNGKey(5), f_s_b, True)
    assert (jax.tree_util.tree_structure(v_f["params"])
            == jax.tree_util.tree_structure(v["params"]))
    same_shapes = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, v_f["params"], v["params"])
    assert all(jax.tree_util.tree_leaves(same_shapes))

    out_ref = oracle.apply(v, f_s_b, True, mutable=["batch_stats"])[0]
    out_f = folded.apply(v, f_s_b, True, mutable=["batch_stats"])[0]
    for got, want, d in zip(out_f, out_ref, (20, 20, 10, 10)):
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(fold(want)),
                                   rtol=2e-4, atol=2e-5)
