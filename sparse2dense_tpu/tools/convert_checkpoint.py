"""PyTorch -> JAX checkpoint converter.

Maps reference det3d state_dicts (CenterPoint/Sparse2Dense .pth files, cf.
reference tools/convert_voxelnet.py:35-80 for the key-remap precedent) onto
this framework's flax variable tree, for parity checks and fine-tuning.

Weight layout transforms:
- Conv2d  (out,in,kh,kw)        -> (kh,kw,in,out)
- Conv3d  (out,in,kd,kh,kw)     -> (kd,kh,kw,in,out)
- ConvTranspose2d (in,out,kh,kw)-> (kh,kw,in,out)
- Linear  (out,in)              -> (in,out)
- spconv  (kz,ky,kx,in,out)     -> (kz*ky*kx,in,out)  (tap order matches
  ops/sparse_conv._kernel_offsets: z-major)
- BatchNorm weight/bias -> params scale/bias; running_mean/var -> batch_stats

Name maps cover: VoxelFeatureExtractorV3 (no params), PillarFeatureNet,
PointPillarsScatter, SpMiddleResNetFHD, SpMiddleFHD, RPN, CenterHead,
MultiGroupHead. Unmatched keys are reported, not fatal (the reference's
strict=False behavior, torchie/trainer/checkpoint.py:146-199).
"""
from __future__ import annotations

import argparse
import re
from typing import Dict, Tuple

import numpy as np


def t_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def t_convt2d(w):
    # torch ConvTranspose2d is the conv gradient; flax ConvTranspose
    # (transpose_kernel=False) convolves the dilated input with the kernel
    # as-is, so the torch kernel must be spatially FLIPPED in addition to the
    # (in,out,kh,kw) -> (kh,kw,in,out) transpose (pinned by
    # tests/test_convert_golden.py::test_rpn_conversion_golden).
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def t_linear(w):
    return np.transpose(w, (1, 0))


def t_spconv(w):
    # (kz,ky,kx,in,out) -> (K,in,out); 1x1x1 and (3,1,1) kernels flatten the same way
    return np.reshape(w, (-1, w.shape[-2], w.shape[-1]))


def t_id(w):
    return w


def _bn_rules(torch_prefix, flax_path):
    """BN weight/bias/running stats for one norm layer."""
    return [
        (rf"^{torch_prefix}\.weight$", ("params",) + flax_path + ("scale",), t_id),
        (rf"^{torch_prefix}\.bias$", ("params",) + flax_path + ("bias",), t_id),
        (rf"^{torch_prefix}\.running_mean$",
         ("batch_stats",) + flax_path + ("mean",), t_id),
        (rf"^{torch_prefix}\.running_var$",
         ("batch_stats",) + flax_path + ("var",), t_id),
    ]


def rules_for_model(model_cfg: dict, module_prefix: str = ""):
    """Build (regex, flax_path_template, transform) rules for a detector cfg.
    Paths use {N} backreferences filled from the regex groups."""
    rules = []
    p = module_prefix

    def add(pat, path, tf=t_id):
        rules.append((re.compile("^" + p + pat + "$"), path, tf))

    reader = model_cfg.get("reader", {}).get("type")
    if reader == "PillarFeatureNet":
        add(r"reader\.pfn_layers\.(\d+)\.linear\.weight",
            ("params", "reader", "pfn_{0}", "linear", "kernel"), t_linear)
        add(r"reader\.pfn_layers\.(\d+)\.norm\.weight",
            ("params", "reader", "pfn_{0}", "norm", "scale"))
        add(r"reader\.pfn_layers\.(\d+)\.norm\.bias",
            ("params", "reader", "pfn_{0}", "norm", "bias"))
        add(r"reader\.pfn_layers\.(\d+)\.norm\.running_mean",
            ("batch_stats", "reader", "pfn_{0}", "norm", "mean"))
        add(r"reader\.pfn_layers\.(\d+)\.norm\.running_var",
            ("batch_stats", "reader", "pfn_{0}", "norm", "var"))

    backbone = model_cfg.get("backbone", {}).get("type")
    if backbone == "SpMiddleResNetFHD":
        add(r"backbone\.conv_input\.0\.weight",
            ("params", "backbone", "conv_input", "conv_0_kernel"), t_spconv)
        for n in _bn_rules("backbone\\.conv_input\\.1",
                           ("backbone", "conv_input", "norm_0")):
            rules.append((re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
        # residual stages: torch conv{s}.{b} blocks; strided head inside conv2..4
        for s, ours_down, ours_blocks, blk_base in (
            (1, None, ("conv1_0", "conv1_1"), 0),
            (2, "conv2_down", ("conv2_0", "conv2_1"), 3),
            (3, "conv3_down", ("conv3_0", "conv3_1"), 3),
            (4, "conv4_down", ("conv4_0", "conv4_1"), 3),
        ):
            if ours_down:
                add(rf"backbone\.conv{s}\.0\.weight",
                    ("params", "backbone", ours_down, "conv_kernel"), t_spconv)
                for n in _bn_rules(rf"backbone\.conv{s}\.1",
                                   ("backbone", ours_down, "norm")):
                    rules.append((re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
            for bi, ours in enumerate(ours_blocks):
                tb = blk_base + bi
                for cv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
                    add(rf"backbone\.conv{s}\.{tb}\.{cv}\.weight",
                        ("params", "backbone", ours, f"{cv}_kernel"), t_spconv)
                    add(rf"backbone\.conv{s}\.{tb}\.{cv}\.bias",
                        ("params", "backbone", ours, f"{cv}_bias"))
                    for n in _bn_rules(rf"backbone\.conv{s}\.{tb}\.{bn}",
                                       ("backbone", ours, bn)):
                        rules.append(
                            (re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
        add(r"backbone\.extra_conv\.0\.weight",
            ("params", "backbone", "extra_conv", "conv_kernel"), t_spconv)
        for n in _bn_rules("backbone\\.extra_conv\\.1",
                           ("backbone", "extra_conv", "norm")):
            rules.append((re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))

    neck = model_cfg.get("neck", {}).get("type")
    if neck in ("RPN", "S2D_RPN"):
        layer_nums = model_cfg["neck"]["layer_nums"]
        # blocks.{i}: [ZeroPad, Conv, BN, ReLU, (Conv, BN, ReLU?)*layer_num]
        add(r"neck\.blocks\.(\d+)\.1\.weight",
            ("params", "neck", "block_{0}", "down", "conv", "kernel"), t_conv2d)
        for n in _bn_rules(r"neck\.blocks\.(\d+)\.2",
                           ("neck", "block_{0}", "down", "norm")):
            rules.append((re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
        for i, ln in enumerate(layer_nums):
            for j in range(ln):
                ci, bi_ = 4 + 3 * j, 5 + 3 * j
                add(rf"neck\.blocks\.{i}\.{ci}\.weight",
                    ("params", "neck", f"block_{i}", f"conv_{j}", "conv", "kernel"),
                    t_conv2d)
                for n in _bn_rules(rf"neck\.blocks\.{i}\.{bi_}",
                                   ("neck", f"block_{i}", f"conv_{j}", "norm")):
                    rules.append(
                        (re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
        us = model_cfg["neck"].get("us_layer_strides", [])
        for k, stride in enumerate(us):
            tf = t_convt2d if stride > 1 else t_conv2d
            add(rf"neck\.deblocks\.{k}\.0\.weight",
                ("params", "neck", f"deblock_{k}", "up", "conv", "kernel"), tf)
            for n in _bn_rules(rf"neck\.deblocks\.{k}\.1",
                               ("neck", f"deblock_{k}", "up", "norm")):
                rules.append((re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))

    head = model_cfg.get("bbox_head", {}).get("type")
    if head == "CenterHead":
        add(r"bbox_head\.shared_conv\.0\.weight",
            ("params", "bbox_head", "shared_conv", "kernel"), t_conv2d)
        add(r"bbox_head\.shared_conv\.0\.bias",
            ("params", "bbox_head", "shared_conv", "bias"))
        for n in _bn_rules(r"bbox_head\.shared_conv\.1",
                           ("bbox_head", "shared_bn")):
            rules.append((re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
        # SepHead sequentials: [Conv, BN, ReLU]*(num_conv-1) + Conv
        common = dict(model_cfg["bbox_head"].get("common_heads", {}))
        heads = dict(common)
        heads["hm"] = (0, model_cfg["bbox_head"].get("num_hm_conv", 2))
        for hname, (_, num_conv) in heads.items():
            for j in range(num_conv - 1):
                ci, bi_ = 3 * j, 3 * j + 1
                add(rf"bbox_head\.tasks\.(\d+)\.{hname}\.{ci}\.weight",
                    ("params", "bbox_head", "task_{0}", f"{hname}_conv_{j}",
                     "kernel"), t_conv2d)
                add(rf"bbox_head\.tasks\.(\d+)\.{hname}\.{ci}\.bias",
                    ("params", "bbox_head", "task_{0}", f"{hname}_conv_{j}",
                     "bias"))
                for n in _bn_rules(
                    rf"bbox_head\.tasks\.(\d+)\.{hname}\.{bi_}",
                    ("bbox_head", "task_{0}", f"{hname}_bn_{j}"),
                ):
                    rules.append(
                        (re.compile(n[0].replace("^", "^" + p)), n[1], n[2]))
            last = 3 * (num_conv - 1)
            add(rf"bbox_head\.tasks\.(\d+)\.{hname}\.{last}\.weight",
                ("params", "bbox_head", "task_{0}", f"{hname}_out", "kernel"),
                t_conv2d)
            add(rf"bbox_head\.tasks\.(\d+)\.{hname}\.{last}\.bias",
                ("params", "bbox_head", "task_{0}", f"{hname}_out", "bias"))
    elif head == "MultiGroupHead":
        for part, ours in (("conv_box", "conv_box"), ("conv_cls", "conv_cls"),
                           ("conv_dir", "conv_dir")):
            add(rf"bbox_head\.tasks\.(\d+)\.{part}\.weight",
                ("params", "bbox_head", "task_{0}_" + ours, "kernel"), t_conv2d)
            add(rf"bbox_head\.tasks\.(\d+)\.{part}\.bias",
                ("params", "bbox_head", "task_{0}_" + ours, "bias"))
    return rules


def convert_state_dict(state_dict: Dict[str, np.ndarray], model_cfg: dict):
    """torch state_dict -> nested {collection: {path: array}} updates +
    list of unmatched torch keys."""
    rules = rules_for_model(dict(model_cfg))
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    unmatched = []
    for key, val in state_dict.items():
        key = key.removeprefix("module.")
        val = np.asarray(val)
        hit = False
        for pat, path_tpl, tf in rules:
            m = pat.match(key)
            if m:
                path = tuple(
                    seg.format(*m.groups()) if "{" in seg else seg
                    for seg in path_tpl
                )
                out[path] = tf(val)
                hit = True
                break
        if not hit and not key.endswith("num_batches_tracked"):
            unmatched.append(key)
    nested: dict = {}
    for path, val in out.items():
        d = nested
        for seg in path[:-1]:
            d = d.setdefault(seg, {})
        d[path[-1]] = val
    return nested, unmatched


def apply_to_variables(variables, nested, logger=None):
    """Merge converted arrays into a flax variables dict by path, checking
    shapes (strict=False semantics)."""
    import jax

    flat_v = {jax.tree_util.keystr(k): (k, v) for k, v in
              jax.tree_util.tree_flatten_with_path(variables)[0]}
    flat_n = jax.tree_util.tree_flatten_with_path(nested)[0]
    updates = dict(flat_v)
    applied, skipped = 0, []
    for k, v in flat_n:
        ks = jax.tree_util.keystr(k)
        if ks in flat_v and np.shape(flat_v[ks][1]) == np.shape(v):
            updates[ks] = (flat_v[ks][0], np.asarray(v, flat_v[ks][1].dtype)
                           if hasattr(flat_v[ks][1], "dtype") else v)
            applied += 1
        else:
            skipped.append(ks)
    if logger:
        logger.info(f"converter: applied {applied}, skipped {len(skipped)}")
    leaves = [updates[jax.tree_util.keystr(k)][1]
              for k, _ in jax.tree_util.tree_flatten_with_path(variables)[0]]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(variables), leaves
    ), skipped


def main():
    p = argparse.ArgumentParser(description="Convert a det3d .pth to orbax")
    p.add_argument("config")
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--model_key", default="S_model")
    args = p.parse_args()

    import logging

    import jax
    import torch

    from ..utils import Config
    from ..models import build_detector
    from ..training.checkpoint import save_checkpoint
    from ..training.synthetic import make_batch

    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("convert")
    cfg = Config.fromfile(args.config)
    model_cfg = cfg[args.model_key]
    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()}

    model = build_detector(model_cfg, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.get("voxel_generator"))
    mv = cfg.voxel_generator["max_voxel_num"]
    sample = make_batch(cfg, 1, max_voxels=mv[0] if isinstance(mv, list) else mv,
                        n_points=500, with_targets=False)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    nested, unmatched = convert_state_dict(state_dict, model_cfg)
    if unmatched:
        logger.warning(f"{len(unmatched)} torch keys unmatched, e.g. "
                       f"{unmatched[:5]}")
    variables, skipped = apply_to_variables(variables, nested, logger)
    save_checkpoint(args.out_dir, "converted", dict(variables),
                    meta={"source": args.torch_ckpt})
    logger.info(f"saved converted checkpoint to {args.out_dir}/converted")


if __name__ == "__main__":
    main()
