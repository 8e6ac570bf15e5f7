"""Torch->JAX checkpoint converter: the rule map must cover the full flax
parameter tree of the pillar and voxelnet models (reader/backbone/neck/head),
with correct layout transposes."""
import os

import numpy as np
import jax
import pytest

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.training.synthetic import make_batch
from sparse2dense_tpu.tools.convert_checkpoint import (
    apply_to_variables,
    convert_state_dict,
    rules_for_model,
)

HERE = os.path.dirname(__file__)


def _inverse_torch_shape(path_str, flax_arr):
    """Given a flax leaf, the torch tensor shape that should map onto it."""
    s = flax_arr.shape
    if path_str.endswith("['kernel']"):
        if "linear" in path_str:
            return (s[1], s[0])  # torch Linear (out,in)
        if len(s) == 4:
            if "deblock" in path_str and s[0] == s[1] and "up" in path_str:
                # may be ConvTranspose (in,out,kh,kw) — handled by caller
                pass
            return (s[3], s[2], s[0], s[1])  # Conv2d (out,in,kh,kw)
    if "_kernel" in path_str:  # spconv (K,ci,co) -> (kz,ky,kx,ci,co)
        k = s[0]
        if k == 27:
            return (3, 3, 3, s[1], s[2])
        if k == 3:
            return (3, 1, 1, s[1], s[2])
        return (1, 1, k, s[1], s[2])
    return s


def _fake_torch_key(rule_pat, groups=("0",)):
    """Materialize one torch key from a rule regex (fill backrefs)."""
    pat = rule_pat.pattern.strip("^$")
    out = pat.replace(r"(\d+)", "{}").replace("\\", "")
    return out.format(*groups[: out.count("{}")])


@pytest.mark.parametrize("cfg_name,expect_min_applied", [
    ("pp_tiny.py", 60),
    ("voxelnet_tiny.py", 100),
])
def test_full_coverage(cfg_name, expect_min_applied):
    cfg = Config.fromfile(os.path.join(HERE, "..", "configs", "tests", cfg_name))
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.get("voxel_generator"))
    batch = make_batch(cfg, 1, max_voxels=64, n_points=200, n_obj=2,
                       with_targets=False)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = jax.tree.map(np.asarray, dict(variables))

    # build a synthetic torch state_dict: one tensor per rule, shaped by
    # inverting the transform against the flax target leaf
    rules = rules_for_model(dict(cfg.S_model))
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(variables)[0]}

    n_tasks = 1
    groups_to_try = [(str(t),) for t in range(n_tasks)] + [
        (str(i),) for i in range(4)
    ]
    state_dict = {}
    for pat, path_tpl, tf in rules:
        for groups in groups_to_try:
            try:
                key = _fake_torch_key(pat, groups)
            except Exception:
                continue
            path = tuple(seg.format(*groups) if "{" in seg else seg
                         for seg in path_tpl)
            ks = "".join(f"['{s}']" for s in path)
            if ks not in flat or key in state_dict:
                continue
            tshape = _inverse_torch_shape(ks, flat[ks])
            rng = np.random.RandomState(abs(hash(key)) % 2**31)
            w = rng.randn(*tshape).astype(np.float32)
            # verify transform produces the flax shape
            if "deblock" in ks and w.ndim == 4:
                # ConvTranspose2d stores (in,out,kh,kw); rebuild accordingly
                s = flat[ks].shape
                w = rng.randn(s[2], s[3], s[0], s[1]).astype(np.float32) \
                    if tf.__name__ == "t_convt2d" else w
            assert tf(w).shape == flat[ks].shape, (key, ks, w.shape)
            state_dict[key] = w

    nested, unmatched = convert_state_dict(state_dict, cfg.S_model)
    assert unmatched == []
    new_vars, skipped = apply_to_variables(variables, nested)
    assert skipped == []
    applied = sum(
        1 for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(new_vars)[0],
        )
        if not np.array_equal(np.asarray(a), np.asarray(b))
    )
    assert applied >= expect_min_applied, applied

    # every PARAM leaf must be covered by some rule (batch_stats mean/var too)
    covered = {
        "".join(f"['{s}']" for s in
                tuple(seg.format(*g) if "{" in seg else seg for seg in tpl))
        for pat, tpl, _ in rules for g in groups_to_try
    }
    uncovered = [k for k in flat if k not in covered]
    assert uncovered == [], uncovered[:10]
