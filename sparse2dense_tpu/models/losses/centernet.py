"""CenterNet losses in JAX (reference: det3d/models/losses/centernet_loss.py).

Layout convention: feature maps are NHWC (TPU-native), targets are the static
(B, max_objs) index/mask/cat arrays produced by the AssignLabel pipeline
stage. All ops are branch-free so they jit and differentiate cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp


def gather_feat_nhwc(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather per-object vectors from an NHWC map by flat H*W index.

    feat: (B, H, W, C); ind: (B, M) int -> (B, M, C).
    Equivalent to the reference's _transpose_and_gather_feat
    (det3d/core/utils/center_utils.py:66-80) without the NCHW transpose.
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, ind[..., None], axis=1)


def fast_focal_loss(
    out: jnp.ndarray,
    target: jnp.ndarray,
    ind: jnp.ndarray,
    mask: jnp.ndarray,
    cat: jnp.ndarray,
) -> jnp.ndarray:
    """CornerNet-style focal loss on an already-sigmoided heatmap.

    out/target: (B, H, W, C) in [0, 1]; ind/mask/cat: (B, M).
    Matches reference centernet_loss.py:26-54: negatives weighted by
    (1-target)^4 over the whole map, positives gathered at object centers.
    """
    mask = mask.astype(out.dtype)
    gt_weight = jnp.power(1.0 - target, 4)
    neg_loss = jnp.sum(jnp.log(1.0 - out) * jnp.square(out) * gt_weight)

    pos_pred_pix = gather_feat_nhwc(out, ind)  # (B, M, C)
    pos_pred = jnp.take_along_axis(pos_pred_pix, cat[..., None], axis=2)[..., 0]
    num_pos = jnp.sum(mask)
    pos_loss = jnp.sum(jnp.log(pos_pred) * jnp.square(1.0 - pos_pred) * mask)

    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss(
    output: jnp.ndarray,
    mask: jnp.ndarray,
    ind: jnp.ndarray,
    target: jnp.ndarray,
) -> jnp.ndarray:
    """Masked L1 on gathered center features, per-dim (reference :6-24).

    output: (B, H, W, D); target: (B, M, D). Returns (D,) loss vector
    normalized by number of positives.
    """
    pred = gather_feat_nhwc(output, ind)  # (B, M, D)
    m = mask.astype(output.dtype)[..., None]
    l1 = jnp.abs(pred * m - target * m) / (jnp.sum(m) + 1e-4)
    return jnp.sum(l1, axis=(0, 1))
