"""Exact top-k that avoids a libtpu compiler crash.

This image's TPU compiler SIGABRTs on ``lax.top_k`` with large k over long
rows (pipeline_emitter.cc span_size check, observed at k=4096 over 219k).
For large k a full descending sort + slice is equally exact and costs ~30us
at CenterPoint sizes, so we switch implementation on a size threshold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LAX_TOPK_MAX_K = 512  # k <= this is known-safe for lax.top_k here


def top_k(x: jnp.ndarray, k: int):
    """Exact (values, indices) top-k along the last axis."""
    if k <= _LAX_TOPK_MAX_K:
        return jax.lax.top_k(x, k)
    idx = jnp.argsort(-x, axis=-1)[..., :k]
    return jnp.take_along_axis(x, idx, axis=-1), idx
