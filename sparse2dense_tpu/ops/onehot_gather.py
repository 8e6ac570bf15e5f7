"""Windowed one-hot row gather: data-dependent gathers as MXU contractions.

XLA's TPU row-gather runs at ~0.14-0.5 Mrows/ms regardless of row width
(measured, PERF.md round 3) — far too slow for structures that need
millions of gathered rows per frame. But when the target indices of each
consecutive BLOCK of outputs fall inside a bounded rank window (true for
sorted tile/voxel structures: neighbor maps are monotone with bounded
spread), the gather is expressible as

    out[block] = onehot(idx[block] - ws[block]) @ table[ws[block] : +W]

— one (blk, W) @ (W, D) matmul per block. With wide payload rows
(D >= 128 channels) the one-hot waste W/D is small and the MXU does the
"gather" at matmul speed; the one-hot build is a VPU iota-compare.

Exactness: rows whose target falls outside the block window are returned
as ZERO and reported in the (count, mask) outputs — callers either size W
so the miss set is empty (asserted by tests), or patch misses with an
exact XLA gather fallback (cheap when rare). Targets < 0 (absent) also
produce zero rows, but are NOT counted as misses.

Natively differentiable: d/d(table) is the transposed contraction — XLA
handles it; no custom_vjp.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pet(x):
    """preferred_element_type for MXU ops: f32 outputs for f32 inputs; for
    bf16 inputs leave the output bf16 (the MXU accumulates f32 internally
    either way, and callers cast right after) — requesting f32 outputs from
    bf16 operands breaks the AD transpose (dtype-mismatched cotangents)."""
    import jax.numpy as _jnp
    return _jnp.float32 if x.dtype == _jnp.float32 else None


def onehot_gather(table: jnp.ndarray, idx: jnp.ndarray, window: int,
                  block: int = 128,
                  compute_dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather table rows by index via blocked one-hot contraction.

    table (R, D); idx (M,) int32 row targets, M % block == 0, -1 = absent
    (zero row). Returns (out (M, D) in table.dtype, missed (M,) bool —
    valid targets that fell outside their block's window; their rows are
    zero and the caller must patch or count them).
    """
    r, d = table.shape
    m = idx.shape[0]
    assert m % block == 0, (m, block)
    nb = m // block
    window = min(window, r)
    ib = idx.reshape(nb, block)
    valid = ib >= 0
    # per-block window start: min valid target, clipped so the window fits
    ws = jnp.min(jnp.where(valid, ib, r), axis=1)
    ws = jnp.clip(ws, 0, max(r - window, 0)).astype(jnp.int32)
    rel = ib - ws[:, None]                      # (nb, block)
    inside = valid & (rel >= 0) & (rel < window)
    relc = jnp.where(inside, rel, -1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, block, window), 2)
    hit = (relc[:, :, None] == iota).astype(compute_dtype)

    tb = table.astype(compute_dtype)

    def blockfn(h_b, ws_b):
        win = jax.lax.dynamic_slice_in_dim(tb, ws_b, window, 0)  # (W, D)
        return jnp.dot(h_b, win, preferred_element_type=_pet(win))

    out = jax.vmap(blockfn)(hit, ws)            # (nb, block, D) f32
    out = out.reshape(m, d).astype(table.dtype)
    missed = (valid & ~inside).reshape(m)
    return out, missed


def onehot_gather_exact(table: jnp.ndarray, idx: jnp.ndarray, window: int,
                        block: int = 128, compute_dtype=jnp.bfloat16,
                        max_miss_frac: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """onehot_gather + exact XLA-gather patch of the missed rows.

    The patch gathers ALL rows' targets only where missed (masked), which
    XLA executes as one (M,)-row gather — acceptable because misses are
    rare by construction; use plain onehot_gather when the caller proves
    coverage. Returns (out, n_missed) — n_missed is telemetry.
    """
    out, missed = onehot_gather(table, idx, window, block, compute_dtype)
    r = table.shape[0]
    safe = jnp.clip(jnp.where(missed, idx, 0), 0, r - 1)
    patch = jnp.where(missed[:, None], table[safe], 0).astype(table.dtype)
    out = out + patch
    return out, jnp.sum(missed.astype(jnp.int32))
