"""Batched multi-head attention primitives.

All attention here is full (non-causal unless masked), fixed-shape, batched
``(B, T, H, D)`` — softmax in float32 regardless of compute dtype. Masks
are additive float32 ``(B, 1, Tq, Tk)`` (0 for keep, large-negative for
drop), built from valid lengths so padded batches reproduce variable-length
runs exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def length_mask(valid: jnp.ndarray, t: int) -> jnp.ndarray:
    """Boolean key-validity mask ``(B, t)`` from per-sample valid lengths."""
    return jnp.arange(t, dtype=jnp.int32)[None, :] < valid[:, None]


def attention_bias_from_lengths(valid: jnp.ndarray, t: int) -> jnp.ndarray:
    """Additive bias ``(B, 1, 1, t)`` masking padded key positions."""
    keep = length_mask(valid, t)
    return jnp.where(keep, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Multi-head attention over fixed-length sequences.

    Args:
      q: ``(B, Tq, H, D)``; k/v: ``(B, Tk, H, D)`` (H may differ for GQA —
        use :func:`gqa` instead).
      bias: additive f32 bias broadcastable to ``(B, H, Tq, Tk)``.
      scale: score scale; default ``D ** -0.5``.

    Returns ``(B, Tq, H, D)`` in q's dtype.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def gqa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Grouped-query attention: q ``(B, Tq, Hq, D)``, k/v ``(B, Tk, Hkv, D)``
    with ``Hq % Hkv == 0`` (Qwen3-style decoders)."""
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    qg = q.reshape(b, tq, hkv, group, d)
    if scale is None:
        scale = d ** -0.5
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k).astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias[:, :, None] if bias.ndim == 4 else scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, tq, hq, d)
