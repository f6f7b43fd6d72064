"""Rotary position embeddings (GPT-NeoX half-rotation convention).

Used by the Qwen3 decoder families (Qwen3-ASR, Fun-ASR-Nano, ForcedAligner;
reference ``Qwen_ASR/Export_Qwen_ASR.py:436-470`` precomputes the same
cos/sin tables and a rotate-half index table for ONNX)."""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def rope_tables(max_len: int, head_dim: int, theta: float) -> np.ndarray:
    """(2, max_len, head_dim) stacked cos/sin with duplicated frequencies
    ([f0..f_{d/2-1}, f0..f_{d/2-1}] layout)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(max_len, dtype=np.float64)
    freqs = t[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.stack([np.cos(emb), np.sin(emb)]).astype(np.float32)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, H, D); cos/sin (T, D) broadcast over batch and heads, or
    (B, T, D) for per-row position tables (left-padded batch decode)."""
    if cos.ndim == 3:
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
    else:
        c = cos[None, :, None, :].astype(x.dtype)
        s = sin[None, :, None, :].astype(x.dtype)
    return x * c + rotate_half(x) * s
