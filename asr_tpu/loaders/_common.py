"""Shared torch/numpy -> jnp mapping helpers for the checkpoint loaders.

One definition of the linear/layernorm/conv conversions so every loader
agrees on dtype coercion (fp16/bf16 checkpoints load as f32) and layout
(torch Linear ``(out, in)`` -> ours ``(in, out)``; Conv2d OIHW -> HWIO;
depthwise Conv1d ``(C, 1, K)`` -> ``(K, C)``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp


def to_np(t) -> np.ndarray:
    """torch tensor / array-like -> float32-preserving numpy (fp16/bf16
    checkpoints upcast so downstream math is f32)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if hasattr(t, "float") and t.dtype not in getattr(t, "_int_dtypes", ()):
            try:
                import torch

                if t.dtype in (torch.float16, torch.bfloat16, torch.float64):
                    t = t.float()
            except Exception:
                pass
        return t.numpy()
    arr = np.asarray(t)
    if arr.dtype in (np.float16, np.float64):
        return arr.astype(np.float32)
    return arr


def lin(sd: Mapping[str, Any], key: str) -> dict:
    """torch Linear -> {"w": (in, out)[, "b"]} (bias included when present)."""
    p = {"w": jnp.asarray(to_np(sd[f"{key}.weight"]).T)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(to_np(sd[f"{key}.bias"]))
    return p


def ln(sd: Mapping[str, Any], key: str) -> dict:
    """torch LayerNorm -> {"scale", "bias"}."""
    return {
        "scale": jnp.asarray(to_np(sd[f"{key}.weight"])),
        "bias": jnp.asarray(to_np(sd[f"{key}.bias"])),
    }


def conv2d_hwio(sd: Mapping[str, Any], key: str) -> dict:
    """torch Conv2d OIHW -> {"w": HWIO, "b"}."""
    p = {"w": jnp.asarray(to_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(to_np(sd[f"{key}.bias"]))
    return p


def dw1d(sd: Mapping[str, Any], key: str) -> dict:
    """torch depthwise Conv1d (C, 1, K) -> {"w": (K, C)[, "b"]}."""
    w = to_np(sd[f"{key}.weight"])
    p = {"w": jnp.asarray(w[:, 0, :].T)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(to_np(sd[f"{key}.bias"]))
    return p
