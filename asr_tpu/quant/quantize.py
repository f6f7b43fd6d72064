"""Weight-only quantization (int8 / int4, block-wise) for serving.

The reference ships a 4,306-line ONNX quantization pipeline
(``Optimize_ONNX_Common.py``: Q2/Q4/Q8 weight-only via MatMulNBits with
DEFAULT/HQQ/RTN/k_quant/AFFINE_REFINE_V2 algorithms, a numba-JIT
refinement kernel :3120-3245, dynamic INT8, and an elaborate F16-overflow
guard system). The TPU equivalents here are deliberately smaller:

- **bf16 serving** needs no machinery at all — bfloat16's exponent range
  removes the f16 overflow problem the reference fights (SURVEY.md §7.7);
  cast the pytree.
- **int8/int4 weight-only**: block-wise affine quantization of linear
  weights with (a) RTN (round-to-nearest) and (b) an iterative
  **affine refinement** that alternately re-fits scale/zero-point to
  minimize weight MSE — the reference's AFFINE_REFINE_V2 idea, expressed
  as a vectorized jitted JAX loop instead of a numba kernel.

Quantized leaves are ``QuantizedLinear`` pytree nodes;
``asr_tpu.layers.transformer.dense`` consumes them transparently (XLA
dequant-fused path) and ``asr_tpu.ops.quant_matmul`` provides the Pallas
kernel that dequantizes tiles in VMEM.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _fit_rtn(blocks: jnp.ndarray, qmax: int):
    """Symmetric-range affine fit per block. blocks (NB, B, N)."""
    wmin = jnp.min(blocks, axis=1, keepdims=True)
    wmax = jnp.max(blocks, axis=1, keepdims=True)
    scale = (wmax - wmin) / qmax
    scale = jnp.where(scale <= 1e-12, 1.0, scale)
    zero = jnp.round(-wmin / scale)
    return scale, zero


def _fit_kquant(blocks: jnp.ndarray, qmax: int, n_grid: int = 16):
    """k-quant-style fit: grid-search the block scale around the RTN range
    fit, scoring candidates by IMPORTANCE-WEIGHTED squared error with
    weights w_i = x_i^2 (large weights matter more after the matmul).

    The reference exposes a ``k_quant`` algorithm choice in its
    MatMulNBits pipeline (``Optimize_ONNX_Common.py`` quantization plans);
    this is the same idea expressed as a vectorized JAX sweep: for each
    candidate scale, the zero-point is re-fit as the weighted-optimal
    (rounded) offset, and the best (scale, zero) per block wins.
    """
    weights = blocks * blocks + 1e-12
    scale0, _ = _fit_rtn(blocks, qmax)
    wmin = jnp.min(blocks, axis=1, keepdims=True)
    factors = jnp.linspace(0.6, 1.2, n_grid)

    def score(factor):
        # Anchor the zero-point at the block minimum for each candidate
        # scale: shrunken scales clip outliers but sharpen the bulk, and the
        # weighted error decides which trade wins per block.
        scale = scale0 * factor
        zero = jnp.clip(jnp.round(-wmin / scale), 0, qmax)
        q = jnp.clip(jnp.round(blocks / scale + zero), 0, qmax)
        err = jnp.sum(weights * (blocks - (q - zero) * scale) ** 2, axis=1, keepdims=True)
        return err, scale, zero

    errs, scales, zeros = jax.vmap(score)(factors)  # (G, NB, 1, N)
    best = jnp.argmin(errs, axis=0, keepdims=True)  # (1, NB, 1, N)
    scale = jnp.take_along_axis(scales, best, axis=0)[0]
    zero = jnp.take_along_axis(zeros, best, axis=0)[0]
    return scale, zero


@functools.partial(jax.jit, static_argnames=("bits", "block", "refine_iters", "objective"))
def quantize_weight(
    w: jnp.ndarray, bits: int = 8, block: int = 128, refine_iters: int = 0,
    objective: str = "rtn",
):
    """Quantize a (K, N) weight block-wise along K.

    ``objective``: "rtn" (round-to-nearest range fit) or "kquant"
    (importance-weighted grid search). Returns (q uint8 (K, N),
    scale (NB, N), zero (NB, N)) with ``w ≈ (q - zero) * scale`` per block.
    """
    k, n = w.shape
    assert k % block == 0, (k, block)
    qmax = (1 << bits) - 1
    blocks = w.reshape(k // block, block, n).astype(jnp.float32)
    if objective == "kquant":
        scale, zero = _fit_kquant(blocks, qmax)
    else:
        scale, zero = _fit_rtn(blocks, qmax)

    def quant(scale, zero):
        return jnp.clip(jnp.round(blocks / scale + zero), 0, qmax)

    def refine(carry, _):
        scale, zero = carry
        q = quant(scale, zero)
        # Re-fit scale by least squares on (q - zero) vs blocks, then re-fit zero.
        centered = q - zero
        num = jnp.sum(centered * blocks, axis=1, keepdims=True)
        den = jnp.sum(centered * centered, axis=1, keepdims=True)
        scale = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), scale)
        scale = jnp.where(jnp.abs(scale) <= 1e-12, 1.0, scale)
        q2 = quant(scale, zero)
        zero_f = jnp.mean(q2 - blocks / scale, axis=1, keepdims=True)
        zero = jnp.clip(jnp.round(zero_f), 0, qmax)
        return (scale, zero), None

    if refine_iters:
        (scale, zero), _ = jax.lax.scan(refine, (scale, zero), None, length=refine_iters)
    # Store centered int8 (q - 128, zero - 128): algebraically identical and
    # Mosaic supports int8 -> f32 casts (uint8 is unsupported on TPU).
    q = (quant(scale, zero) - 128.0).astype(jnp.int8).reshape(k, n)
    return q, scale[:, 0, :], zero[:, 0, :] - 128.0


@jax.tree_util.register_pytree_node_class
class QuantizedLinear:
    """Block-quantized linear weight; ``bits``/``block``/``packed`` are
    static pytree aux data so jitted functions see them as Python values.

    ``packed`` (4-bit only): rows ``[0, K/2)`` live in the LOW nibble and
    rows ``[K/2, K)`` in the HIGH nibble of a ``(K/2, N)`` int8 array —
    the halves stay K-contiguous so dequant decomposes into two partial
    matmuls with no interleaving."""

    def __init__(self, q, scale, zero, bits: int, block: int, packed: bool = False):
        self.q = q
        self.scale = scale
        self.zero = zero
        self.bits = int(bits)
        self.block = int(block)
        self.packed = bool(packed)

    def tree_flatten(self):
        return (self.q, self.scale, self.zero), (self.bits, self.block, self.packed)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # dict-style access kept for convenience / serialization.
    def __getitem__(self, key):
        return getattr(self, key)

    def __contains__(self, key):
        return key in ("q", "scale", "zero", "bits", "block", "packed")

    @property
    def k(self) -> int:
        if not self.packed:
            return self.q.shape[0]
        return self.q.shape[0] * (4 if self.bits == 2 else 2)

    # Duck-type the dense (K, N) weight: models consult ``.dtype`` /
    # ``.shape`` on linear leaves (e.g. ``params["output"]["w"].dtype``).
    @property
    def dtype(self):
        return self.scale.dtype

    @property
    def shape(self) -> tuple[int, int]:
        return (self.k, self.q.shape[1])

    @property
    def ndim(self) -> int:
        return 2


def pack4_halves(q_unsigned: jnp.ndarray) -> jnp.ndarray:
    """(K, N) uint4-valued -> (K/2, N) int8: low nibble = rows [0, K/2),
    high nibble = rows [K/2, K)."""
    k = q_unsigned.shape[0]
    lo = q_unsigned[: k // 2].astype(jnp.uint8)
    hi = q_unsigned[k // 2 :].astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack4_halves(packed: jnp.ndarray) -> jnp.ndarray:
    """(K/2, N) int8 -> (K, N) float32 unsigned nibble values."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int32).astype(jnp.float32)
    hi = ((u >> 4) & 0xF).astype(jnp.int32).astype(jnp.float32)
    return jnp.concatenate([lo, hi], axis=0)


def pack2_quarters(q_unsigned: jnp.ndarray) -> jnp.ndarray:
    """(K, N) uint2-valued -> (K/4, N) int8: bit pair ``2j:2j+2`` holds rows
    ``[jK/4, (j+1)K/4)`` — quarters stay K-contiguous (same layout idea as
    :func:`pack4_halves`), so dequant is four contiguous partial matmuls."""
    k = q_unsigned.shape[0]
    quarters = [q_unsigned[j * (k // 4) : (j + 1) * (k // 4)].astype(jnp.uint8)
                for j in range(4)]
    out = quarters[0]
    for j in (1, 2, 3):
        out = out | (quarters[j] << (2 * j))
    return out.astype(jnp.int8)


def unpack2_quarters(packed: jnp.ndarray) -> jnp.ndarray:
    """(K/4, N) int8 -> (K, N) float32 unsigned 2-bit values."""
    u = packed.astype(jnp.uint8)
    parts = [((u >> (2 * j)) & 0x3).astype(jnp.int32).astype(jnp.float32)
             for j in range(4)]
    return jnp.concatenate(parts, axis=0)


def dequantize_weight(qleaf, dtype=jnp.float32) -> jnp.ndarray:
    """QuantizedLinear (or equivalent dict) -> dense (K, N) weight.

    Unpacked storage is CENTERED (q - 128, zero - 128); packed-4-bit
    storage keeps raw unsigned nibbles with an unsigned zero. Both give
    ``w = (q - zero) * scale`` per block."""
    packed = bool(qleaf["packed"]) if "packed" in qleaf else False
    if packed:
        q = unpack2_quarters(qleaf["q"]) if int(qleaf["bits"]) == 2 else unpack4_halves(qleaf["q"])
    else:
        q = qleaf["q"].astype(jnp.float32)
    k, n = q.shape
    block = int(qleaf["block"])
    blocks = q.reshape(k // block, block, n)
    w = (blocks - qleaf["zero"][:, None, :]) * qleaf["scale"][:, None, :]
    return w.reshape(k, n).astype(dtype)


def quantize_linear(
    w: jnp.ndarray, bits: int = 8, block: int = 128, refine_iters: int = 0,
    pack: bool = False, objective: str = "rtn",
):
    k = w.shape[0]
    if k % block != 0:
        # Fall back to one block per remainder-safe size.
        block = k
    q, scale, zero = quantize_weight(w, bits, block, refine_iters, objective=objective)
    if pack and bits == 4 and k % 2 == 0 and (k // 2) % block == 0:
        # Store raw unsigned nibbles; zero stays in unsigned convention.
        q_unsigned = (q.astype(jnp.int32) + 128).astype(jnp.uint8)
        return QuantizedLinear(pack4_halves(q_unsigned), scale, zero + 128.0, 4, block, packed=True)
    if pack and bits == 2 and k % 4 == 0 and (k // 4) % block == 0:
        q_unsigned = (q.astype(jnp.int32) + 128).astype(jnp.uint8)
        return QuantizedLinear(pack2_quarters(q_unsigned), scale, zero + 128.0, 2, block, packed=True)
    return QuantizedLinear(q, scale, zero, bits, block)


def is_quantized(leaf) -> bool:
    if isinstance(leaf, QuantizedLinear):
        return True
    return isinstance(leaf, dict) and "q" in leaf and "scale" in leaf and "bits" in leaf


def quantize_pytree(
    params,
    bits: int = 8,
    block: int = 128,
    refine_iters: int = 2,
    min_size: int = 1 << 16,
    predicate: Callable[[str, jnp.ndarray], bool] | None = None,
    pack: bool = False,
    objective: str = "rtn",
):
    """Quantize every 2-D ``{"w": ...}`` linear weight above ``min_size``
    elements (mirrors the reference's >=1024-element shared-initializer and
    node include/exclude plans, ``Optimize_ONNX_Common.py:85-135``)."""

    def walk(node, path):
        if isinstance(node, dict):
            out = {}
            for key, value in node.items():
                p = f"{path}/{key}"
                if (
                    key in ("w", "w1", "w2")
                    and isinstance(value, jnp.ndarray)
                    and value.ndim == 2
                    and value.size >= min_size
                    and (predicate is None or predicate(p, value))
                ):
                    out[key] = quantize_linear(value, bits, block, refine_iters,
                                               pack=pack, objective=objective)
                else:
                    out[key] = walk(value, p)
            return out
        if isinstance(node, (list, tuple)):
            walked = [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
            return type(node)(walked) if isinstance(node, tuple) else walked
        return node

    return walk(params, "")


def quantization_error(w: jnp.ndarray, qleaf: dict) -> float:
    """Relative Frobenius error of the quantized representation."""
    deq = dequantize_weight(qleaf)
    return float(jnp.linalg.norm(w - deq) / jnp.maximum(jnp.linalg.norm(w), 1e-9))


def cast_pytree(params, dtype):
    """bf16/f32 serving cast (inexact leaves only)."""
    def cast(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)
