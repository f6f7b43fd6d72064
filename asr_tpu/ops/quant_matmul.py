"""Dequant-fused matmul for weight-only-quantized linears.

The reference lowers Q4/Q8 weights to ONNX Runtime's ``MatMulNBits``
contrib op (``Optimize_ONNX_Common.py:27``); the TPU-native equivalent is
a Pallas kernel that streams uint8 weight tiles into VMEM, dequantizes
them there ((q - zero) * scale per block) and feeds the MXU — the f32
weight never materializes in HBM, so the matmul stays
HBM-bandwidth-bound on the *quantized* bytes.

``quant_dense`` dispatches: Pallas on TPU, an XLA dequant+matmul fallback
on CPU (and for shapes the kernel does not tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_quant_dense(x: jnp.ndarray, qleaf: dict) -> jnp.ndarray:
    from asr_tpu.quant.quantize import dequantize_weight

    w = dequantize_weight(qleaf, dtype=x.dtype)
    return jnp.dot(x, w)


def _kernel(x_ref, q_ref, scale_ref, zero_ref, o_ref, acc_ref, *, block: int, n_k_tiles: int):
    """Grid (M_tiles, N_tiles, K_tiles); K is the reduction axis.

    scale/zero arrive as the FULL (K // block, TN) column strip (tiny —
    they violate the (8, 128) min-tile rule if sliced per K-tile); the
    kernel slices its K-tile rows in VMEM."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.int32).astype(jnp.float32)  # (TK, TN) int8 -> f32
    tk, tn = q.shape
    nb = tk // block
    if n_k_tiles == 1:
        scale = scale_ref[:]                    # static full strip
        zero = zero_ref[:]
    else:
        # nb is kept >= 8 by the dispatcher so this start is 8-aligned.
        scale = scale_ref[pl.ds(pl.multiple_of(kt * nb, nb), nb), :]
        zero = zero_ref[pl.ds(pl.multiple_of(kt * nb, nb), nb), :]
    qb = q.reshape(nb, block, tn)
    w = (qb - zero[:, None, :]) * scale[:, None, :]
    w = w.reshape(tk, tn)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32
    )

    @pl.when(kt == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "tile_m", "tile_n", "tile_k", "interpret"))
def quant_matmul_pallas(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    block: int,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (M, K) @ dequant(q (K, N)) -> (M, N). Requires M/K/N divisible by
    the tile sizes and ``tile_k`` divisible by ``block``."""
    m, k = x.shape
    _, n = q.shape
    n_k_tiles = k // tile_k
    grid = (m // tile_m, n // tile_n, n_k_tiles)
    kernel = functools.partial(_kernel, block=block, n_k_tiles=n_k_tiles)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, kt: (kt, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, tile_n), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, tile_n), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, q, scale, zero)


def _pick_tile_k(k: int, block: int) -> int | None:
    """tile_k must divide k, be a block multiple, and either equal k or
    cover >= 8 scale rows (Mosaic 8-aligned dynamic slice)."""
    if k % block != 0:
        return None
    if k <= 2048 or k % (8 * block) != 0:
        return k
    return 8 * block


def quant_dense(x: jnp.ndarray, qleaf: dict) -> jnp.ndarray:
    """Batched dense through a quantized weight; dispatches Pallas/XLA."""
    q, scale, zero, block = qleaf["q"], qleaf["scale"], qleaf["zero"], qleaf["block"]
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    n = q.shape[1]
    tile_k = _pick_tile_k(k, block)
    tile_m = 256 if m % 256 == 0 else (m if m % 8 == 0 else None)
    tile_n = 256 if n % 256 == 0 else (n if n % 128 == 0 else None)
    if jax.default_backend() == "tpu" and tile_k and tile_m and tile_n:
        out = quant_matmul_pallas(
            x2, q, scale.astype(jnp.float32), zero.astype(jnp.float32), block,
            tile_m=tile_m, tile_n=tile_n, tile_k=tile_k,
        )
    else:
        out = _xla_quant_dense(x2, qleaf)
    return out.reshape(orig_shape[:-1] + (n,))
