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


def _kernel_p2(x0_ref, x1_ref, x2_ref, x3_ref, q_ref, scale_ref, zero_ref,
               o_ref, acc_ref, *, block: int, n_k4_tiles: int, nb_quarter: int):
    """Packed-int2 grid (M_tiles, N_tiles, K4_tiles): each K4-tile covers
    matching row ranges of ALL FOUR K-quarters (2-bit planes of one byte)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = q_ref[:].astype(jnp.int32) & 0xFF
    tk4, tn = u.shape
    nb = tk4 // block

    def deq(vals, base_row):
        s = scale_ref[pl.ds(pl.multiple_of(base_row, nb), nb), :]
        z = zero_ref[pl.ds(pl.multiple_of(base_row, nb), nb), :]
        vb = vals.reshape(nb, block, tn)
        return ((vb - z[:, None, :]) * s[:, None, :]).reshape(tk4, tn)

    for j, x_ref in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        vals = ((u >> (2 * j)) & 0x3).astype(jnp.float32)
        w = deq(vals, j * nb_quarter + kt * nb)
        acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                              preferred_element_type=jnp.float32)

    @pl.when(kt == n_k4_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "tile_m", "tile_n", "tile_k4", "interpret"))
def quant_matmul_pallas_p2(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    block: int,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k4: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (M, K) @ dequant(packed (K/4, N) int2-quarters) -> (M, N)."""
    m, k = x.shape
    k4, n = packed.shape
    assert k == 4 * k4
    n_k4_tiles = k4 // tile_k4
    nb_quarter = k4 // block
    grid = (m // tile_m, n // tile_n, n_k4_tiles)
    kernel = functools.partial(_kernel_p2, block=block,
                               n_k4_tiles=n_k4_tiles, nb_quarter=nb_quarter)
    kb = k4 // tile_k4
    x_spec = lambda j: pl.BlockSpec(
        (tile_m, tile_k4), lambda i, jn, kt, j=j, kb=kb: (i, kt + j * kb),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec(0), x_spec(1), x_spec(2), x_spec(3),
            pl.BlockSpec((tile_k4, tile_n), lambda i, j, kt: (kt, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, tile_n), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, tile_n), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=interpret,
    )(x, x, x, x, packed, scale, zero)


def quant_dense(x: jnp.ndarray, qleaf: dict) -> jnp.ndarray:
    """Batched dense through a quantized weight; dispatches Pallas/XLA."""
    q, scale, zero, block = qleaf["q"], qleaf["scale"], qleaf["zero"], qleaf["block"]
    packed = bool(qleaf["packed"]) if "packed" in qleaf else False
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    n = q.shape[1]
    tile_m = 256 if m % 256 == 0 else (m if m % 8 == 0 else None)
    tile_n = 256 if n % 256 == 0 else (n if n % 128 == 0 else None)
    if jax.default_backend() == "tpu" and tile_m and tile_n:
        if packed:
            if int(qleaf["bits"]) == 4:
                k2 = k // 2
                tile_k2 = _pick_tile_k(k2, block)
                # scale/zero row slices must stay 8-aligned for both halves.
                if tile_k2 and (k2 // block) % 8 == 0:
                    out = quant_matmul_pallas_p4(
                        x2, q, scale.astype(jnp.float32), zero.astype(jnp.float32), block,
                        tile_m=tile_m, tile_n=tile_n, tile_k2=tile_k2,
                    )
                    return out.reshape(orig_shape[:-1] + (n,))
            elif int(qleaf["bits"]) == 2:
                k4 = k // 4
                tile_k4 = _pick_tile_k(k4, block)
                if tile_k4 and (k4 // block) % 8 == 0:
                    out = quant_matmul_pallas_p2(
                        x2, q, scale.astype(jnp.float32), zero.astype(jnp.float32), block,
                        tile_m=tile_m, tile_n=tile_n, tile_k4=tile_k4,
                    )
                    return out.reshape(orig_shape[:-1] + (n,))
        else:
            tile_k = _pick_tile_k(k, block)
            if tile_k:
                out = quant_matmul_pallas(
                    x2, q, scale.astype(jnp.float32), zero.astype(jnp.float32), block,
                    tile_m=tile_m, tile_n=tile_n, tile_k=tile_k,
                )
                return out.reshape(orig_shape[:-1] + (n,))
    out = _xla_quant_dense(x2, qleaf)
    return out.reshape(orig_shape[:-1] + (n,))


def _kernel_p4(x_lo_ref, x_hi_ref, q_ref, scale_ref, zero_ref, o_ref, acc_ref, *,
               block: int, n_k2_tiles: int, nb_half: int):
    """Packed-int4 grid (M_tiles, N_tiles, K2_tiles): each K2-tile covers
    matching row ranges of BOTH K-halves (low/high nibble planes)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = q_ref[:].astype(jnp.int32) & 0xFF   # int8 -> unsigned byte view
    lo = (u & 0xF).astype(jnp.float32)
    hi = ((u >> 4) & 0xF).astype(jnp.float32)
    tk2, tn = lo.shape
    nb = tk2 // block

    def deq(vals, base_row):
        s = scale_ref[pl.ds(pl.multiple_of(base_row, nb), nb), :]
        z = zero_ref[pl.ds(pl.multiple_of(base_row, nb), nb), :]
        vb = vals.reshape(nb, block, tn)
        return ((vb - z[:, None, :]) * s[:, None, :]).reshape(tk2, tn)

    w_lo = deq(lo, kt * nb)
    w_hi = deq(hi, nb_half + kt * nb)
    acc_ref[:] += jnp.dot(x_lo_ref[:].astype(jnp.float32), w_lo,
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(x_hi_ref[:].astype(jnp.float32), w_hi,
                          preferred_element_type=jnp.float32)

    @pl.when(kt == n_k2_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "tile_m", "tile_n", "tile_k2", "interpret"))
def quant_matmul_pallas_p4(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    block: int,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k2: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (M, K) @ dequant(packed (K/2, N) int4-halves) -> (M, N)."""
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2
    n_k2_tiles = k2 // tile_k2
    nb_half = k2 // block
    grid = (m // tile_m, n // tile_n, n_k2_tiles)
    kernel = functools.partial(_kernel_p4, block=block, n_k2_tiles=n_k2_tiles, nb_half=nb_half)
    k2_blocks = k2 // tile_k2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k2), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k2), lambda i, j, kt, kb=k2_blocks: (i, kt + kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k2, tile_n), lambda i, j, kt: (kt, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, tile_n), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // block, tile_n), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=interpret,
    )(x, x, packed, scale, zero)
