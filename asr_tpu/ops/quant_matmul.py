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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Matmul mode inside the kernels once the weight tile is dequantized:
#   "bf16" (default): cast weight+activation tiles to bf16, one MXU pass,
#     f32 accumulation.  Rounding is ~2^-8 relative — for q4/q2 far below
#     the quantization error; for q8 it is *comparable* to it (the q8
#     block-quant error is also ~2^-8 of the block range), an accepted
#     serving trade because f32 HIGHEST on the TPU MXU is emulated with 6
#     bf16 passes (~28 vs ~130 TF/s measured on v5e).
#   "f32": dequantize to f32 and run Precision.HIGHEST — bit-exact against
#     the XLA dequant reference; used by parity/validation paths.
#
# Configuration precedence (ADVICE r2: env sniffing alone is fragile for
# in-process callers that trace before setting the env var):
#   1. explicit ``mm=`` argument at the call site,
#   2. ``set_quant_config(mm=...)`` — the session/CLI plumbing calls this
#      BEFORE building jitted functions,
#   3. the ASR_TPU_QUANT_MM env var, read at TRACE time,
#   4. default "bf16".
# NOTE: none of these retrace already-compiled functions — configure
# before the first jit of a session.
_MM_ENV = "ASR_TPU_QUANT_MM"
# Kernel route for quant_dense on TPU: "auto" (per-shape heuristic),
# "pallas" (always the Pallas kernels), "xla" (always dequant+XLA dot).
_KERNEL_ENV = "ASR_TPU_QUANT_KERNEL"

_CONFIG: dict = {"mm": None, "kernel": None}


def set_quant_config(mm: str | None = None, kernel: str | None = None) -> None:
    """Process-wide quantized-matmul configuration (overrides env vars).

    Call before the first jitted forward of a session; changing it later
    does not retrace already-compiled functions."""
    if mm is not None:
        if mm not in ("bf16", "f32"):
            raise ValueError(f"mm must be 'bf16' or 'f32', got {mm!r}")
        _CONFIG["mm"] = mm
    if kernel is not None:
        if kernel not in ("auto", "pallas", "xla"):
            raise ValueError(f"kernel must be 'auto'|'pallas'|'xla', got {kernel!r}")
        _CONFIG["kernel"] = kernel


def _resolve_mm(mm: str | None) -> str:
    if mm is not None:
        return mm
    if _CONFIG["mm"] is not None:
        return _CONFIG["mm"]
    return os.environ.get(_MM_ENV, "bf16")


def _resolve_kernel() -> str:
    if _CONFIG["kernel"] is not None:
        return _CONFIG["kernel"]
    k = os.environ.get(_KERNEL_ENV, "auto")
    if k not in ("auto", "pallas", "xla"):
        raise ValueError(f"{_KERNEL_ENV} must be 'auto'|'pallas'|'xla', got {k!r}")
    return k


def _mm_cfg(mm: str):
    if mm == "f32":
        return jnp.float32, jax.lax.Precision.HIGHEST
    if mm != "bf16":
        # A typo'd mode (F32, fp32, "f32 ") silently selecting the
        # approximate path would corrupt parity runs — fail loudly.
        raise ValueError(f"ASR_TPU_QUANT_MM / mm must be 'bf16' or 'f32', got {mm!r}")
    return jnp.bfloat16, jax.lax.Precision.DEFAULT


def _xla_quant_dense(x: jnp.ndarray, qleaf: dict) -> jnp.ndarray:
    from asr_tpu.quant.quantize import dequantize_weight

    # The XLA route must honor the same serving-mode contract as the
    # Pallas kernels: mm="bf16" means ONE bf16 MXU pass with f32
    # accumulation. Inheriting the ambient matmul precision here silently
    # ran every XLA-routed quantized matmul (all prefill/encoder shapes,
    # M >= 512) as 6-pass f32 HIGHEST under parity/bench configs — ~4.6x
    # slower (28 vs 130 TF/s measured) than the documented serving mode,
    # which made q8 rows barely faster than their own f32 rows. mm="f32"
    # (strict parity) keeps the exact dequant dot at ambient precision.
    if jax.default_backend() == "tpu" and _resolve_mm(None) == "bf16":
        w = dequantize_weight(qleaf, dtype=jnp.bfloat16)
        return jnp.dot(
            x.astype(jnp.bfloat16), w,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    w = dequantize_weight(qleaf, dtype=x.dtype)
    return jnp.dot(x, w)


def _kernel(x_ref, q_ref, scale_ref, zero_ref, o_ref, acc_ref, *, block: int, n_k_tiles: int,
            mm: str = "f32"):
    """Grid (M_tiles, N_tiles, K_tiles); K is the reduction axis.

    scale/zero arrive as the FULL (K // block, TN) column strip (tiny —
    they violate the (8, 128) min-tile rule if sliced per K-tile); the
    kernel slices its K-tile rows in VMEM.

    bf16 mode avoids materializing the dequantized weight: per K-block,
    the RAW int values feed the MXU and the affine is applied to the small
    (TM, TN) partial — ``x @ ((q - z) * s) = (x @ q) * s - rowsum(x) (z s)``
    (scale/zero are constant within a block x column). That cuts the VPU
    cost from ~6 ops/weight (explicit dequant, which dominated the kernel
    at ~300 GB/s effective) to one int->bf16 convert."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tk, tn = q_ref.shape
    nb = tk // block
    if n_k_tiles == 1:
        scale = scale_ref[:]                    # static full strip
        zero = zero_ref[:]
    else:
        # nb is kept >= 8 by the dispatcher so this start is 8-aligned.
        scale = scale_ref[pl.ds(pl.multiple_of(kt * nb, nb), nb), :]
        zero = zero_ref[pl.ds(pl.multiple_of(kt * nb, nb), nb), :]
    if mm == "bf16":
        x16 = x_ref[:].astype(jnp.bfloat16)
        w16 = q_ref[:].astype(jnp.bfloat16)     # int values exact in bf16
        zs = zero * scale                       # (nb, TN) f32
        for b in range(nb):
            sl = slice(b * block, (b + 1) * block)
            p = jnp.dot(x16[:, sl], w16[sl, :],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            xs = jnp.sum(x16[:, sl].astype(jnp.float32), axis=1)  # (TM,)
            acc_ref[:] += p * scale[b][None, :] - xs[:, None] * zs[b][None, :]
    else:
        _mm_cfg(mm)  # validate mode
        q = q_ref[:].astype(jnp.int32).astype(jnp.float32)  # (TK, TN)
        qb = q.reshape(nb, block, tn)
        w = (qb - zero[:, None, :]) * scale[:, None, :]
        acc_ref[:] += jnp.dot(
            x_ref[:], w.reshape(tk, tn), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(kt == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "tile_m", "tile_n", "tile_k", "interpret", "mm")
)
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
    mm: str = "f32",
) -> jnp.ndarray:
    """x (M, K) @ dequant(q (K, N)) -> (M, N). Requires M/K/N divisible by
    the tile sizes and ``tile_k`` divisible by ``block``."""
    m, k = x.shape
    _, n = q.shape
    n_k_tiles = k // tile_k
    grid = (m // tile_m, n // tile_n, n_k_tiles)
    kernel = functools.partial(_kernel, block=block, n_k_tiles=n_k_tiles, mm=mm)
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
        # parallel M/N lets Mosaic overlap the weight-strip DMAs across
        # grid steps — measured ~190 GB/s streaming vs ~150 without
        # (equal to the chip's XLA read rate; see KERNELS_TPU.json).
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, q, scale, zero)


def _pick_tile_k(k: int, block: int) -> int | None:
    """tile_k must divide k, be a block multiple, and either equal k or
    cover >= 8 scale rows (Mosaic 8-aligned dynamic slice).  A single tile
    is capped at 4096 rows — beyond that the (tile_m, tile_k) x window
    plus double buffering crowds the 16 MB VMEM budget."""
    if k % block != 0:
        return None
    if k <= 2048 or k % (8 * block) != 0:
        return k if k <= 4096 else None
    return 8 * block


def _kernel_p2(x0_ref, x1_ref, x2_ref, x3_ref, q_ref, scale_ref, zero_ref,
               o_ref, acc_ref, *, block: int, n_k4_tiles: int, mm: str = "f32"):
    """Packed-int2 grid (M_tiles, N_tiles, K4_tiles): each K4-tile covers
    matching row ranges of ALL FOUR K-quarters (2-bit planes of one byte).
    scale/zero arrive as (4, NB_quarter, TN) — one plane per bit-plane, so
    plane selection is a STATIC index and the only dynamic row slice is the
    kt offset (8-aligned by construction when multi-tile)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = q_ref[:].astype(jnp.int32) & 0xFF
    tk4, tn = u.shape
    nb = tk4 // block

    def plane_sz(plane):
        if n_k4_tiles == 1:
            return scale_ref[plane], zero_ref[plane]
        # nb == 8 by dispatch (tile_k4 = 8*block): aligned extent/offset.
        return (scale_ref[plane, pl.ds(pl.multiple_of(kt * nb, nb), nb), :],
                zero_ref[plane, pl.ds(pl.multiple_of(kt * nb, nb), nb), :])

    if mm == "bf16":
        for j, x_r in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
            s, z = plane_sz(j)
            zs = z * s
            v16 = ((u >> (2 * j)) & 0x3).astype(jnp.bfloat16)
            x16 = x_r[:].astype(jnp.bfloat16)
            for b in range(nb):
                sl = slice(b * block, (b + 1) * block)
                p = jnp.dot(x16[:, sl], v16[sl, :],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                xs = jnp.sum(x16[:, sl].astype(jnp.float32), axis=1)
                acc_ref[:] += p * s[b][None, :] - xs[:, None] * zs[b][None, :]
    else:
        _mm_cfg(mm)
        for j, x_r in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
            vals = ((u >> (2 * j)) & 0x3).astype(jnp.float32)
            s, z = plane_sz(j)
            vb = vals.reshape(nb, block, tn)
            w = ((vb - z[:, None, :]) * s[:, None, :]).reshape(tk4, tn)
            acc_ref[:] += jnp.dot(x_r[:], w, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(kt == n_k4_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "tile_m", "tile_n", "tile_k4", "interpret", "mm")
)
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
    mm: str = "f32",
) -> jnp.ndarray:
    """x (M, K) @ dequant(packed (K/4, N) int2-quarters) -> (M, N)."""
    m, k = x.shape
    k4, n = packed.shape
    assert k == 4 * k4
    n_k4_tiles = k4 // tile_k4
    nb_quarter = k4 // block
    grid = (m // tile_m, n // tile_n, n_k4_tiles)
    kernel = functools.partial(_kernel_p2, block=block, n_k4_tiles=n_k4_tiles, mm=mm)
    kb = k4 // tile_k4
    x_spec = lambda j: pl.BlockSpec(
        (tile_m, tile_k4), lambda i, jn, kt, j=j, kb=kb: (i, kt + j * kb),
        memory_space=pltpu.VMEM)
    scale3 = scale.reshape(4, nb_quarter, n)  # one plane per 2-bit plane
    zero3 = zero.reshape(4, nb_quarter, n)
    sz_spec = pl.BlockSpec((4, nb_quarter, tile_n), lambda i, j, kt: (0, 0, j),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec(0), x_spec(1), x_spec(2), x_spec(3),
            pl.BlockSpec((tile_k4, tile_n), lambda i, j, kt: (kt, j), memory_space=pltpu.VMEM),
            sz_spec, sz_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, x, x, x, packed, scale3, zero3)


def _plan_tile_m(m: int) -> tuple[int, int]:
    """(tile_m, padded_m). tile_m is capped at 256 — an uncapped tile
    (e.g. the whole M=12000 of a batch-8 Whisper encoder) blows the 16 MB
    VMEM scoped limit; small/ragged M (AR decode steps are M=1) is
    zero-padded up to one tile so the kernel still runs off the quantized
    bytes instead of falling back to an f32 dequant."""
    if m >= 256:
        return 256, -(-m // 256) * 256
    m_pad = max(8, -(-m // 8) * 8)
    return m_pad, m_pad


def _fit_tile_m_to_vmem(tile_m: int, m_pad: int, k_window: int, n_windows: int) -> int:
    """Shrink tile_m until the x operand windows fit the VMEM budget
    (~1 MiB per window x double buffering; empirical v5e limit — a
    (256, 2048) f32 window x2 nibble-planes fails to compile)."""
    budget_elems = (1 << 18) * max(1, 2 // n_windows)  # 1 MiB f32 per window
    while tile_m > 8 and tile_m * k_window > budget_elems:
        half = tile_m // 2
        # keep tile_m a multiple of 8 that divides m_pad
        while half >= 8 and (half % 8 or m_pad % half):
            half -= 8
        if half < 8:
            break
        tile_m = half
    return tile_m


def _pallas_quant_dense_2d(x2: jnp.ndarray, qleaf: dict, interpret: bool = False,
                           mm: str | None = None):
    """(M, K) @ dequant -> (M, N) via the Pallas kernels, or None when the
    shape/packing has no kernel tiling (caller falls back to XLA)."""
    q, scale, zero, block = qleaf["q"], qleaf["scale"], qleaf["zero"], qleaf["block"]
    packed = bool(qleaf["packed"]) if "packed" in qleaf else False
    m, k = x2.shape
    n = q.shape[1]
    tile_m, m_pad = _plan_tile_m(m)
    # tile_n capped at 256 (an uncapped n — e.g. a 151936-row LM head —
    # would put the whole weight strip in VMEM) — except small-M matvecs
    # (AR decode steps), where wide tiles cut the grid-step count (the
    # per-step overhead dominates matvec kernels). The bf16 path no longer
    # materializes a dequantized f32 tile, so the VMEM bound is the int
    # tile + its bf16 convert (+ double buffering): ~3 bytes/weight.
    tile_n = None
    if m <= 64 and _resolve_mm(mm) == "bf16":
        # (f32 parity mode materializes an int32->f32 copy + dequantized
        # f32 tile in-kernel — ~9 bytes/weight — so wide tiles would blow
        # the 16 MB VMEM there; it keeps the narrow planner below)
        k_store = k // (4 if (packed and int(qleaf["bits"]) == 2) else
                        2 if packed else 1)
        for cand in (2048, 1024, 512):
            if n % cand == 0 and k_store * cand * 3 * 2 <= (10 << 20):
                tile_n = cand
                break
    if tile_n is None:
        if n % 256 == 0:
            tile_n = 256
        elif n % 128 == 0:
            tile_n = 128
        else:
            return None
    scale32 = scale.astype(jnp.float32)
    zero32 = zero.astype(jnp.float32)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    out = None
    if packed and int(qleaf["bits"]) == 4:
        k2 = k // 2
        tile_k2 = _pick_tile_k(k2, block)
        if tile_k2:
            tm = _fit_tile_m_to_vmem(tile_m, m_pad, tile_k2, 2)
            out = quant_matmul_pallas_p4(
                x2, q, scale32, zero32, block,
                tile_m=tm, tile_n=tile_n, tile_k2=tile_k2, interpret=interpret,
                mm=_resolve_mm(mm),
            )
    elif packed and int(qleaf["bits"]) == 2:
        k4 = k // 4
        tile_k4 = _pick_tile_k(k4, block)
        if tile_k4:
            tm = _fit_tile_m_to_vmem(tile_m, m_pad, tile_k4, 4)
            out = quant_matmul_pallas_p2(
                x2, q, scale32, zero32, block,
                tile_m=tm, tile_n=tile_n, tile_k4=tile_k4, interpret=interpret,
                mm=_resolve_mm(mm),
            )
    elif not packed:
        tile_k = _pick_tile_k(k, block)
        if tile_k:
            tm = _fit_tile_m_to_vmem(tile_m, m_pad, tile_k, 1)
            out = quant_matmul_pallas(
                x2, q, scale32, zero32, block,
                tile_m=tm, tile_n=tile_n, tile_k=tile_k, interpret=interpret,
                mm=_resolve_mm(mm),
            )
    if out is None:
        return None
    return out[:m] if m_pad != m else out


def _auto_prefers_pallas(m: int, bits: int, packed: bool,
                         k: int = 0, n: int = 0) -> bool:
    """Route for kernel="auto" on TPU, measured per shape class (r3 sweep,
    M in {8,128,256,512,1024,2048} x several (K, N); v5e):

    - Small M (AR decode steps): Pallas wins 1.3-2.9x — it streams only
      the quantized bytes (385 GB/s measured at m8) where XLA first
      materializes a dequantized bf16 copy. The crossover M grows as the
      bit width shrinks (XLA's unpack gets pricier): int8 wins to m~64
      (m128 already loses at 0.85x), packed int4 to m~128-256, packed
      int2 to m~256-512.
    - Large M (prefill / encoder shapes): XLA wins — its dequant-once +
      single bf16 MXU pass is compute-bound at ~130 TF/s (m512 int8:
      1.9x over the Pallas block-loop, whose per-block small-K dots
      can't keep the MXU full). This only holds since _xla_quant_dense
      pins the bf16 serving pass itself; when it still inherited the
      ambient precision, a global f32-HIGHEST config ran XLA's dot as the
      6-pass emulation (~28 TF/s) and always-Pallas was the right call
      (SenseVoice q8 batch-8 whole-model A/B: 0.000262 Pallas vs
      0.000465 XLA under HIGHEST).
    - Very large packed weights (K*N >= 16M, e.g. 4096x4096 int4): XLA
      stops fusing the unpack into the dot and round-trips a 2-byte
      dequantized copy through HBM — Pallas wins 1.2-3.8x up to m1024.

    In f32/parity mode (mm="f32") stay on Pallas wherever it tiles: both
    routes then do exact f32 math, but XLA's would pay HIGHEST-precision
    dequant-dot costs and parity runs are not perf-critical anyway.
    The XLA route remains reachable explicitly (kernel="xla") and as the
    CPU/untileable-shape fallback."""
    if _resolve_mm(None) != "bf16":
        return True
    if packed and k * n >= 16 * 1024 * 1024 and m <= 1024:
        return True
    if bits >= 8:
        return m <= 64
    return m <= (128 if bits >= 4 else 256)


def quant_dense(x: jnp.ndarray, qleaf: dict) -> jnp.ndarray:
    """Batched dense through a quantized weight; dispatches Pallas/XLA.

    Route precedence: ``set_quant_config(kernel=...)`` >
    ``ASR_TPU_QUANT_KERNEL`` env > "auto" per-shape heuristic.  Shapes the
    Pallas kernels cannot tile always fall back to XLA."""
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    n = qleaf["q"].shape[1]
    route = _resolve_kernel()
    if jax.default_backend() == "tpu" and route != "xla":
        bits = int(qleaf["bits"]) if "bits" in qleaf else 8
        packed = bool(qleaf["packed"]) if "packed" in qleaf else False
        if route == "pallas" or _auto_prefers_pallas(
                x2.shape[0], bits, packed, k=k, n=n):
            out = _pallas_quant_dense_2d(x2, qleaf)
            if out is not None:
                return out.reshape(orig_shape[:-1] + (n,))
    out = _xla_quant_dense(x2, qleaf)
    return out.reshape(orig_shape[:-1] + (n,))


def _kernel_p4(x_lo_ref, x_hi_ref, q_ref, scale_ref, zero_ref, o_ref, acc_ref, *,
               block: int, n_k2_tiles: int, mm: str = "f32"):
    """Packed-int4 grid (M_tiles, N_tiles, K2_tiles): each K2-tile covers
    matching row ranges of BOTH K-halves (low/high nibble planes).
    scale/zero arrive as (2, NB_half, TN) — the nibble plane is a STATIC
    index; the kt row offset is 8-aligned by construction when multi-tile."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = q_ref[:].astype(jnp.int32) & 0xFF   # int8 -> unsigned byte view
    tk2, tn = u.shape
    nb = tk2 // block

    def plane_sz(plane):
        if n_k2_tiles == 1:
            return scale_ref[plane], zero_ref[plane]
        # nb == 8 by dispatch (tile_k2 = 8*block): aligned extent/offset.
        return (scale_ref[plane, pl.ds(pl.multiple_of(kt * nb, nb), nb), :],
                zero_ref[plane, pl.ds(pl.multiple_of(kt * nb, nb), nb), :])

    if mm == "bf16":
        # Raw nibble ints feed the MXU per K-block; scale/zero apply as a
        # rank-1 affine on the (TM, TN) partial (see _kernel) — VPU cost
        # drops from ~6 ops/weight to unpack + one convert.
        for plane, (vals, x_r) in enumerate((((u & 0xF), x_lo_ref),
                                             (((u >> 4) & 0xF), x_hi_ref))):
            s, z = plane_sz(plane)
            zs = z * s
            v16 = vals.astype(jnp.bfloat16)
            x16 = x_r[:].astype(jnp.bfloat16)
            for b in range(nb):
                sl = slice(b * block, (b + 1) * block)
                p = jnp.dot(x16[:, sl], v16[sl, :],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                xs = jnp.sum(x16[:, sl].astype(jnp.float32), axis=1)
                acc_ref[:] += p * s[b][None, :] - xs[:, None] * zs[b][None, :]
    else:
        _mm_cfg(mm)
        for plane, (vals, x_r) in enumerate((((u & 0xF), x_lo_ref),
                                             (((u >> 4) & 0xF), x_hi_ref))):
            s, z = plane_sz(plane)
            vb = vals.astype(jnp.float32).reshape(nb, block, tn)
            w = ((vb - z[:, None, :]) * s[:, None, :]).reshape(tk2, tn)
            acc_ref[:] += jnp.dot(x_r[:], w, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(kt == n_k2_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "tile_m", "tile_n", "tile_k2", "interpret", "mm")
)
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
    mm: str = "f32",
) -> jnp.ndarray:
    """x (M, K) @ dequant(packed (K/2, N) int4-halves) -> (M, N)."""
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2
    n_k2_tiles = k2 // tile_k2
    nb_half = k2 // block
    grid = (m // tile_m, n // tile_n, n_k2_tiles)
    kernel = functools.partial(_kernel_p4, block=block, n_k2_tiles=n_k2_tiles, mm=mm)
    k2_blocks = k2 // tile_k2
    scale3 = scale.reshape(2, nb_half, n)  # one plane per nibble half
    zero3 = zero.reshape(2, nb_half, n)
    sz_spec = pl.BlockSpec((2, nb_half, tile_n), lambda i, j, kt: (0, 0, j),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k2), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_k2), lambda i, j, kt, kb=k2_blocks: (i, kt + kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k2, tile_n), lambda i, j, kt: (kt, j), memory_space=pltpu.VMEM),
            sz_spec, sz_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, x, packed, scale3, zero3)
