#!/usr/bin/env python
"""Validate the Pallas kernels on REAL TPU hardware and record the evidence.

Correctness: each kernel vs the XLA dequant reference (max rel err).
Performance: in-jit ``fori_loop`` timing — the repetition lives INSIDE one
compiled executable with a carried data dependency, one dispatch, one
1-element fetch.  Per-dispatch RPC overhead through the axon tunnel is
~1.5-2 ms, which silently dominated the r2 numbers that timed N queued
dispatches (method B); those made XLA look ~2x faster than it is.

Shapes: prefill (M=512) AND decode (M=8) per bit width — the dispatch
heuristic in ``asr_tpu.ops.quant_matmul._auto_prefers_pallas`` is set from
this table.

Writes ``KERNELS_TPU.json`` at the repo root.
Run: ``python tools/validate_kernels_tpu.py`` (requires the axon TPU tunnel).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# The kernels run their f32-mode dots at HIGHEST; the XLA dequant
# reference must match or the comparison measures the REFERENCE's bf16
# pass error (observed 2e-3) instead of the kernel's.
jax.config.update("jax_default_matmul_precision", "highest")


def _fetch(out) -> None:
    """Force completion with a 1-element host read (block_until_ready is
    not trusted through the remote-TPU tunnel for small dispatch chains)."""
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.ravel(leaf)[:1])


def _time_loop(fn, args, iters=500):
    """ms per call of ``fn(*args, bump)`` with the loop inside ONE jit.

    Hoist-proofing: the scalar ``bump`` carry must perturb the WEIGHTS (not
    just the activations) inside ``fn`` — otherwise XLA's loop-invariant
    code motion hoists the dequantize out of the loop and the measurement
    no longer matches what a real per-dispatch execution pays (this
    artifact produced a fictitious '894 TF/s XLA' figure during r3 tuning).
    The result feeds the accumulator so no iteration is dead.

    Full-output consumption: the accumulator sums EVERY output element —
    consuming only out[0] lets XLA slice the dot down to one row x column
    (dead-code elimination through the matmul) while the opaque pallas_call
    still pays full cost, which skews the comparison by >10x.

    Overhead cancellation: the axon tunnel costs ~29 ms per dispatch+fetch
    round trip, so the reported time is the difference quotient
    (t(2N) - t(N)) / N, median of 5."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(i, carry):
            acc, bump = carry
            out = fn(*args, bump)
            return acc + jnp.sum(out.astype(jnp.float32)), bump + jnp.float32(1e-9)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), jnp.float32(0)))
        return acc

    _fetch(loop(args, iters))  # compile both
    _fetch(loop(args, 2 * iters))
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch(loop(args, iters))
        t1 = time.perf_counter()
        _fetch(loop(args, 2 * iters))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / iters)
    diffs.sort()
    return diffs[len(diffs) // 2] * 1e3


def validate_quant_matmul(bits: int, pack: bool, m: int, results: dict) -> None:
    from asr_tpu.ops import quant_matmul as qm
    from asr_tpu.quant.quantize import quantize_linear

    k, n, block = 4096, 1024, 128
    rng = np.random.default_rng(bits)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    qleaf = quantize_linear(w, bits=bits, block=block, pack=pack)

    if m >= 512:
        # XLA-FINAL shape (decision, r5): the Pallas path measured negative
        # at prefill shapes two rounds running (r3+r4: int8 0.54x, int4
        # 0.72x, int2 0.88x vs the XLA dequant-fused dot) and the auto
        # route never picks it — stop compiling/timing the dead path and
        # validate only what serving executes. The route stays reachable
        # explicitly via kernel="pallas" for future re-measurement.
        _validate_xla_final(qm, qleaf, x, m, k, n, block, bits, pack, results)
        return

    pallas_f32 = jax.jit(lambda x: qm._pallas_quant_dense_2d(x, qleaf, mm="f32"))
    pallas_bf16 = jax.jit(lambda x: qm._pallas_quant_dense_2d(x, qleaf, mm="bf16"))

    # Exact ground truth: explicit f32 dequant + HIGHEST dot — independent
    # of _xla_quant_dense, which (correctly) takes the bf16 serving pass on
    # TPU when mm resolves to "bf16".
    from asr_tpu.quant.quantize import dequantize_weight

    want_fn = jax.jit(lambda x: jnp.dot(
        x, dequantize_weight(qleaf, dtype=jnp.float32),
        precision=jax.lax.Precision.HIGHEST))
    want = want_fn(x)
    ref_scale = float(jnp.max(jnp.abs(want))) + 1e-30
    err32 = float(jnp.max(jnp.abs(pallas_f32(x) - want)))
    err16 = float(jnp.max(jnp.abs(pallas_bf16(x) - want)))
    # Timed variants rebuild the qleaf with a bump-perturbed scale so the
    # dequant re-runs every iteration on BOTH routes (see _time_loop).
    from asr_tpu.quant.quantize import QuantizedLinear

    def leaf(q, scale, zero, bump):
        return QuantizedLinear(q, scale * (1 + bump), zero,
                               qleaf.bits, qleaf.block, qleaf.packed)

    # Serving comparison: both routes at serving precision (bf16 MXU
    # passes) — the module-level HIGHEST override is for the correctness
    # reference only and would slow the XLA dot ~5x.
    iters = 2000 if m <= 64 else 600
    with jax.default_matmul_precision("default"):
        p16_ms = _time_loop(
            lambda x, q, s, z, bump: qm._pallas_quant_dense_2d(
                x, leaf(q, s, z, bump), mm="bf16"),
            (x, qleaf["q"], qleaf["scale"], qleaf["zero"]), iters=iters)
        x_ms = _time_loop(
            lambda x, q, s, z, bump: qm._xla_quant_dense(
                x, leaf(q, s, z, bump)).astype(jnp.float32),
            (x, qleaf["q"], qleaf["scale"], qleaf["zero"]), iters=iters)
    name = f"quant_matmul_int{bits}" + ("_packed" if pack else "") + f"_m{m}"
    # What quant_dense actually executes at this shape under the default
    # bf16 serving mode: the per-shape auto dispatch (set from this very
    # table) picks the measured-faster route, so the ROUTED path never
    # loses to pure XLA.  route_speedup_vs_xla is the serving guarantee;
    # speedup_vs_xla remains the raw Pallas-vs-XLA comparison.
    auto_pallas = _auto_route_is_pallas(bits, m, pack)
    route_ms = p16_ms if auto_pallas else x_ms
    results[name] = {
        "shape": [m, k, n],
        "block": block,
        # f32 mode: bit-exact gate vs the XLA dequant reference.
        "max_rel_err_f32_mode": round(err32 / ref_scale, 8),
        # bf16 mode (serving default): one MXU pass; rounding comparable to
        # q8's own quantization error, far below q4/q2's.
        "max_rel_err_bf16_mode": round(err16 / ref_scale, 8),
        "ok": bool(
            err32 / ref_scale < 1e-4
            and err16 / ref_scale < 2e-2
            # dispatch optimality gate: the auto route must pick the
            # measured-faster side at this shape (2% timing slack).
            and route_ms <= min(p16_ms, x_ms) * 1.02
        ),
        "pallas_bf16_ms": round(p16_ms, 4),
        "xla_dequant_ms": round(x_ms, 4),
        "speedup_vs_xla": round(x_ms / p16_ms, 3),
        "auto_route": "pallas" if auto_pallas else "xla",
        "route_ms": round(route_ms, 4),
        "route_speedup_vs_xla": round(x_ms / route_ms, 3),
        "effective_tflops_bf16": round(2 * m * k * n / (route_ms * 1e-3) / 1e12, 3),
        "quant_bytes_gbps": round((k * n * bits / 8) / (route_ms * 1e-3) / 1e9, 1),
    }
    print(name, results[name], flush=True)


def _validate_xla_final(qm, qleaf, x, m, k, n, block, bits, pack,
                        results: dict) -> None:
    """m >= 512: validate + time ONLY the auto-routed XLA path (see the
    decision note at the call site); record the decision in the table."""
    from asr_tpu.quant.quantize import QuantizedLinear, dequantize_weight

    want = jax.jit(lambda x: jnp.dot(
        x, dequantize_weight(qleaf, dtype=jnp.float32),
        precision=jax.lax.Precision.HIGHEST))(x)
    ref_scale = float(jnp.max(jnp.abs(want))) + 1e-30
    err16 = float(jnp.max(jnp.abs(
        jax.jit(lambda x: qm._xla_quant_dense(x, qleaf).astype(jnp.float32))(x)
        - want)))
    # f32/parity mode: force the config so _xla_quant_dense takes the
    # exact dequant + HIGHEST dot path.
    saved = dict(qm._CONFIG)
    try:
        qm._CONFIG.update({"mm": "f32"})
        err32 = float(jnp.max(jnp.abs(
            jax.jit(lambda x: qm._xla_quant_dense(x, qleaf))(x) - want)))
    finally:
        qm._CONFIG.update(saved)

    def leaf(q, scale, zero, bump):
        return QuantizedLinear(q, scale * (1 + bump), zero,
                               qleaf.bits, qleaf.block, qleaf.packed)

    with jax.default_matmul_precision("default"):
        x_ms = _time_loop(
            lambda x, q, s, z, bump: qm._xla_quant_dense(
                x, leaf(q, s, z, bump)).astype(jnp.float32),
            (x, qleaf["q"], qleaf["scale"], qleaf["zero"]), iters=600)
    name = f"quant_matmul_int{bits}" + ("_packed" if pack else "") + f"_m{m}"
    results[name] = {
        "shape": [m, k, n],
        "block": block,
        "max_rel_err_f32_mode": round(err32 / ref_scale, 8),
        "max_rel_err_bf16_mode": round(err16 / ref_scale, 8),
        "ok": bool(err32 / ref_scale < 1e-4 and err16 / ref_scale < 2e-2),
        "xla_dequant_ms": round(x_ms, 4),
        "auto_route": "xla",
        "decision": "xla: FINAL for m>=512 — Pallas measured-negative two "
                    "rounds (r3+r4: int8 0.54x / int4 0.72x / int2 0.88x); "
                    "dead path no longer compiled or timed here",
        "route_ms": round(x_ms, 4),
        "route_speedup_vs_xla": 1.0,
        "effective_tflops_bf16": round(2 * m * k * n / (x_ms * 1e-3) / 1e12, 3),
        "quant_bytes_gbps": round((k * n * bits / 8) / (x_ms * 1e-3) / 1e9, 1),
    }
    print(name, results[name], flush=True)


def _auto_route_is_pallas(bits: int, m: int, pack: bool) -> bool:
    """Resolve the auto dispatch exactly as quant_dense does in the bf16
    serving default (config/env cleared so the heuristic itself decides)."""
    from asr_tpu.ops import quant_matmul as qm

    saved_env = {k: os.environ.pop(k, None)
                 for k in ("ASR_TPU_QUANT_MM", "ASR_TPU_QUANT_KERNEL")}
    saved_cfg = dict(qm._CONFIG)
    try:
        qm._CONFIG.update({"mm": None, "kernel": None})
        return qm._auto_prefers_pallas(m, bits, pack, k=4096, n=1024)
    finally:
        qm._CONFIG.update(saved_cfg)
        for k, v in saved_env.items():
            if v is not None:
                os.environ[k] = v


def main() -> None:
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(json.dumps({"error": f"not a TPU backend: {dev.platform}"}))
        sys.exit(1)
    results = {}
    for m in (512, 8):
        validate_quant_matmul(8, False, m, results)
        validate_quant_matmul(4, True, m, results)
        validate_quant_matmul(2, True, m, results)
    import datetime

    record = {
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        ),
        "device": str(dev),
        "device_kind": getattr(dev, "device_kind", "?"),
        "jax": jax.__version__,
        "timing": "in-jit fori_loop (50 iters), single dispatch, 1-elem fetch",
        "all_ok": all(v["ok"] for v in results.values()),
        "kernels": results,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "KERNELS_TPU.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print("wrote", out, "all_ok =", record["all_ok"])


if __name__ == "__main__":
    main()
