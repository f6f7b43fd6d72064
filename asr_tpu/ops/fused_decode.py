"""Single-Pallas-call Qwen3 decode step: all layers, one kernel.

Batch-1 AR decode of the LLM-decoder ASR families (Qwen3-ASR /
Fun-ASR-Nano; reference ``Qwen_ASR/Export_Qwen_ASR.py:1080-1350`` runs the
same stack as one ONNX session call) is HBM-bandwidth-bound on the
quantized weight bytes, but splitting the step into ~112 per-weight
kernel dispatches leaves the DMA engines idle between calls. Measured on
v5e (tools/validate_fused_decode.py, t_max=240, in-kernel tied head):
per-weight path 0.96 ms/step vs THIS kernel 0.71 ms/step (1.34x) —
~511 GB/s including the KV-cache traffic, against a ~740 GB/s chip
ceiling; the residual gap is per-strip VPU unpack/convert throughput
(see the measured-negative variants in ``strip_dots``).

This kernel runs the ENTIRE decode step (28 layers x qkv/attention/o/
gated-FFN) as ONE ``pallas_call`` with ``grid=(num_layers,)``:

- packed-int4 weights stay in HBM (``memory_space=ANY``) and stream
  through two ``_SLOTS``-deep VMEM strip pools via explicit
  ``make_async_copy`` (pool A: N-strips of qkv/gateup, pool B: K-strips
  of o/down) — the pools are reused across all four weights of every
  layer, which is what a blocked auto-pipeline cannot express within the
  16 MB VMEM budget;
- strips never dequantize to memory: raw nibble planes feed the MXU in
  bf16 (0..15 exact) with the block-quant affine applied as a rank-1
  correction per 128-row quant block —
  ``x @ ((q - z) s) = (x @ q) s - (sum x)(z s)`` — so VPU cost per weight
  is unpack + one convert (a full per-element dequant variant measured
  0.95 ms/step: VPU-bound, slower than the per-weight kernels);
- the per-layer KV cache (f32, head-major rows) is DMA'd into VMEM,
  used for GQA attention (per-kv-head dots, f32 softmax) with the fresh
  k/v row overriding column ``pos`` of the scores (Mosaic forbids
  dynamic-sublane stores into the cache tile), and written back to the
  input/output-aliased HBM cache as an 8-row aligned patch;
- RoPE (GPT-NeoX half rotation) and q/k RMSNorm run in-kernel on
  (heads, 128) tiles.

Numerics: activations cast to bf16 for the MXU with f32 accumulation
(weights stay EXACT — tighter than the per-weight kernels' post-dequant
bf16 rounding); norms, softmax and residuals are f32. This kernel is
q4-packed-only; other layouts keep the per-weight kernels.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# Weight-strip pool depth. 2 = classic double buffering. A depth of 3 was
# measured on v5e (r3) and bought NOTHING (0.711 vs 0.713 ms/step at
# t_max=240) — the strip path is bounded by per-strip VPU unpack/convert
# throughput, not by DMA latency — so 2 keeps the extra ~1.5 MB of VMEM
# available for longer KV caches (fused_fits accounts _SLOTS strips).
_SLOTS = 2


def _plan(h: int, n_heads: int, n_kv: int, f: int, block: int):
    """Static strip plan. Returns None when the geometry doesn't tile."""
    if h % 2 or (h // 2) % block:
        return None
    ra = h // 2                      # packed rows of qkv / gateup (K = H)
    qn = (n_heads + 2 * n_kv) * 128  # fused qkv output width
    gn = 2 * f                       # fused gateup output width
    wa = math.gcd(qn, gn)
    while wa > 2048:
        wa //= 2
    if wa % 128:
        return None
    ok2 = n_heads * 128 // 2         # packed rows of o (K = heads*128)
    dk2 = f // 2                     # packed rows of down (K = F)
    rb = math.gcd(ok2, dk2)
    while rb > 512:
        rb //= 2
    if rb % block:
        return None
    return {
        "ra": ra, "wa": wa, "qn": qn, "gn": gn,
        "rb": rb, "ok2": ok2, "dk2": dk2,
        "n_qkv": qn // wa, "n_gu": gn // wa,
        "n_o": ok2 // rb, "n_d": dk2 // rb,
    }


def stack_decode_params(params: dict, cfg) -> dict | None:
    """Fused/quantized Qwen3 params -> stacked arrays for the megakernel.

    Requires every layer to carry packed-int4 ``qkv``/``o``/``gateup``/
    ``down`` QuantizedLinear leaves (same block), q/k RMSNorm, no attention
    bias, head_dim 128. Returns None when the structure doesn't match —
    callers fall back to the per-weight path.

    When ``params["embed"]`` is a :class:`QuantizedEmbedding` carrying the
    nibble-packed tied-head copy with a compatible layout, the head arrays
    ("wh"/"h_s"/"h_zs") are included too and the kernel streams the LM
    head through the same weight pool right after the last layer (the
    head is ~30% of the decode step's HBM bytes — a separate dispatch
    both re-pays kernel launch latency and streams slower)."""
    from asr_tpu.quant.quantize import QuantizedEmbedding, QuantizedLinear

    if not isinstance(params, dict):  # prompt-only sessions pass None
        return None
    if cfg.head_dim != 128 or not cfg.qk_norm or cfg.attention_bias:
        return None
    layers = params.get("layers")
    if not layers:
        return None

    def leaf(p, *keys):
        for k in keys:
            if not isinstance(p, dict) or k not in p:
                return None
            p = p[k]
        if not isinstance(p, dict) or "b" in p:
            return None
        w = p.get("w")
        if not (isinstance(w, QuantizedLinear) and w.packed and w.bits == 4
                and not w.dynamic):
            return None
        return w

    rows = {"qkv": [], "o": [], "gu": [], "dn": []}
    norms = {"in": [], "post": [], "qn": [], "kn": []}
    block = None
    for p in layers:
        ws = {
            "qkv": leaf(p, "attn", "qkv"), "o": leaf(p, "attn", "o"),
            "gu": leaf(p, "mlp", "gateup"), "dn": leaf(p, "mlp", "down"),
        }
        if any(w is None for w in ws.values()):
            return None
        if block is None:
            block = ws["qkv"].block
        if any(w.block != block for w in ws.values()):
            return None
        for k, w in ws.items():
            rows[k].append(w)
        norms["in"].append(p["input_norm"]["scale"])
        norms["post"].append(p["post_norm"]["scale"])
        norms["qn"].append(p["attn"]["q_norm"]["scale"])
        norms["kn"].append(p["attn"]["k_norm"]["scale"])
    final = params.get("final_norm")
    if not (isinstance(final, dict) and "scale" in final):
        return None  # the kernel emits FINAL-NORMALIZED hidden

    plan = _plan(cfg.hidden, cfg.num_heads, cfg.num_kv_heads, cfg.ffn_dim, block)
    if plan is None:
        return None
    qkv0 = rows["qkv"][0]
    if (qkv0.q.shape != (plan["ra"], plan["qn"])
            or rows["o"][0].q.shape != (plan["ok2"], cfg.hidden)
            or rows["gu"][0].q.shape != (plan["ra"], plan["gn"])
            or rows["dn"][0].q.shape != (plan["dk2"], cfg.hidden)):
        return None

    def sz(ws):
        # (NL, 2, nb_half, N) scale and zero*scale, nibble-plane-major
        # (plane 0 = low nibble = unpacked rows [0, K/2); matches
        # quant_matmul's scale3 layout).
        s = jnp.stack([w.scale.astype(jnp.float32) for w in ws])
        z = jnp.stack([(w.zero * w.scale).astype(jnp.float32) for w in ws])
        nl, nb2, n = s.shape
        return s.reshape(nl, 2, nb2 // 2, n), z.reshape(nl, 2, nb2 // 2, n)

    # Only arrays in the stacked dict — it crosses jit boundaries; the
    # static plan is recomputed from cfg + shapes inside fused_decode_step.
    out = {}
    out["wq"] = jnp.stack([w.q for w in rows["qkv"]])
    out["wo"] = jnp.stack([w.q for w in rows["o"]])
    out["wgu"] = jnp.stack([w.q for w in rows["gu"]])
    out["wd"] = jnp.stack([w.q for w in rows["dn"]])
    out["qkv_s"], out["qkv_zs"] = sz(rows["qkv"])
    out["o_s"], out["o_zs"] = sz(rows["o"])
    out["gu_s"], out["gu_zs"] = sz(rows["gu"])
    out["dn_s"], out["dn_zs"] = sz(rows["dn"])
    for k, key in (("in", "in_s"), ("post", "post_s"), ("qn", "qn_s"), ("kn", "kn_s")):
        out[key] = jnp.stack([v.astype(jnp.float32) for v in norms[k]])
    out["fn_s"] = final["scale"].astype(jnp.float32)[None, :]  # (1, H)

    emb = params.get("embed")
    if (isinstance(emb, QuantizedEmbedding) and emb.q_t is not None
            and emb.q_t_packed and emb.bits == 4 and emb.block == block
            and emb.q_t.shape[0] == plan["ra"]
            and emb.q_t.shape[1] % plan["wa"] == 0):
        nbh2 = emb.scale_t.shape[0]
        vpad = emb.q_t.shape[1]
        out["wh"] = emb.q_t
        out["h_s"] = emb.scale_t.astype(jnp.float32).reshape(
            1, 2, nbh2 // 2, vpad)
        out["h_zs"] = (emb.zero_t * emb.scale_t).astype(jnp.float32).reshape(
            1, 2, nbh2 // 2, vpad)
    return out


def fused_fits(cfg, t: int, block: int = 128, budget: int = 14 << 20,
               cache_bytes: int = 2, head_cols: int = 0) -> bool:
    """Whether the megakernel's VMEM footprint fits at cache length ``t``.

    Counts the scratch pools, the double-buffered per-layer scale blocks,
    the resident norm tables and the f32 KV tiles against ``budget``
    (v5e has ~16 MB VMEM/core; the margin absorbs Mosaic's own buffers).
    Callers fall back to the per-weight path when this returns False —
    long-context decodes trade the fused kernel for cache capacity."""
    p = _plan(cfg.hidden, cfg.num_heads, cfg.num_kv_heads, cfg.ffn_dim, block)
    if p is None or t % 8 or cfg.head_dim != 128:
        return False
    kvw = cfg.num_kv_heads * 128
    h = cfg.hidden
    fixed = (
        _SLOTS * p["ra"] * p["wa"]                       # pool_a (int8)
        + _SLOTS * p["rb"] * h                           # pool_b (int8)
        # in-register nibble planes of the live strip (bf16 convert)
        + 3 * max(p["ra"] * p["wa"], p["rb"] * h)
        + 4 * 8 * kvw * cache_bytes                      # kpatch/vpatch
        + (2 * cfg.num_heads + cfg.num_kv_heads) * 128 * 4  # qm/ctx/km
        + (2 * h + cfg.num_heads * 128 + 2 * 128) * 4    # xs, x, xo, cos/sin
    )
    scales = 2 * 2 * 4 * (
        (h // 2 // block) * (p["qn"] + p["gn"])
        + (p["ok2"] // block + p["dk2"] // block) * h
    )
    norms = 4 * cfg.num_layers * (2 * h + 2 * 128)
    kv = 2 * 2 * t * kvw * cache_bytes
    # fused tied head: full (1, V_pad) logits block + double-buffered
    # scale/zero*scale strips + the xn scratch
    head = head_cols * 4 + 2 * 2 * 2 * 4 * (h // 2 // block) * p["wa"] + h * 4
    return fixed + scales + norms + kv + (head if head_cols else 0) <= budget


def _rot_half(x):
    """GPT-NeoX rotate_half on (heads, 128) tiles: [-x[:, 64:], x[:, :64]]."""
    return jnp.concatenate([-x[:, 64:], x[:, :64]], axis=1)


def _strip_dots(pool, slot, sem, s_ref, zs_ref, x_row, rows, width,
                nb_strip, kblk0, col0, x_lo0, x_hi0, block):
    """Wait for the strip in ``pool[slot]`` and return its dequantized
    matvec contribution WITHOUT materializing weights: per quant block
    ``x @ ((q - z) s) = (x @ q) s - (sum x)(z s)`` — raw nibbles feed
    the MXU in bf16 (0..15 are exact) and the affine lands as a rank-1
    correction on the (rows(x), width) partial. VPU cost per weight drops
    to unpack + one convert (a full dequant was ~3x slower end-to-end:
    this kernel's first cut ran 0.83x the per-weight path).

    ``x_row`` may carry ANY number of sublane rows (1 for the batch-1
    megakernel, n_slots for the continuous-batching one) — the dots and
    the rank-1 fixup are rowwise.

    kblk0: first quant-block row of this strip inside the scale array;
    col0: first output column (N-strips) — scale columns slice there.
    x_lo0/x_hi0: lane offsets of the strip's K rows in ``x_row``."""
    pltpu.make_async_copy(pool.at[slot], pool.at[slot], sem.at[slot]).wait()
    # int32 unpack, measured optimal. Tried and rejected on hardware
    # (r3): (a) int8-native masks with the shift-free high-nibble
    # identity hi = ((u & 0xF0) - 2*(u & 0x80)) / 16 — exact but 1.14
    # ms/step vs 0.71 (the int8->bf16 converts cost more than the int32
    # ops they replace; Mosaic legalizes NO 8-bit shift, shrsi or
    # shrui); (b) a 3-deep strip pool — no change (the path is bounded
    # by per-strip VPU convert throughput, not DMA).
    u = pool[slot][:rows, :width].astype(jnp.int32) & 0xFF
    acc = None
    for plane, vals in ((0, u & 0xF), (1, (u >> 4) & 0xF)):
        v16 = vals.astype(jnp.bfloat16)
        xoff = x_lo0 if plane == 0 else x_hi0
        xv = x_row[:, xoff:xoff + rows].astype(jnp.bfloat16)
        for b in range(nb_strip):
            rs = slice(b * block, (b + 1) * block)
            s = s_ref[0, plane, kblk0 + b, pl.ds(col0, width)][None, :]
            zs = zs_ref[0, plane, kblk0 + b, pl.ds(col0, width)][None, :]
            # precision pinned to DEFAULT: a global HIGHEST (parity
            # runs, bench harnesses) would request fp32 contract on
            # bf16 operands, which Mosaic rejects ("Bad lhs type")
            p = jnp.dot(xv[:, rs], v16[rs, :],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            xs = jnp.sum(xv[:, rs].astype(jnp.float32), axis=1,
                         keepdims=True)
            term = p * s - xs * zs
            acc = term if acc is None else acc + term
    return acc


def _kernel(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
            in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
            wq_ref, wo_ref, wgu_ref, wd_ref,
            qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
            gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
            kc_ref, vc_ref,
            h_out_ref, kc_out_ref, vc_out_ref,
            xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
            qm, km, ctx, xo,
            sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv):
    _kernel_impl(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                 in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                 wq_ref, wo_ref, wgu_ref, wd_ref,
                 qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                 gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                 kc_ref, vc_ref,
                 h_out_ref, kc_out_ref, vc_out_ref,
                 xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
                 qm, km, ctx, xo,
                 sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv)


def _kernel_with_head(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                      in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                      wq_ref, wo_ref, wgu_ref, wd_ref,
                      qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                      gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                      kc_ref, vc_ref, wh_ref, h_s_ref, h_zs_ref,
                      h_out_ref, kc_out_ref, vc_out_ref, logits_ref,
                      xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
                      qm, km, ctx, xo, xn,
                      sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv):
    _kernel_impl(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                 in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                 wq_ref, wo_ref, wgu_ref, wd_ref,
                 qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                 gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                 kc_ref, vc_ref,
                 h_out_ref, kc_out_ref, vc_out_ref,
                 xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
                 qm, km, ctx, xo,
                 sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv,
                 head=(wh_ref, h_s_ref, h_zs_ref, logits_ref, xn))


def _kernel_impl(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                 in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                 wq_ref, wo_ref, wgu_ref, wd_ref,
                 qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                 gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                 kc_ref, vc_ref,
                 h_out_ref, kc_out_ref, vc_out_ref,
                 xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
                 qm, km, ctx, xo,
                 sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv,
                 head=None):
    (nl, h, n_heads, n_kv, f, block, t, eps, ra, wa, qn, gn,
     rb, ok2, dk2, n_qkv, n_gu, n_o, n_d, n_head, S) = cfg_static
    l = pl.program_id(0)
    na, nb = n_qkv + n_gu, n_o + n_d
    pos = smem_ref[0]
    shift = smem_ref[1]
    groups = n_heads // n_kv
    kvw = n_kv * 128

    # ---- DMA plumbing ------------------------------------------------
    def issue_a(lidx, j, slot):
        """Pool-A strip j of layer lidx: qkv N-strip or gateup N-strip."""
        if j < n_qkv:
            src = wq_ref.at[lidx, :, pl.ds(j * wa, wa)]
        else:
            src = wgu_ref.at[lidx, :, pl.ds((j - n_qkv) * wa, wa)]
        pltpu.make_async_copy(src, pool_a.at[slot], sem_a.at[slot]).start()

    def issue_b(lidx, j, slot):
        """Pool-B strip j of layer lidx: o K-strip or down K-strip."""
        if j < n_o:
            src = wo_ref.at[lidx, pl.ds(j * rb, rb), :]
        else:
            src = wd_ref.at[lidx, pl.ds((j - n_o) * rb, rb), :]
        pltpu.make_async_copy(src, pool_b.at[slot], sem_b.at[slot]).start()

    def issue_head(hj, slot):
        """Pool-A strip hj of the fused tied LM head (reuses pool A: the
        head's packed K rows equal ra — K is the hidden dim for both)."""
        wh_ref = head[0]
        off = hj * wa if isinstance(hj, int) else pl.multiple_of(hj * wa, wa)
        pltpu.make_async_copy(wh_ref.at[:, pl.ds(off, wa)],
                              pool_a.at[slot], sem_a.at[slot]).start()

    def next_a(i):
        """After consuming pool-A sequence position i of layer l, refill the
        slot with sequence position i+S (same slot: strips are globally
        sequenced, slot = global index mod S)."""
        j = i + S
        slot = (l * na + j) % S
        if j < na:
            issue_a(l, j, slot)
        else:
            @pl.when(l + 1 < nl)
            def _():
                issue_a(l + 1, j - na, slot)
            if head is not None and j - na < n_head:
                # the last layer's refills roll into the head strips
                @pl.when(l + 1 == nl)
                def _():
                    issue_head(j - na, slot)

    def next_b(i):
        j = i + S
        slot = (l * nb + j) % S
        if j < nb:
            issue_b(l, j, slot)
        else:
            @pl.when(l + 1 < nl)
            def _():
                issue_b(l + 1, j - nb, slot)

    @pl.when(l == 0)
    def _():
        xs[:] = x_ref[:]
        for j in range(S):  # S <= min(na, nb), enforced by the caller
            issue_a(0, j, j)
            issue_b(0, j, j)
        pltpu.make_async_copy(kc_ref.at[0], kbuf.at[0], sem_k.at[0]).start()
        pltpu.make_async_copy(vc_ref.at[0], vbuf.at[0], sem_v.at[0]).start()

    def rmsnorm(v, scale_row):
        v32 = v.astype(jnp.float32)
        var = jnp.mean(v32 * v32, axis=-1, keepdims=True)
        return v32 * jax.lax.rsqrt(var + eps) * scale_row

    # ---- strip consumption: raw nibbles -> MXU, rank-1 affine fixup ----
    def strip_dots(pool, slot, sem, s_ref, zs_ref, x_row, rows, width,
                   nb_strip, kblk0, col0, x_lo0, x_hi0):
        return _strip_dots(pool, slot, sem, s_ref, zs_ref, x_row, rows,
                           width, nb_strip, kblk0, col0, x_lo0, x_hi0, block)

    def head_body():
        # ---- fused tied LM head: one pool-A strip of (D/2, wa) nibbles
        # per grid step, consuming the final-normalized hidden in ``xn``.
        wh_ref, h_s_ref, h_zs_ref, logits_ref, xn = head
        hj = l - nl
        slot = (nl * na + hj) % S
        acc = strip_dots(pool_a, slot, sem_a, h_s_ref, h_zs_ref, xn[0:1, :],
                         ra, wa, ra // block, 0, 0, 0, ra)
        @pl.when(hj + S < n_head)
        def _():
            issue_head(hj + S, slot)
        logits_ref[:] = acc

    def layer_body():
        # ---- 1. input norm + qkv ------------------------------------------
        x = xs[:]
        in_s = in_s_ref[pl.ds(l, 1), :]
        y = rmsnorm(x, in_s)
        qkv_parts = []
        for i in range(n_qkv):
            slot = (l * na + i) % S
            part = strip_dots(pool_a, slot, sem_a, qkv_s_ref, qkv_zs_ref, y,
                              ra, wa, ra // block, 0, i * wa, 0, ra)
            next_a(i)
            qkv_parts.append(part)
        qkv = jnp.concatenate(qkv_parts, axis=1) if len(qkv_parts) > 1 else qkv_parts[0]

        # ---- 2. heads: q/k norm + rope; cache update; GQA attention -------
        qd = n_heads * 128
        for hh in range(n_heads):
            qm[hh:hh + 1, :] = qkv[:, 128 * hh:128 * (hh + 1)]
        for hh in range(n_kv):
            km[hh:hh + 1, :] = qkv[:, qd + 128 * hh:qd + 128 * (hh + 1)]
        v_row = qkv[:, qd + kvw:qd + 2 * kvw]  # (1, kvw)

        cos = cos_ref[:]
        sin = sin_ref[:]
        q = rmsnorm(qm[:], qn_s_ref[pl.ds(l, 1), :])
        k = rmsnorm(km[:], kn_s_ref[pl.ds(l, 1), :])
        q = q * cos + _rot_half(q) * sin
        k = k * cos + _rot_half(k) * sin

        sl = l % 2
        s1 = (l + 1) % 2
        pos8 = pl.multiple_of((pos // 8) * 8, 8)

        def wb_dma(buf, out_ref, sem, slot, lidx):
            """The (8, kvw) cache-patch writeback kpatch/vpatch[slot] -> rows
            [pos8, pos8+8) of layer ``lidx``. Mosaic requires sublane slices of
            tiled HBM memrefs to be 8-aligned, so the single updated row rides
            in an aligned 8-row patch whose other rows rewrite their existing
            contents. wait() must reconstruct the SAME copy (semaphores count
            bytes)."""
            return pltpu.make_async_copy(
                buf.at[slot], out_ref.at[lidx, pl.ds(pos8, 8), :], sem.at[slot])

        pltpu.make_async_copy(kc_ref.at[l], kbuf.at[sl], sem_k.at[sl]).wait()
        pltpu.make_async_copy(vc_ref.at[l], vbuf.at[sl], sem_v.at[sl]).wait()

        # prefetch next layer's cache (kbuf/vbuf are read-only tiles; the
        # patch writebacks stream from kpatch/vpatch, so no ordering constraint)
        @pl.when(l + 1 < nl)
        def _():
            pltpu.make_async_copy(kc_ref.at[l + 1], kbuf.at[s1], sem_k.at[s1]).start()
            pltpu.make_async_copy(vc_ref.at[l + 1], vbuf.at[s1], sem_v.at[s1]).start()

        # Mosaic cannot store at a dynamic sublane offset, so the new row never
        # enters kbuf/vbuf: the aligned 8-row patch is assembled by vector
        # select (cached rows + fresh row) into kpatch/vpatch (static stores)
        # and DMA'd to HBM; attention overrides column ``pos`` below. Slot sl's
        # previous DMA (issued at layer l-2) must land before the overwrite.
        @pl.when(l >= 2)
        def _():
            wb_dma(kpatch, kc_out_ref, sem_wk, sl, l - 2).wait()
            wb_dma(vpatch, vc_out_ref, sem_wv, sl, l - 2).wait()
        # k heads -> one (1, kvw) row via static stores (lane-concat of
        # sublane-offset slices is not implemented in Mosaic)
        for hh in range(n_kv):
            krow_s[0:1, 128 * hh:128 * (hh + 1)] = k[hh:hh + 1, :]
        in_row = jax.lax.broadcasted_iota(jnp.int32, (8, kvw), 0) + pos8 == pos
        cdt = kpatch.dtype  # cache dtype (bf16 tiles halve traffic + VMEM)
        kpatch[sl] = jnp.where(in_row,
                               jnp.broadcast_to(krow_s[0:1, :].astype(cdt), (8, kvw)),
                               kbuf[sl, pl.ds(pos8, 8), :])
        vpatch[sl] = jnp.where(in_row,
                               jnp.broadcast_to(v_row.astype(cdt), (8, kvw)),
                               vbuf[sl, pl.ds(pos8, 8), :])
        wb_dma(kpatch, kc_out_ref, sem_wk, sl, l).start()
        wb_dma(vpatch, vc_out_ref, sem_wv, sl, l).start()

        kpos = jax.lax.broadcasted_iota(jnp.int32, (groups, t), 1)
        cache_mask = (kpos >= shift) & (kpos < pos)  # row pos comes fresh
        is_pos = kpos == pos
        qscaled32 = q * (128 ** -0.5)
        qscaled = qscaled32.astype(jnp.bfloat16)
        for hh in range(n_kv):
            kh = kbuf[sl, :, 128 * hh:128 * (hh + 1)]  # (T, 128)
            vh = vbuf[sl, :, 128 * hh:128 * (hh + 1)]
            knew = krow_s[0:1, 128 * hh:128 * (hh + 1)]  # (1, 128), sublane 0
            vnew = v_row[:, 128 * hh:128 * (hh + 1)]
            qg = qscaled[groups * hh:groups * (hh + 1), :]  # (groups, 128)
            scores = jax.lax.dot_general(
                qg, kh.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)  # (groups, T)
            # N=1 MXU dots fail Mosaic verification — the fresh-row score is a
            # VPU multiply-reduce instead (f32, tighter than the bf16 cache dot)
            snew = jnp.sum(qscaled32[groups * hh:groups * (hh + 1), :] * knew,
                           axis=1, keepdims=True)  # (groups, 1)
            scores = jnp.where(cache_mask, scores, _NEG)
            scores = jnp.where(is_pos, snew, scores)
            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=1, keepdims=True)
            pc = jnp.where(is_pos, 0.0, probs)
            pn = jnp.sum(jnp.where(is_pos, probs, 0.0), axis=1, keepdims=True)
            ctxh = jnp.dot(pc.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)  # (groups, 128)
            ctx[groups * hh:groups * (hh + 1), :] = ctxh + pn * vnew.astype(jnp.float32)
        for hh in range(n_heads):
            xo[:, 128 * hh:128 * (hh + 1)] = ctx[hh:hh + 1, :]

        # ---- 3. o projection (K-strips) -----------------------------------
        o_acc = None
        for i in range(n_o):
            slot = (l * nb + i) % S
            part = strip_dots(pool_b, slot, sem_b, o_s_ref, o_zs_ref, xo[:],
                              rb, h, rb // block, i * (rb // block), 0,
                              i * rb, ok2 + i * rb)
            next_b(i)
            o_acc = part if o_acc is None else o_acc + part
        x = x + o_acc

        # ---- 4. post norm + gated FFN -------------------------------------
        y2 = rmsnorm(x, post_s_ref[pl.ds(l, 1), :])
        gu_parts = []
        for i in range(n_gu):
            slot = (l * na + n_qkv + i) % S
            part = strip_dots(pool_a, slot, sem_a, gu_s_ref, gu_zs_ref, y2,
                              ra, wa, ra // block, 0, i * wa, 0, ra)
            next_a(n_qkv + i)
            gu_parts.append(part)
        gu = jnp.concatenate(gu_parts, axis=1) if len(gu_parts) > 1 else gu_parts[0]
        hact = jax.nn.silu(gu[:, :f]) * gu[:, f:]

        d_acc = None
        for i in range(n_d):
            slot = (l * nb + n_o + i) % S
            part = strip_dots(pool_b, slot, sem_b, dn_s_ref, dn_zs_ref, hact,
                              rb, h, rb // block, i * (rb // block), 0,
                              i * rb, dk2 + i * rb)
            next_b(n_o + i)
            d_acc = part if d_acc is None else d_acc + part
        xs[:] = x + d_acc

        @pl.when(l == nl - 1)
        def _():
            # Emit the FINAL-NORMALIZED hidden: the LM head consumes it
            # directly, saving a dispatch per decode step. With a fused
            # head it also lands in the ``xn`` scratch the head strips read.
            hn = rmsnorm(xs[:], fn_s_ref[0:1, :])
            h_out_ref[:] = hn
            if head is not None:
                head[4][:] = hn
            # Outstanding row writebacks: layer l on slot sl and (when nl >= 2)
            # layer l-1 on slot s1. The waits reconstruct the SAME (1, kvw)
            # row copies — semaphores count bytes.
            wb_dma(kpatch, kc_out_ref, sem_wk, sl, l).wait()
            wb_dma(vpatch, vc_out_ref, sem_wv, sl, l).wait()
            @pl.when(nl >= 2)
            def _():
                wb_dma(kpatch, kc_out_ref, sem_wk, s1, l - 1).wait()
                wb_dma(vpatch, vc_out_ref, sem_wv, s1, l - 1).wait()

    if head is None:
        layer_body()
    else:
        @pl.when(l < nl)
        def _():
            layer_body()

        @pl.when(l >= nl)
        def _():
            head_body()

@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_decode_step(stacked: dict, cfg, x: jnp.ndarray,
                      k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                      pos: jnp.ndarray, shift: jnp.ndarray,
                      cos: jnp.ndarray, sin: jnp.ndarray,
                      interpret: bool = False):
    """One batch-1 decode step through the megakernel.

    Args:
      stacked: from :func:`stack_decode_params`.
      x: (1, H) f32 input embedding row.
      k_cache/v_cache: (NL, T, n_kv*128) head-major rows — f32 or bf16;
        bf16 halves both the per-step HBM traffic and the VMEM tiles
        (double-buffered tiles are the dominant VMEM cost at long T).
      pos: scalar int32 cache slot; shift: scalar int32 left-pad width.
      cos/sin: (1, 128) f32 RoPE rows for the LOGICAL position.

    Returns ``(hidden, logits, k_cache', v_cache')`` — ``hidden`` (1, H)
    f32 is FINAL-NORMALIZED, ``logits`` is the fused tied-head output
    (1, V_pad) f32 when the stacked dict carries head arrays and None
    otherwise (caller runs the separate head kernel), and the caches are
    updated at ``pos`` (aliased in-place on TPU).
    """
    nl, t = k_cache.shape[0], k_cache.shape[1]
    assert t % 8 == 0, "cache length must be sublane-aligned (8-row patches)"
    h = cfg.hidden
    f = cfg.ffn_dim
    block = (h // 2) // stacked["qkv_s"].shape[2]
    p = _plan(h, cfg.num_heads, cfg.num_kv_heads, f, block)
    n_head = (stacked["wh"].shape[1] // p["wa"]) if "wh" in stacked else 0
    # the l==0 prologue issues strips 0..S-1 of layer 0 into both pools
    slots = min(_SLOTS, p["n_qkv"] + p["n_gu"], p["n_o"] + p["n_d"])
    cfg_static = (nl, h, cfg.num_heads, cfg.num_kv_heads, f, block, t,
                  cfg.rms_eps, p["ra"], p["wa"], p["qn"], p["gn"],
                  p["rb"], p["ok2"], p["dk2"], p["n_qkv"], p["n_gu"],
                  p["n_o"], p["n_d"], n_head, slots)
    kvw = cfg.num_kv_heads * 128
    smem = jnp.stack([pos.astype(jnp.int32), shift.astype(jnp.int32)])

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = lambda: pl.BlockSpec(memory_space=pl.ANY)

    def blk(shape):
        # per-layer block of a (NL, ...) array; with a fused head the grid
        # runs past nl, so the index clamps to the last layer (resident, no
        # refetch) — an unclamped index is an OOB block DMA during the head
        # phase, which kills the device.
        ndim = len(shape)
        return pl.BlockSpec(
            (1,) + shape[1:],
            lambda l, nd=ndim: (jnp.minimum(l, nl - 1),) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # smem scalars
        vmem(), vmem(), vmem(),                     # x, cos, sin
        vmem(), vmem(), vmem(), vmem(), vmem(),     # norm tables (full)
        anyspec(), anyspec(), anyspec(), anyspec(),  # weights in HBM
        blk(stacked["qkv_s"].shape), blk(stacked["qkv_zs"].shape),
        blk(stacked["o_s"].shape), blk(stacked["o_zs"].shape),
        blk(stacked["gu_s"].shape), blk(stacked["gu_zs"].shape),
        blk(stacked["dn_s"].shape), blk(stacked["dn_zs"].shape),
        anyspec(), anyspec(),                       # caches
    ]
    out_specs = [vmem(), anyspec(), anyspec()]
    out_shape = [
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    if n_head:
        wa = p["wa"]
        vpad = stacked["wh"].shape[1]
        nbh = stacked["h_s"].shape[2]
        # head scale/zero*scale blocks follow the head grid steps; during
        # the layer phase the index clamps to block 0 (resident, no refetch)
        hs_spec = pl.BlockSpec((1, 2, nbh, wa),
                               lambda g: (0, 0, 0, jnp.maximum(g - nl, 0)),
                               memory_space=pltpu.VMEM)
        in_specs += [anyspec(), hs_spec, hs_spec]   # wh, h_s, h_zs
        out_specs.append(pl.BlockSpec((1, wa),
                                      lambda g: (0, jnp.maximum(g - nl, 0)),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, vpad), jnp.float32))
    cdt = k_cache.dtype
    scratch = [
        pltpu.VMEM((1, h), jnp.float32),                   # xs
        pltpu.VMEM((slots, p["ra"], p["wa"]), jnp.int8),   # pool_a
        pltpu.VMEM((slots, p["rb"], h), jnp.int8),         # pool_b
        pltpu.VMEM((2, t, kvw), cdt),                      # kbuf
        pltpu.VMEM((2, t, kvw), cdt),                      # vbuf
        pltpu.VMEM((2, 8, kvw), cdt),                      # kpatch
        pltpu.VMEM((2, 8, kvw), cdt),                      # vpatch
        pltpu.VMEM((1, kvw), jnp.float32),                 # krow_s
        pltpu.VMEM((cfg.num_heads, 128), jnp.float32),     # qm
        pltpu.VMEM((cfg.num_kv_heads, 128), jnp.float32),  # km
        pltpu.VMEM((cfg.num_heads, 128), jnp.float32),     # ctx
        pltpu.VMEM((1, cfg.num_heads * 128), jnp.float32),  # xo
    ]
    if n_head:
        scratch.append(pltpu.VMEM((1, h), jnp.float32))     # xn
    scratch += [
        pltpu.SemaphoreType.DMA((slots,)), pltpu.SemaphoreType.DMA((slots,)),  # sem_a/b
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),          # sem_k/v
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),          # sem_wk/wv
    ]
    kernel = functools.partial(_kernel_with_head if n_head else _kernel,
                               cfg_static)
    args = [smem, x, cos, sin,
            stacked["in_s"], stacked["post_s"], stacked["qn_s"],
            stacked["kn_s"], stacked["fn_s"],
            stacked["wq"], stacked["wo"], stacked["wgu"], stacked["wd"],
            stacked["qkv_s"], stacked["qkv_zs"], stacked["o_s"],
            stacked["o_zs"], stacked["gu_s"], stacked["gu_zs"],
            stacked["dn_s"], stacked["dn_zs"],
            k_cache, v_cache]
    if n_head:
        args += [stacked["wh"], stacked["h_s"], stacked["h_zs"]]
    outs = pl.pallas_call(
        kernel,
        grid=(nl + n_head,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={21: 1, 22: 2},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*args)
    if n_head:
        hidden, kc, vc, logits = outs
        return hidden, logits, kc, vc
    hidden, kc, vc = outs
    return hidden, None, kc, vc
