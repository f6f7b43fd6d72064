"""Multi-slot Qwen3 decode megakernel: one pallas_call advances EVERY
continuous-batching slot by one token.

The continuous-batching engine (``parallel/llm_batcher.py``) gives each
request its own compact KV cache and per-row position so requests join
and leave a running batch mid-flight. Its first implementation stepped
through ``layers/qwen3.decoder_step_rowwise`` — per-row RoPE gathers and
per-row scatter KV writes that XLA lowers to serialized scatter loops,
measured 4x slower per step than the lockstep batch path on v5e (r3
verdict). This kernel removes that gap by extending the batch-1 decode
megakernel (``ops/fused_decode.py``) to ``n_slots`` rows:

- the packed-int4 weight strips stream through the SAME two VMEM pools
  (pool A: N-strips of qkv/gateup, pool B: K-strips of o/down) — the x
  operand simply grows from (1, H) to (B, H), so every strip's matvec
  becomes a (B, K)x(K, N) MXU dot and the weight bytes (the dominant
  HBM traffic) are amortized over all B slots;
- each slot's per-layer KV cache tile (T, n_kv*128) is DMA'd through a
  double-buffered pair cycled over the (layer, slot) sequence; per-slot
  attention runs exactly the batch-1 kernel's GQA math with that slot's
  own position, and the fresh k/v row goes back as an 8-row aligned
  patch to the slot's cache plane;
- per-slot positions ride in SMEM; an inactive slot passes position -1:
  every cache key masks to -1e30 (finite garbage the caller discards)
  and the patch write degenerates to rewriting rows [0, 8) with their
  existing contents — no state corruption, no NaNs;
- RoPE/q-k-RMSNorm run on (B*heads, 128) tiles; cos/sin arrive as
  per-slot (B, 128) rows (compact layout: cache slot == logical
  position, so the caller gathers table rows at each slot's position).

Reference semantics being accelerated: the decode stack of
``Qwen_ASR/Export_Qwen_ASR.py:1080-1350`` / its batch-1 ONNX decode loop
(``Qwen_ASR/Inference_Qwen_ASR_ONNX.py``); the reference has no
multi-request engine at all.

Numerics match the batch-1 megakernel: bf16 MXU dots with f32
accumulation, EXACT raw-nibble weights, f32 norms/softmax/residuals.
Per-slot results are independent of which other slots are live (tested
in ``tests/test_fused_decode_multi.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_tpu.ops.fused_decode import _NEG, _plan, _rot_half, _strip_dots, _SLOTS


def fused_fits_multi(cfg, b_slots: int, t: int, block: int = 128,
                     budget: int = 14 << 20, cache_bytes: int = 2,
                     head_cols: int = 0) -> bool:
    """Whether the multi-slot megakernel's VMEM footprint fits.

    Unlike the batch-1 kernel, the KV tiles are PER-SLOT (the slot loop
    cycles one (T, kvw) tile pair), so the cache term does not scale with
    ``b_slots`` — only the activation rows do. Callers fall back to the
    rowwise XLA step when this returns False."""
    p = _plan(cfg.hidden, cfg.num_heads, cfg.num_kv_heads, cfg.ffn_dim, block)
    if p is None or t % 8 or cfg.head_dim != 128 or b_slots < 2:
        return False
    kvw = cfg.num_kv_heads * 128
    h = cfg.hidden
    bs = b_slots
    fixed = (
        _SLOTS * p["ra"] * p["wa"]                       # pool_a (int8)
        + _SLOTS * p["rb"] * h                           # pool_b (int8)
        + 3 * max(p["ra"] * p["wa"], p["rb"] * h)        # live strip planes
        + 4 * 8 * kvw * cache_bytes                      # kpatch/vpatch
        + (2 * bs * cfg.num_heads + bs * cfg.num_kv_heads) * 128 * 4  # qm/ctx/km
        + kvw * 4                                        # krow_s
        + (2 * bs * h + bs * cfg.num_heads * 128 + 2 * bs * 128) * 4  # xs/x/xo/cos/sin
    )
    scales = 2 * 2 * 4 * (
        (h // 2 // block) * (p["qn"] + p["gn"])
        + (p["ok2"] // block + p["dk2"] // block) * h
    )
    norms = 4 * cfg.num_layers * (2 * h + 2 * 128)
    kv = 2 * 2 * t * kvw * cache_bytes                   # per-slot tiles, x2 buffers
    # head: double-buffered (bs, wa) logits tiles (the full V_pad logits
    # live in HBM; only the grid block is VMEM-resident), double-buffered
    # scale/zero*scale strips, and the xn scratch
    head = (2 * bs * p["wa"] * 4
            + 2 * 2 * 2 * 4 * (h // 2 // block) * p["wa"] + bs * h * 4)
    return fixed + scales + norms + kv + (head if head_cols else 0) <= budget


def _kernel_multi(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                  in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                  wq_ref, wo_ref, wgu_ref, wd_ref,
                  qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                  gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                  kc_ref, vc_ref,
                  h_out_ref, kc_out_ref, vc_out_ref,
                  xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
                  qm, km, ctx, xo,
                  sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv):
    _kernel_multi_impl(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                       in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                       wq_ref, wo_ref, wgu_ref, wd_ref,
                       qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                       gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                       kc_ref, vc_ref,
                       h_out_ref, kc_out_ref, vc_out_ref,
                       xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch, krow_s,
                       qm, km, ctx, xo,
                       sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv)


def _kernel_multi_with_head(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
                            in_s_ref, post_s_ref, qn_s_ref, kn_s_ref, fn_s_ref,
                            wq_ref, wo_ref, wgu_ref, wd_ref,
                            qkv_s_ref, qkv_zs_ref, o_s_ref, o_zs_ref,
                            gu_s_ref, gu_zs_ref, dn_s_ref, dn_zs_ref,
                            kc_ref, vc_ref, wh_ref, h_s_ref, h_zs_ref,
                            h_out_ref, kc_out_ref, vc_out_ref, logits_ref,
                            xs, pool_a, pool_b, kbuf, vbuf, kpatch, vpatch,
                            krow_s, qm, km, ctx, xo, xn,
                            sem_a, sem_b, sem_k, sem_v, sem_wk, sem_wv):
    _kernel_multi_impl(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
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


def _kernel_multi_impl(cfg_static, smem_ref, x_ref, cos_ref, sin_ref,
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
    (nl, h, n_heads, n_kv, f, block, t, eps, bs, ra, wa, qn, gn,
     rb, ok2, dk2, n_qkv, n_gu, n_o, n_d, n_head, S) = cfg_static
    l = pl.program_id(0)
    na, nb = n_qkv + n_gu, n_o + n_d
    groups = n_heads // n_kv
    kvw = n_kv * 128
    qd = n_heads * 128

    # ---- weight-strip DMA plumbing (identical to the batch-1 kernel) --
    def issue_a(lidx, j, slot):
        if j < n_qkv:
            src = wq_ref.at[lidx, :, pl.ds(j * wa, wa)]
        else:
            src = wgu_ref.at[lidx, :, pl.ds((j - n_qkv) * wa, wa)]
        pltpu.make_async_copy(src, pool_a.at[slot], sem_a.at[slot]).start()

    def issue_b(lidx, j, slot):
        if j < n_o:
            src = wo_ref.at[lidx, pl.ds(j * rb, rb), :]
        else:
            src = wd_ref.at[lidx, pl.ds((j - n_o) * rb, rb), :]
        pltpu.make_async_copy(src, pool_b.at[slot], sem_b.at[slot]).start()

    def issue_head(hj, slot):
        wh_ref = head[0]
        off = hj * wa if isinstance(hj, int) else pl.multiple_of(hj * wa, wa)
        pltpu.make_async_copy(wh_ref.at[:, pl.ds(off, wa)],
                              pool_a.at[slot], sem_a.at[slot]).start()

    def next_a(i):
        j = i + S
        slot = (l * na + j) % S
        if j < na:
            issue_a(l, j, slot)
        else:
            @pl.when(l + 1 < nl)
            def _():
                issue_a(l + 1, j - na, slot)
            if head is not None and j - na < n_head:
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

    # ---- KV tile DMA over the (layer, slot) sequence -------------------
    def kv_dma(buf, src_ref, sem, bufslot, lidx, slot_b):
        return pltpu.make_async_copy(src_ref.at[lidx, slot_b],
                                     buf.at[bufslot], sem.at[bufslot])

    def wb_dma(buf, out_ref, sem, bufslot, lidx, slot_b):
        """(8, kvw) patch writeback into rows [pos8, pos8+8) of slot_b's
        plane of layer lidx. pos8 is recomputed from SMEM so a later wait
        reconstructs the SAME copy (semaphores count bytes)."""
        posb = smem_ref[slot_b]
        pos8 = pl.multiple_of((jnp.maximum(posb, 0) // 8) * 8, 8)
        return pltpu.make_async_copy(
            buf.at[bufslot], out_ref.at[lidx, slot_b, pl.ds(pos8, 8), :],
            sem.at[bufslot])

    @pl.when(l == 0)
    def _():
        xs[:] = x_ref[:]
        for j in range(S):
            issue_a(0, j, j)
            issue_b(0, j, j)
        kv_dma(kbuf, kc_ref, sem_k, 0, 0, 0).start()
        kv_dma(vbuf, vc_ref, sem_v, 0, 0, 0).start()

    def rmsnorm(v, scale_row):
        v32 = v.astype(jnp.float32)
        var = jnp.mean(v32 * v32, axis=-1, keepdims=True)
        return v32 * jax.lax.rsqrt(var + eps) * scale_row

    def strip_dots(pool, slot, sem, s_ref, zs_ref, x_row, rows, width,
                   nb_strip, kblk0, col0, x_lo0, x_hi0):
        return _strip_dots(pool, slot, sem, s_ref, zs_ref, x_row, rows,
                           width, nb_strip, kblk0, col0, x_lo0, x_hi0, block)

    def head_body():
        wh_ref, h_s_ref, h_zs_ref, logits_ref, xn = head
        hj = l - nl
        slot = (nl * na + hj) % S
        acc = strip_dots(pool_a, slot, sem_a, h_s_ref, h_zs_ref, xn[:],
                         ra, wa, ra // block, 0, 0, 0, ra)
        @pl.when(hj + S < n_head)
        def _():
            issue_head(hj + S, slot)
        logits_ref[:] = acc

    def layer_body():
        # ---- 1. input norm + qkv (all slots in one MXU pass) ----------
        x = xs[:]
        y = rmsnorm(x, in_s_ref[pl.ds(l, 1), :])
        qkv_parts = []
        for i in range(n_qkv):
            slot = (l * na + i) % S
            part = strip_dots(pool_a, slot, sem_a, qkv_s_ref, qkv_zs_ref, y,
                              ra, wa, ra // block, 0, i * wa, 0, ra)
            next_a(i)
            qkv_parts.append(part)
        qkv = (jnp.concatenate(qkv_parts, axis=1)
               if len(qkv_parts) > 1 else qkv_parts[0])  # (B, qn)

        # ---- 2. stage heads, q/k norm on (B*heads, 128) tiles ---------
        for b in range(bs):
            for hh in range(n_heads):
                qm[b * n_heads + hh:b * n_heads + hh + 1, :] = (
                    qkv[b:b + 1, 128 * hh:128 * (hh + 1)])
            for hh in range(n_kv):
                km[b * n_kv + hh:b * n_kv + hh + 1, :] = (
                    qkv[b:b + 1, qd + 128 * hh:qd + 128 * (hh + 1)])
        q_all = rmsnorm(qm[:], qn_s_ref[pl.ds(l, 1), :])
        k_all = rmsnorm(km[:], kn_s_ref[pl.ds(l, 1), :])
        cos = cos_ref[:]  # (B, 128) per-slot rows
        sin = sin_ref[:]

        # ---- 3. per-slot attention over double-buffered cache tiles ---
        for b in range(bs):
            g = l * bs + b
            sl = g % 2
            s1 = (g + 1) % 2
            pos = smem_ref[b]

            cb = cos[b:b + 1, :]
            sb = sin[b:b + 1, :]
            qb = q_all[b * n_heads:(b + 1) * n_heads, :]
            kb = k_all[b * n_kv:(b + 1) * n_kv, :]
            qb = qb * cb + _rot_half(qb) * sb
            kb = kb * cb + _rot_half(kb) * sb
            v_row = qkv[b:b + 1, qd + kvw:qd + 2 * kvw]

            kv_dma(kbuf, kc_ref, sem_k, sl, l, b).wait()
            kv_dma(vbuf, vc_ref, sem_v, sl, l, b).wait()
            if b + 1 < bs:
                kv_dma(kbuf, kc_ref, sem_k, s1, l, b + 1).start()
                kv_dma(vbuf, vc_ref, sem_v, s1, l, b + 1).start()
            else:
                @pl.when(l + 1 < nl)
                def _():
                    kv_dma(kbuf, kc_ref, sem_k, s1, l + 1, 0).start()
                    kv_dma(vbuf, vc_ref, sem_v, s1, l + 1, 0).start()

            # patch slot sl's previous DMA (global index g-2) must land
            # before the overwrite below
            if b >= 2:
                wb_dma(kpatch, kc_out_ref, sem_wk, sl, l, b - 2).wait()
                wb_dma(vpatch, vc_out_ref, sem_wv, sl, l, b - 2).wait()
            else:
                @pl.when(l >= 1)
                def _():
                    wb_dma(kpatch, kc_out_ref, sem_wk, sl, l - 1, bs + b - 2).wait()
                    wb_dma(vpatch, vc_out_ref, sem_wv, sl, l - 1, bs + b - 2).wait()

            posc = jnp.maximum(pos, 0)
            pos8 = pl.multiple_of((posc // 8) * 8, 8)
            for hh in range(n_kv):
                krow_s[0:1, 128 * hh:128 * (hh + 1)] = kb[hh:hh + 1, :]
            # inactive slots pass pos = -1: in_row is all-False and the
            # patch rewrites rows [0, 8) with their existing contents
            in_row = jax.lax.broadcasted_iota(jnp.int32, (8, kvw), 0) + pos8 == pos
            cdt = kpatch.dtype
            kpatch[sl] = jnp.where(
                in_row,
                jnp.broadcast_to(krow_s[0:1, :].astype(cdt), (8, kvw)),
                kbuf[sl, pl.ds(pos8, 8), :])
            vpatch[sl] = jnp.where(
                in_row,
                jnp.broadcast_to(v_row.astype(cdt), (8, kvw)),
                vbuf[sl, pl.ds(pos8, 8), :])
            wb_dma(kpatch, kc_out_ref, sem_wk, sl, l, b).start()
            wb_dma(vpatch, vc_out_ref, sem_wv, sl, l, b).start()

            kpos = jax.lax.broadcasted_iota(jnp.int32, (groups, t), 1)
            cache_mask = kpos < pos  # compact layout: keys [0, pos)
            is_pos = kpos == pos
            qscaled32 = qb * (128 ** -0.5)
            qscaled = qscaled32.astype(jnp.bfloat16)
            for hh in range(n_kv):
                kh = kbuf[sl, :, 128 * hh:128 * (hh + 1)]
                vh = vbuf[sl, :, 128 * hh:128 * (hh + 1)]
                knew = kb[hh:hh + 1, :]
                vnew = v_row[:, 128 * hh:128 * (hh + 1)]
                qg = qscaled[groups * hh:groups * (hh + 1), :]
                scores = jax.lax.dot_general(
                    qg, kh.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)  # (groups, T)
                snew = jnp.sum(
                    qscaled32[groups * hh:groups * (hh + 1), :] * knew,
                    axis=1, keepdims=True)
                scores = jnp.where(cache_mask, scores, _NEG)
                scores = jnp.where(is_pos, snew, scores)
                m = jnp.max(scores, axis=1, keepdims=True)
                e = jnp.exp(scores - m)
                probs = e / jnp.sum(e, axis=1, keepdims=True)
                pc = jnp.where(is_pos, 0.0, probs)
                pn = jnp.sum(jnp.where(is_pos, probs, 0.0), axis=1,
                             keepdims=True)
                ctxh = jnp.dot(pc.astype(jnp.bfloat16),
                               vh.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
                ctx[b * n_heads + groups * hh:
                    b * n_heads + groups * (hh + 1), :] = (
                    ctxh + pn * vnew.astype(jnp.float32))

        for b in range(bs):
            for hh in range(n_heads):
                xo[b:b + 1, 128 * hh:128 * (hh + 1)] = (
                    ctx[b * n_heads + hh:b * n_heads + hh + 1, :])

        # ---- 4. o projection ------------------------------------------
        o_acc = None
        for i in range(n_o):
            slot = (l * nb + i) % S
            part = strip_dots(pool_b, slot, sem_b, o_s_ref, o_zs_ref, xo[:],
                              rb, h, rb // block, i * (rb // block), 0,
                              i * rb, ok2 + i * rb)
            next_b(i)
            o_acc = part if o_acc is None else o_acc + part
        x = x + o_acc

        # ---- 5. post norm + gated FFN ----------------------------------
        y2 = rmsnorm(x, post_s_ref[pl.ds(l, 1), :])
        gu_parts = []
        for i in range(n_gu):
            slot = (l * na + n_qkv + i) % S
            part = strip_dots(pool_a, slot, sem_a, gu_s_ref, gu_zs_ref, y2,
                              ra, wa, ra // block, 0, i * wa, 0, ra)
            next_a(n_qkv + i)
            gu_parts.append(part)
        gu = (jnp.concatenate(gu_parts, axis=1)
              if len(gu_parts) > 1 else gu_parts[0])
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
            hn = rmsnorm(xs[:], fn_s_ref[0:1, :])
            h_out_ref[:] = hn
            if head is not None:
                head[4][:] = hn
            # outstanding patch writebacks: global g = nl*bs-1 (this body's
            # slot bs-1) and g = nl*bs-2 (slot bs-2; bs >= 2 is enforced)
            wb_dma(kpatch, kc_out_ref, sem_wk, (nl * bs - 1) % 2, l, bs - 1).wait()
            wb_dma(vpatch, vc_out_ref, sem_wv, (nl * bs - 1) % 2, l, bs - 1).wait()
            wb_dma(kpatch, kc_out_ref, sem_wk, (nl * bs - 2) % 2, l, bs - 2).wait()
            wb_dma(vpatch, vc_out_ref, sem_wv, (nl * bs - 2) % 2, l, bs - 2).wait()

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
def fused_decode_step_multi(stacked: dict, cfg, x: jnp.ndarray,
                            k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                            pos: jnp.ndarray,
                            cos: jnp.ndarray, sin: jnp.ndarray,
                            interpret: bool = False):
    """One multi-slot decode step through the megakernel.

    Args:
      stacked: from :func:`asr_tpu.ops.fused_decode.stack_decode_params`
        (the SAME stacked weights the batch-1 kernel uses).
      x: (B, H) f32 input embedding rows (B >= 2 slots).
      k_cache/v_cache: (NL, B, T, n_kv*128) head-major per-slot planes —
        f32 or bf16 (bf16 halves per-step HBM traffic and VMEM tiles).
      pos: (B,) int32 compact cache positions (== tokens so far per
        slot); -1 parks an inactive slot (garbage-but-finite output, no
        cache write).
      cos/sin: (B, 128) f32 RoPE rows at each slot's position.

    Returns ``(hidden, logits, k_cache', v_cache')`` — ``hidden`` (B, H)
    f32 FINAL-NORMALIZED; ``logits`` (B, V_pad) f32 from the fused tied
    head when the stacked dict carries head arrays, else None; caches
    updated at each slot's ``pos`` (aliased in-place on TPU).
    """
    nl, b_slots, t = k_cache.shape[0], k_cache.shape[1], k_cache.shape[2]
    assert t % 8 == 0, "cache length must be sublane-aligned (8-row patches)"
    assert b_slots >= 2, "multi kernel needs >= 2 slots (batch-1 kernel otherwise)"
    h = cfg.hidden
    f = cfg.ffn_dim
    block = (h // 2) // stacked["qkv_s"].shape[2]
    p = _plan(h, cfg.num_heads, cfg.num_kv_heads, f, block)
    n_head = (stacked["wh"].shape[1] // p["wa"]) if "wh" in stacked else 0
    slots = min(_SLOTS, p["n_qkv"] + p["n_gu"], p["n_o"] + p["n_d"])
    cfg_static = (nl, h, cfg.num_heads, cfg.num_kv_heads, f, block, t,
                  cfg.rms_eps, b_slots, p["ra"], p["wa"], p["qn"], p["gn"],
                  p["rb"], p["ok2"], p["dk2"], p["n_qkv"], p["n_gu"],
                  p["n_o"], p["n_d"], n_head, slots)
    kvw = cfg.num_kv_heads * 128
    smem = pos.astype(jnp.int32)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = lambda: pl.BlockSpec(memory_space=pl.ANY)

    def blk(shape):
        ndim = len(shape)
        return pl.BlockSpec(
            (1,) + shape[1:],
            lambda l, nd=ndim: (jnp.minimum(l, nl - 1),) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # per-slot positions
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
        jax.ShapeDtypeStruct((b_slots, h), jnp.float32),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    if n_head:
        wa = p["wa"]
        vpad = stacked["wh"].shape[1]
        nbh = stacked["h_s"].shape[2]
        hs_spec = pl.BlockSpec((1, 2, nbh, wa),
                               lambda g: (0, 0, 0, jnp.maximum(g - nl, 0)),
                               memory_space=pltpu.VMEM)
        in_specs += [anyspec(), hs_spec, hs_spec]   # wh, h_s, h_zs
        out_specs.append(pl.BlockSpec((b_slots, wa),
                                      lambda g: (0, jnp.maximum(g - nl, 0)),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b_slots, vpad), jnp.float32))
    cdt = k_cache.dtype
    scratch = [
        pltpu.VMEM((b_slots, h), jnp.float32),             # xs
        pltpu.VMEM((slots, p["ra"], p["wa"]), jnp.int8),   # pool_a
        pltpu.VMEM((slots, p["rb"], h), jnp.int8),         # pool_b
        pltpu.VMEM((2, t, kvw), cdt),                      # kbuf
        pltpu.VMEM((2, t, kvw), cdt),                      # vbuf
        pltpu.VMEM((2, 8, kvw), cdt),                      # kpatch
        pltpu.VMEM((2, 8, kvw), cdt),                      # vpatch
        pltpu.VMEM((1, kvw), jnp.float32),                 # krow_s
        pltpu.VMEM((b_slots * cfg.num_heads, 128), jnp.float32),     # qm
        pltpu.VMEM((b_slots * cfg.num_kv_heads, 128), jnp.float32),  # km
        pltpu.VMEM((b_slots * cfg.num_heads, 128), jnp.float32),     # ctx
        pltpu.VMEM((b_slots, cfg.num_heads * 128), jnp.float32),     # xo
    ]
    if n_head:
        scratch.append(pltpu.VMEM((b_slots, h), jnp.float32))  # xn
    scratch += [
        pltpu.SemaphoreType.DMA((slots,)), pltpu.SemaphoreType.DMA((slots,)),
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
    ]
    kernel = functools.partial(
        _kernel_multi_with_head if n_head else _kernel_multi, cfg_static)
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
