"""Multi-slot AED decode megakernel: one pallas_call advances EVERY
continuous-batching slot of a Whisper/FireRed/Dolphin decoder by one token.

The continuous AED engine (``parallel/aed_batcher.py``) gives each request
its own compact self-KV cache AND its own cross-KV (encoder output), with
per-slot positions so requests join and leave a running batch mid-flight.
Its rowwise XLA step (``aed_decoder_step_rowwise``) is the correctness
path; this kernel is the TPU serving path, combining the two proven
architectures:

- from the batch-1 AED step kernel (``ops/fused_aed_step.py``): the
  strip-pool weight DMA (pool A: column-concatenated qkv|o|cq|co|fc1
  strips, pool B: fc2 K-strips, the q8 rank-1 affine correction), the
  paired-head 128-lane tiling for head_dim-64 attention, the chunk-
  streamed cross attention, and the in-kernel tied head;
- from the multi-slot Qwen kernel (``ops/fused_decode_multi.py``): the
  x operand grows from (1, D) to (B, D) so every weight strip's matvec
  becomes a (B, K)x(K, N) MXU dot — the weight bytes (the dominant HBM
  traffic: ~90 MB of q8 layers + ~66 MB tied head for turbo) stream ONCE
  for all B slots; per-slot attention tiles cycle through one
  double-buffered pool over the (layer, slot) sequence; fresh k/v rows go
  back as 8-row aligned patches to each slot's cache plane; an inactive
  slot passes position -1 (finite garbage out, no cache write).

Per-slot cross-KV rides (NL, B, Tc, D) planes with per-slot ``tc_valid``
in SMEM — each slot attends its own encoder output, which is what makes
this an AED engine rather than a prompt-prefix LLM engine.

Reference being beaten: the strictly batch-1, one-ONNX-launch-per-token
decode loop of ``Whisper/Inference_Whisper_ONNX.py:584-663`` (the
reference has no multi-request engine at all).

Numerics match the batch-1 AED kernel: bf16 MXU dots with f32
accumulation, exact int8-in-bf16 weights, f32 LayerNorms / softmax /
residuals. Per-slot results are independent of which other slots are live
(tested in ``tests/test_fused_aed_multi.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_tpu.ops.fused_decode import _NEG
from asr_tpu.ops.fused_aed_step import _SLOTS, AedGeom, _aed_plan, _strip8


def aed_fused_fits_multi(geom: AedGeom, b_slots: int, t_self: int,
                         t_cross: int, block: int = 128,
                         budget: int = 14 << 20, cache_bytes: int = 2) -> bool:
    """Whether the multi-slot kernel's VMEM plan fits.

    The attention-tile pool is PER-SLOT-SEQUENTIAL (one double-buffered
    pair cycles over the (layer, slot, tile) sequence), so the cache term
    does not scale with ``b_slots`` — only the (B, D) activation rows do.
    """
    p = _aed_plan(geom.d_model, geom.ffn_dim, geom.num_heads, block)
    if p is None or t_self % 8 or geom.head_dim != 64 or b_slots < 2:
        return False
    d = geom.d_model
    tc_chunk = t_cross if t_cross <= 768 else -(-t_cross // 2 // 8) * 8
    if t_cross % tc_chunk:
        return False
    rows = max(t_self, tc_chunk)
    smax = max(t_self, t_cross)
    pairs = geom.num_heads // 2
    bs = b_slots
    fixed = (
        _SLOTS * d * p["wa"]                 # pool_a (int8)
        + _SLOTS * p["rb"] * d               # pool_b (int8)
        + 3 * max(d * p["wa"], p["rb"] * d)  # live strip planes
        + _SLOTS * rows * d * cache_bytes    # attention tile pool
        + 4 * 8 * d * cache_bytes            # k/v patches
        + (2 * pairs) * smax * 4             # scores/probs scratch (1 slot)
        + (2 * pairs) * 128 * 4              # ctx scratch (1 slot)
        + 4 * bs * d * 4                     # xs/xq/xo/xn rows
        + bs * (3 * d + geom.ffn_dim) * 4    # qkv + fc1 activations
    )
    scales = 2 * 2 * 4 * (d // block) * p["na_cols"] \
        + 2 * 2 * 4 * (geom.ffn_dim // block) * d
    biases = 2 * 4 * (p["na_cols"] + d)
    head = 2 * bs * p["wa"] * 4 + 2 * 2 * 4 * (d // block) * p["wa"]
    return fixed + scales + biases + head <= budget


def _kernel(cfg_static, smem_ref, x_ref,
            ln1_s, ln1_b, lnc_s, lnc_b, ln2_s, ln2_b, lnf_s, lnf_b,
            ba_ref, bb_ref,
            wa_ref, a_s_ref, a_zs_ref, wb_ref, b_s_ref, b_zs_ref,
            kself_ref, vself_ref, ck_ref, cv_ref,
            wh_ref, h_s_ref, h_zs_ref,
            kself_out, vself_out, logits_ref,
            xs, pool_a, pool_b, tiles, kpatch, vpatch,
            scores, ctx, xq, xo, xn, qrow_s, krow_s, vrow_s,
            sem_a, sem_b, sem_t, sem_wk, sem_wv):
    (nl, d, heads, ffn, block, bs, t_self, t_cross, tc_chunk, eps,
     wa, rb, na, nb, n_head, off_o, off_cq, off_co, off_fc1) = cfg_static
    l = pl.program_id(0)
    pairs = heads // 2
    n_cc = t_cross // tc_chunk
    n_self = 2 * bs
    n_cross = 2 * n_cc                 # per-slot cross tiles
    n_tiles = n_self + bs * n_cross
    scale = jnp.float32(64) ** -0.5

    # half-lane pair masks: row 0 keeps lanes [0,64), row 1 keeps [64,128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    pmask = ((lane < 64) == (rown == 0)).astype(jnp.float32)

    # ---- weight strips (identical plumbing to the batch-1 AED kernel) ----
    def issue_a(lidx, j, slot):
        pltpu.make_async_copy(wa_ref.at[lidx, :, pl.ds(j * wa, wa)],
                              pool_a.at[slot], sem_a.at[slot]).start()

    def issue_b(lidx, j, slot):
        pltpu.make_async_copy(wb_ref.at[lidx, pl.ds(j * rb, rb), :],
                              pool_b.at[slot], sem_b.at[slot]).start()

    def issue_head(hj, slot):
        off = hj * wa if isinstance(hj, int) else pl.multiple_of(hj * wa, wa)
        pltpu.make_async_copy(wh_ref.at[:, pl.ds(off, wa)],
                              pool_a.at[slot], sem_a.at[slot]).start()

    def next_a(i):
        j = i + _SLOTS
        slot = (l * na + j) % _SLOTS
        if j < na:
            issue_a(l, j, slot)
        else:
            @pl.when(l + 1 < nl)
            def _():
                issue_a(l + 1, j - na, slot)
            if j - na < n_head:
                @pl.when(l + 1 == nl)
                def _():
                    issue_head(j - na, slot)

    def next_b(i):
        j = i + _SLOTS
        slot = (l * nb + j) % _SLOTS
        if j < nb:
            issue_b(l, j, slot)
        else:
            @pl.when(l + 1 < nl)
            def _():
                issue_b(l + 1, j - nb, slot)

    def strips_a(x_row, col0, n_strips, first, s_ref, zs_ref):
        parts = []
        for i in range(n_strips):
            j = first + i
            slot = (l * na + j) % _SLOTS
            parts.append(_strip8(pool_a, slot, sem_a, s_ref, zs_ref, x_row,
                                 d, wa, d // block, 0, col0 + i * wa, 0, block))
            next_a(j)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    # ---- attention tiles: (layer, slot, tile) sequence through ONE pool ----
    def tile_src(j, lidx):
        if j < n_self:
            b = j // 2
            ref = kself_ref if j % 2 == 0 else vself_ref
            return ref.at[lidx, b]
        jj = j - n_self
        b = jj // n_cross
        w = jj % n_cross
        if w < n_cc:
            return ck_ref.at[lidx, b, pl.ds(w * tc_chunk, tc_chunk), :]
        return cv_ref.at[lidx, b, pl.ds((w - n_cc) * tc_chunk, tc_chunk), :]

    def tile_dma(j, lidx, slot):
        rows = t_self if j < n_self else tc_chunk
        return pltpu.make_async_copy(tile_src(j, lidx),
                                     tiles.at[slot, pl.ds(0, rows), :],
                                     sem_t.at[slot])

    def tile_wait(j):
        tile_dma(j, l, (l * n_tiles + j) % _SLOTS).wait()
        return (l * n_tiles + j) % _SLOTS

    def tile_next(j):
        g = l * n_tiles + j
        nxt = j + _SLOTS
        if nxt < n_tiles:
            tile_dma(nxt, l, (g + _SLOTS) % _SLOTS).start()
        else:
            @pl.when(l + 1 < nl)
            def _():
                tile_dma(nxt - n_tiles, l + 1, (g + _SLOTS) % _SLOTS).start()

    def wb_dma(buf, out_ref, sem, bufslot, lidx, slot_b):
        """(8, d) patch -> rows [pos8, pos8+8) of slot_b's plane of layer
        lidx. pos8 recomputed from SMEM so a later wait reconstructs the
        SAME copy (semaphores count bytes)."""
        posb = smem_ref[0, slot_b]
        pos8 = pl.multiple_of((jnp.maximum(posb, 0) // 8) * 8, 8)
        return pltpu.make_async_copy(
            buf.at[bufslot], out_ref.at[lidx, slot_b, pl.ds(pos8, 8), :],
            sem.at[bufslot])

    @pl.when(l == 0)
    def _():
        xs[:] = x_ref[:]
        for j in range(_SLOTS):
            issue_a(0, j, j)
            issue_b(0, j, j)
            tile_dma(j, 0, j).start()

    def layernorm(v, s_row, b_row):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        c = v32 - mu
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        return c * jax.lax.rsqrt(var + eps) * s_row + b_row

    def pair_scores(qrow2, ktile, rows, into_row0):
        """qrow2 (2, d): one slot's query duplicated into both sublanes
        (Mosaic rejects vector.broadcast of lane-offset (1, 128) slices —
        duplicating at the STORE makes every pair slice a plain (2, 128)
        read)."""
        kt16 = ktile[:rows, :].astype(jnp.bfloat16)
        for j in range(pairs):
            q2 = qrow2[:, 128 * j:128 * (j + 1)]
            q2 = (q2 * pmask * scale).astype(jnp.bfloat16)
            sc = jax.lax.dot_general(
                q2, kt16[:, 128 * j:128 * (j + 1)], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)  # (2, rows)
            scores[2 * j:2 * j + 2, pl.ds(into_row0, rows)] = sc

    def pair_ctx(vtile, rows, col0, extra=None):
        vt16 = vtile[:rows, :].astype(jnp.bfloat16)
        for j in range(pairs):
            pr = scores[2 * j:2 * j + 2, pl.ds(col0, rows)].astype(jnp.bfloat16)
            add = jnp.dot(pr, vt16[:, 128 * j:128 * (j + 1)],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
            base = (jnp.zeros((2, 128), jnp.float32) if extra is None
                    else ctx[2 * j:2 * j + 2, :])
            ctx[2 * j:2 * j + 2, :] = base + add

    def combine_pairs(into, b):
        for j in range(pairs):
            c2 = ctx[2 * j:2 * j + 2, :] * pmask
            into[b:b + 1, 128 * j:128 * (j + 1)] = c2[0:1, :] + c2[1:2, :]

    def layer_body():
        x = xs[:]
        # ---- self attention: qkv for ALL slots in one strip pass --------
        y = layernorm(x, ln1_s[0], ln1_b[0])
        qkv = strips_a(y, 0, 3 * d // wa, 0, a_s_ref, a_zs_ref)
        qkv = qkv + ba_ref[0, :, pl.ds(0, 3 * d)]  # (B, 3d)

        cdt = kpatch.dtype
        for b in range(bs):
            g = l * bs + b
            pos = smem_ref[0, b]
            posc = jnp.maximum(pos, 0)
            pos8 = pl.multiple_of((posc // 8) * 8, 8)
            # Stage slot b's rows into BOTH sublanes of a (2, d) scratch:
            # the paired-head math then reads plain (2, 128) slices —
            # Mosaic rejects vector.broadcast of lane-offset (1, 128)
            # slices ("Invalid input layout"), so broadcasts happen at the
            # store, never on loaded values.
            for r in range(2):
                qrow_s[r:r + 1, :] = qkv[b:b + 1, :d]
                krow_s[r:r + 1, :] = qkv[b:b + 1, d:2 * d]
                vrow_s[r:r + 1, :] = qkv[b:b + 1, 2 * d:3 * d]
            qrow2 = qrow_s[:]
            krow2 = krow_s[:]
            vrow2 = vrow_s[:]
            krow = krow_s[0:1, :]
            vrow = vrow_s[0:1, :]

            sl_k = tile_wait(2 * b)  # slot b's self-k tile
            # patch-buffer slot (g % 2): wait its previous writeback first
            if b >= 2:
                wb_dma(kpatch, kself_out, sem_wk, g % 2, l, b - 2).wait()
                wb_dma(vpatch, vself_out, sem_wv, g % 2, l, b - 2).wait()
            else:
                @pl.when(l >= 1)
                def _():
                    wb_dma(kpatch, kself_out, sem_wk, g % 2, l - 1,
                           bs + b - 2).wait()
                    wb_dma(vpatch, vself_out, sem_wv, g % 2, l - 1,
                           bs + b - 2).wait()
            in_row = (jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) + pos8
                      == pos)
            kpatch[g % 2] = jnp.where(
                in_row, jnp.broadcast_to(krow.astype(cdt), (8, d)),
                tiles[sl_k, pl.ds(pos8, 8), :])
            wb_dma(kpatch, kself_out, sem_wk, g % 2, l, b).start()

            pair_scores(qrow2, tiles[sl_k], t_self, 0)
            kpos = jax.lax.broadcasted_iota(jnp.int32, (2 * pairs, t_self), 1)
            is_pos = kpos == pos
            sc = scores[0:2 * pairs, pl.ds(0, t_self)]
            sn_rows = []
            for j in range(pairs):
                q2 = qrow2[:, 128 * j:128 * (j + 1)] * pmask
                k2 = krow2[:, 128 * j:128 * (j + 1)]
                sn_rows.append(jnp.sum(q2 * k2 * scale, axis=1, keepdims=True))
            snew = jnp.concatenate(sn_rows, axis=0)  # (2*pairs, 1)
            sc = jnp.where(kpos < pos, sc, _NEG)
            sc = jnp.where(is_pos, snew, sc)
            m = jnp.max(sc, axis=1, keepdims=True)
            e = jnp.exp(sc - m)
            pr = e / jnp.sum(e, axis=1, keepdims=True)
            pn = jnp.sum(jnp.where(is_pos, pr, 0.0), axis=1, keepdims=True)
            scores[0:2 * pairs, pl.ds(0, t_self)] = jnp.where(is_pos, 0.0, pr)
            tile_next(2 * b)

            sl_v = tile_wait(2 * b + 1)  # slot b's self-v tile
            vpatch[g % 2] = jnp.where(
                in_row, jnp.broadcast_to(vrow.astype(cdt), (8, d)),
                tiles[sl_v, pl.ds(pos8, 8), :])
            wb_dma(vpatch, vself_out, sem_wv, g % 2, l, b).start()
            pair_ctx(tiles[sl_v], t_self, 0)
            tile_next(2 * b + 1)
            for j in range(pairs):  # + fresh-row contribution
                v2 = vrow2[:, 128 * j:128 * (j + 1)]
                ctx[2 * j:2 * j + 2, :] = (ctx[2 * j:2 * j + 2, :]
                                           + pn[2 * j:2 * j + 2] * v2)
            combine_pairs(xo, b)

        o = strips_a(xo[:], off_o, d // wa, 3 * d // wa, a_s_ref, a_zs_ref)
        x = x + o + ba_ref[0, :, pl.ds(off_o, d)]

        # ---- cross attention: per-slot chunks over per-slot planes ------
        y = layernorm(x, lnc_s[0], lnc_b[0])
        qc = strips_a(y, off_cq, d // wa, 4 * d // wa, a_s_ref, a_zs_ref)
        xq[:] = qc + ba_ref[0, :, pl.ds(off_cq, d)]
        for b in range(bs):
            tc_valid = smem_ref[1, b]
            for r in range(2):  # both-sublane staging (see self attention)
                qrow_s[r:r + 1, :] = xq[b:b + 1, :]
            qrow2 = qrow_s[:]
            base = n_self + b * n_cross
            for c in range(n_cc):
                slc = tile_wait(base + c)
                pair_scores(qrow2, tiles[slc], tc_chunk, c * tc_chunk)
                tile_next(base + c)
            scx = scores[0:2 * pairs, pl.ds(0, t_cross)]
            cpos = jax.lax.broadcasted_iota(jnp.int32, (2 * pairs, t_cross), 1)
            scx = jnp.where(cpos < tc_valid, scx, _NEG)
            m = jnp.max(scx, axis=1, keepdims=True)
            e = jnp.exp(scx - m)
            scores[0:2 * pairs, pl.ds(0, t_cross)] = e / jnp.sum(
                e, axis=1, keepdims=True)
            for c in range(n_cc):
                slc = tile_wait(base + n_cc + c)
                pair_ctx(tiles[slc], tc_chunk, c * tc_chunk,
                         extra=None if c == 0 else True)
                tile_next(base + n_cc + c)
            combine_pairs(xo, b)
        co = strips_a(xo[:], off_co, d // wa, 5 * d // wa, a_s_ref, a_zs_ref)
        x = x + co + ba_ref[0, :, pl.ds(off_co, d)]

        # ---- MLP ---------------------------------------------------------
        y = layernorm(x, ln2_s[0], ln2_b[0])
        h1 = strips_a(y, off_fc1, ffn // wa, 6 * d // wa, a_s_ref, a_zs_ref)
        h1 = h1 + ba_ref[0, :, pl.ds(off_fc1, ffn)]
        # exact GELU via the Abramowitz-Stegun 7.1.26 erf fit (Mosaic lowers
        # neither erf nor erfc; max abs err 1.5e-7)
        ax = jnp.abs(h1) * 0.7071067811865476
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        erf = jnp.sign(h1) * (1.0 - poly * jnp.exp(-ax * ax))
        h1 = 0.5 * h1 * (1.0 + erf)
        acc = None
        for i in range(nb):
            slot = (l * nb + i) % _SLOTS
            part = _strip8(pool_b, slot, sem_b, b_s_ref, b_zs_ref, h1,
                           rb, d, rb // block, i * (rb // block), 0,
                           i * rb, block)
            next_b(i)
            acc = part if acc is None else acc + part
        xs[:] = x + acc + bb_ref[0]

        @pl.when(l == nl - 1)
        def _():
            xn[:] = layernorm(xs[:], lnf_s[0:1, :], lnf_b[0:1, :])
            # outstanding patch writebacks: global g = nl*bs-1 and nl*bs-2
            wb_dma(kpatch, kself_out, sem_wk, (nl * bs - 1) % 2, l,
                   bs - 1).wait()
            wb_dma(vpatch, vself_out, sem_wv, (nl * bs - 1) % 2, l,
                   bs - 1).wait()
            wb_dma(kpatch, kself_out, sem_wk, (nl * bs - 2) % 2, l,
                   bs - 2).wait()
            wb_dma(vpatch, vself_out, sem_wv, (nl * bs - 2) % 2, l,
                   bs - 2).wait()

    def head_body():
        hj = l - nl
        slot = (nl * na + hj) % _SLOTS
        acc = _strip8(pool_a, slot, sem_a, h_s_ref, h_zs_ref, xn[:],
                      d, wa, d // block, 0, 0, 0, block)
        @pl.when(hj + _SLOTS < n_head)
        def _():
            issue_head(hj + _SLOTS, slot)
        logits_ref[:] = acc

    @pl.when(l < nl)
    def _():
        layer_body()

    @pl.when(l >= nl)
    def _():
        head_body()


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def fused_aed_step_multi(stacked: dict, geom: AedGeom, x: jnp.ndarray,
                         k_self: jnp.ndarray, v_self: jnp.ndarray,
                         cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                         pos: jnp.ndarray, tc_valid: jnp.ndarray,
                         interpret: bool = False):
    """One multi-slot AED decode step through the megakernel.

    Args:
      stacked: from ``ops.fused_aed_step.stack_aed_step_params`` (the SAME
        stacked weights the batch-1 kernel uses).
      x: (B, D) f32 input rows (family embed math applied; B >= 2 slots).
      k_self/v_self: (NL, B, T, D) head-major per-slot self planes.
      cross_k/cross_v: (NL, B, Tc, D) per-slot cross planes (Tc a multiple
        of the chunk size the VMEM plan picked; pad rows are masked by
        ``tc_valid``).
      pos: (B,) int32 compact cache positions; -1 parks an inactive slot
        (garbage-but-finite output, no cache write).
      tc_valid: (B,) int32 REAL cross rows per slot.

    Returns ``(logits (B, V_pad) f32, k_self', v_self')`` — caches aliased
    in-place on TPU; pad logits columns are exactly 0.
    """
    nl, b_slots, t_self = k_self.shape[0], k_self.shape[1], k_self.shape[2]
    t_cross = cross_k.shape[2]
    assert t_self % 8 == 0
    assert b_slots >= 2, "multi kernel needs >= 2 slots (batch-1 kernel otherwise)"
    d, ffn = geom.d_model, geom.ffn_dim
    plan = _aed_plan(d, ffn, geom.num_heads, 128)
    tc_chunk = t_cross if t_cross <= 768 else -(-t_cross // 2 // 8) * 8
    assert t_cross % tc_chunk == 0, (t_cross, tc_chunk)
    n_head = stacked["wh"].shape[1] // plan["wa"]
    cfg_static = (nl, d, geom.num_heads, ffn, 128, b_slots, t_self, t_cross,
                  tc_chunk, 1e-5, plan["wa"], plan["rb"], plan["na"],
                  plan["nb"], n_head, plan["off_o"], plan["off_cq"],
                  plan["off_co"], plan["off_fc1"])
    smem = jnp.stack([pos.astype(jnp.int32), tc_valid.astype(jnp.int32)])

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = lambda: pl.BlockSpec(memory_space=pl.ANY)

    def blk(shape):
        ndim = len(shape)
        return pl.BlockSpec(
            (1,) + shape[1:],
            lambda g, nd=ndim: (jnp.minimum(g, nl - 1),) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM)

    wa = plan["wa"]
    hs_spec = pl.BlockSpec((1, stacked["h_s"].shape[1], wa),
                           lambda g: (0, 0, jnp.maximum(g - nl, 0)),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vmem(),                                          # x
        blk(stacked["ln1_s"].shape), blk(stacked["ln1_b"].shape),
        blk(stacked["lnc_s"].shape), blk(stacked["lnc_b"].shape),
        blk(stacked["ln2_s"].shape), blk(stacked["ln2_b"].shape),
        vmem(), vmem(),                                  # lnf_s, lnf_b
        blk(stacked["ba"].shape), blk(stacked["bb"].shape),
        anyspec(), blk(stacked["a_s"].shape), blk(stacked["a_zs"].shape),
        anyspec(), blk(stacked["b_s"].shape), blk(stacked["b_zs"].shape),
        anyspec(), anyspec(), anyspec(), anyspec(),      # caches + cross
        anyspec(), hs_spec, hs_spec,                     # head
    ]
    out_specs = [
        anyspec(), anyspec(),
        pl.BlockSpec((b_slots, wa), lambda g: (0, jnp.maximum(g - nl, 0)),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(k_self.shape, k_self.dtype),
        jax.ShapeDtypeStruct(v_self.shape, v_self.dtype),
        jax.ShapeDtypeStruct((b_slots, stacked["wh"].shape[1]), jnp.float32),
    ]
    cdt = k_self.dtype
    rows = max(t_self, tc_chunk)
    pairs = geom.num_heads // 2
    smax = max(t_self, t_cross)
    scratch = [
        pltpu.VMEM((b_slots, d), jnp.float32),           # xs
        pltpu.VMEM((_SLOTS, d, wa), jnp.int8),           # pool_a
        pltpu.VMEM((_SLOTS, plan["rb"], d), jnp.int8),   # pool_b
        pltpu.VMEM((_SLOTS, rows, d), cdt),              # attention tiles
        pltpu.VMEM((2, 8, d), cdt),                      # kpatch
        pltpu.VMEM((2, 8, d), cdt),                      # vpatch
        pltpu.VMEM((2 * pairs, smax), jnp.float32),      # scores/probs
        pltpu.VMEM((2 * pairs, 128), jnp.float32),       # ctx
        pltpu.VMEM((b_slots, d), jnp.float32),           # xq (cross queries)
        pltpu.VMEM((b_slots, d), jnp.float32),           # xo
        pltpu.VMEM((b_slots, d), jnp.float32),           # xn
        pltpu.VMEM((2, d), jnp.float32),                 # qrow_s (dup rows)
        pltpu.VMEM((2, d), jnp.float32),                 # krow_s (dup rows)
        pltpu.VMEM((2, d), jnp.float32),                 # vrow_s (dup rows)
        pltpu.SemaphoreType.DMA((_SLOTS,)),              # sem_a
        pltpu.SemaphoreType.DMA((_SLOTS,)),              # sem_b
        pltpu.SemaphoreType.DMA((_SLOTS,)),              # sem_t
        pltpu.SemaphoreType.DMA((2,)),                   # sem_wk
        pltpu.SemaphoreType.DMA((2,)),                   # sem_wv
    ]
    args = [smem, x,
            stacked["ln1_s"], stacked["ln1_b"], stacked["lnc_s"],
            stacked["lnc_b"], stacked["ln2_s"], stacked["ln2_b"],
            stacked["lnf_s"], stacked["lnf_b"],
            stacked["ba"], stacked["bb"],
            stacked["wa_all"], stacked["a_s"], stacked["a_zs"],
            stacked["wb_all"], stacked["b_s"], stacked["b_zs"],
            k_self, v_self, cross_k, cross_v,
            stacked["wh"], stacked["h_s"], stacked["h_zs"]]
    kc, vc, logits = pl.pallas_call(
        functools.partial(_kernel, cfg_static),
        grid=(nl + n_head,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={18: 0, 19: 1},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*args)
    return logits, kc, vc
