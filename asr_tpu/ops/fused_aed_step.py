"""Single-pallas_call AED decode step: all decoder layers + tied head.

Batch-1 AR decode of the pre-LN encoder–decoder families — Whisper
(``Whisper/Inference_Whisper_ONNX.py:584-663``), FireRedASR-AED
(``FireRedASR/Inference_FireRedASR_AED_ONNX.py``) and Dolphin
(``Dolphin/Inference_Dolphin_ONNX.py``); every one of the reference's
published numbers is measured at exactly this shape, its runtimes are
strictly batch-1 — is HBM-bound on the quantized weight bytes plus the
tied LM head, but the per-weight path splits one decode step into ~60
dispatches. All three families share ONE decoder block
(``layers/transformer.decoder_block``: pre-LN self-attention with KV
cache, cross-attention over precomputed cross-KV, exact-GELU MLP; they
differ only in which linears carry biases — absent biases stack as
zeros), so one kernel serves them all. It runs the ENTIRE step — per
layer: LN + fused self-qkv, cached self-attention with an 8-row aligned
cache patch, o-proj, LN + cross-q, cross-attention over (chunk-streamed)
cross-KV, cross-o, LN + GELU MLP — plus the final LN and the q8 tied
embedding head as ONE ``pallas_call`` with
``grid=(num_layers + head_strips,)``, reusing the strip-pool DMA
architecture of the Qwen megakernel (``ops/fused_decode.py``):

- ALL K=d weights of a layer (self-qkv | self-o | cross-q | cross-o |
  fc1, column-concatenated at stack time) stream through pool A as
  (d, wa) int8 strips; fc2 (K=ffn) streams through pool B as K-strips;
  the tied head (d, V_pad) rides pool A after the last layer;
- weights stay EXACT: int8 values are exact in bf16, the block-quant
  affine lands as the rank-1 correction ``x@((q-z)s) = (x@q)s - (Σx)(zs)``;
- head_dim is 64 (20 heads): heads are processed in PAIRS sharing a
  128-lane tile — the pair's q row broadcasts to (2, 128) and multiplies
  a half-lane mask, so one (2,128)x(128,T) MXU dot yields both heads'
  scores with no 64-lane (misaligned) slicing; context combines the two
  masked halves back into the pair's 128 lanes;
- self K/V tiles, and cross K/V in row chunks, all cycle through ONE
  two-slot attention-tile pool (six tile loads per layer), with scores
  staged in a (2*pairs, S_max) f32 scratch so the V pass streams chunks;
- the fresh self k/v row goes back as an 8-row aligned patch
  (input/output-aliased caches), exactly the Qwen kernel's trick.

Reference semantics matched: ``Whisper/Export_Whisper.py:497-664``
(decoder graph: pre-LN blocks, d^-0.25-style scaling folded as one
d^-0.5 on scores here, exact GELU) and the merged-graph decode loops of
``Whisper/Inference_Whisper_ONNX.py`` /
``FireRedASR/Inference_FireRedASR_AED_ONNX.py`` /
``Dolphin/Inference_Dolphin_ONNX.py``. The number of VALID cross rows
rides SMEM (``tc_valid``) so per-utterance encoder lengths never
retrace.

Numerics: bf16 MXU dots with f32 accumulation; LayerNorms, softmax and
residuals in f32. q8-block-quantized-only (the reference's published
configs for these families are q8f32, ``README.md:54-60``); other
layouts keep the per-weight path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_tpu.ops.fused_decode import _NEG

_SLOTS = 2


@dataclasses.dataclass(frozen=True)
class AedGeom:
    """Decoder geometry (hashable — rides jit static args)."""

    d_model: int
    ffn_dim: int
    num_heads: int

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def _aed_plan(d: int, ffn: int, heads: int, block: int):
    """Static strip plan. None when the geometry doesn't tile."""
    if d % block or ffn % block or d % 256 or heads % 2:
        return None
    na_cols = 3 * d + d + d + d + ffn          # qkv | o | cq | co | fc1
    # wa must divide d so every weight-segment boundary (3d/d/d/d/ffn,
    # with ffn a d multiple... ffn only needs wa | ffn) lands on a strip
    # boundary; largest 128-multiple divisor of both <= 640.
    wa = 640
    while wa >= block and (d % wa or ffn % wa):
        wa -= 128
    if wa < block:
        return None
    rb = 640 if ffn % 640 == 0 else 512
    while ffn % rb or rb % block:
        rb //= 2
        if rb < block:
            return None
    if na_cols // wa < _SLOTS or ffn // rb < _SLOTS:
        return None  # the _SLOTS-deep refill sequencing needs >= _SLOTS strips
    return {
        "wa": wa, "rb": rb, "na": na_cols // wa, "nb": ffn // rb,
        "na_cols": na_cols,
        # column offsets of each weight in the pool-A concatenation
        "off_qkv": 0, "off_o": 3 * d, "off_cq": 4 * d, "off_co": 5 * d,
        "off_fc1": 6 * d,
    }


def stack_aed_step_params(dec: dict, geom: AedGeom) -> dict | None:
    """q8 AED decoder params -> stacked arrays for the step megakernel.

    ``dec`` is the family's decoder dict (``params["decoder"]`` — blocks
    built by ``layers/transformer.decoder_block``'s layout, shared by
    Whisper/FireRed/Dolphin). Requires every decoder linear to be an
    UNPACKED 8-bit QuantizedLinear with one common block size, and the
    tied head (``dec["out"]`` when untied, else ``dec["embed"]``) to be a
    :class:`QuantizedEmbedding` (bits=8) carrying the (D, V_pad)
    transposed copy. Absent biases (Whisper's k, FireRed's o) stack as
    zeros. Returns None when the structure doesn't match — callers fall
    back to the per-weight path. The head copy is re-padded to a multiple
    of the pool strip width (zero scale -> exactly-0 pad logits)."""
    from asr_tpu.quant.quantize import QuantizedEmbedding, QuantizedLinear

    if not isinstance(dec, dict):
        return None
    d = geom.d_model
    plan = _aed_plan(d, geom.ffn_dim, geom.num_heads, 128)
    if plan is None:
        return None

    def leaf(p):
        w = p.get("w")
        if not (isinstance(w, QuantizedLinear) and not w.packed
                and w.bits == 8 and not w.dynamic):
            return None
        return w

    def bias(p, n):
        b = p.get("b")
        return (jnp.zeros((n,), jnp.float32) if b is None
                else jnp.asarray(b, jnp.float32))

    block = None
    wa_rows, a_s, a_zs, ba = [], [], [], []
    wb_rows, b_s, b_zs, bb = [], [], [], []
    lns = {k: [] for k in ("ln1_s", "ln1_b", "lnc_s", "lnc_b", "ln2_s", "ln2_b")}
    for p in dec.get("blocks", []):
        ws = {
            "q": leaf(p["attn"]["q"]), "k": leaf(p["attn"]["k"]),
            "v": leaf(p["attn"]["v"]), "o": leaf(p["attn"]["o"]),
            "cq": leaf(p["cross"]["q"]), "co": leaf(p["cross"]["o"]),
            "fc1": leaf(p["mlp"]["fc1"]), "fc2": leaf(p["mlp"]["fc2"]),
        }
        if any(w is None for w in ws.values()):
            return None
        if block is None:
            block = ws["q"].block
        if any(w.block != block for w in ws.values()) or block != 128:
            return None
        qa = jnp.concatenate([ws[k].q for k in ("q", "k", "v", "o", "cq",
                                                "co", "fc1")], axis=1)
        sa = jnp.concatenate([ws[k].scale for k in ("q", "k", "v", "o", "cq",
                                                    "co", "fc1")], axis=1)
        za = jnp.concatenate([(ws[k].zero * ws[k].scale)
                              for k in ("q", "k", "v", "o", "cq", "co", "fc1")],
                             axis=1)
        if qa.shape != (d, plan["na_cols"]):
            return None
        wa_rows.append(qa)
        a_s.append(sa.astype(jnp.float32))
        a_zs.append(za.astype(jnp.float32))
        bias_a = jnp.concatenate([
            bias(p["attn"]["q"], d), bias(p["attn"]["k"], d),
            bias(p["attn"]["v"], d), bias(p["attn"]["o"], d),
            bias(p["cross"]["q"], d), bias(p["cross"]["o"], d),
            bias(p["mlp"]["fc1"], geom.ffn_dim)])
        ba.append(bias_a)
        wb_rows.append(ws["fc2"].q)
        b_s.append(ws["fc2"].scale.astype(jnp.float32))
        b_zs.append((ws["fc2"].zero * ws["fc2"].scale).astype(jnp.float32))
        bb.append(bias(p["mlp"]["fc2"], d))
        for key, src in (("ln1", "ln1"), ("lnc", "ln_cross"), ("ln2", "ln2")):
            lns[key + "_s"].append(p[src]["scale"].astype(jnp.float32))
            lns[key + "_b"].append(p[src]["bias"].astype(jnp.float32))

    if not wa_rows:
        return None
    emb = dec.get("out", dec.get("embed"))
    if not (isinstance(emb, QuantizedEmbedding) and emb.q_t is not None
            and not emb.q_t_packed and emb.bits == 8 and emb.block == block):
        return None
    # re-pad the head copy to a strip-width multiple (zero scale pads)
    wa = plan["wa"]
    vpad0 = emb.q_t.shape[1]
    pad = (-vpad0) % wa
    wh = jnp.pad(emb.q_t, ((0, 0), (0, pad)))
    # leading layer axis so _strip8 sees the same (1, nb, cols) layout as
    # the per-layer scale blocks
    h_s = jnp.pad(emb.scale_t.astype(jnp.float32), ((0, 0), (0, pad)))[None]
    h_zs = jnp.pad((emb.zero_t * emb.scale_t).astype(jnp.float32),
                   ((0, 0), (0, pad)))[None]

    # per-layer vector tables carry a singleton middle axis: the per-layer
    # BlockSpec block is then (1, 1, d) whose last two dims satisfy the TPU
    # (8, 128)-or-full-dim rule (a (1, d) block of an (nl, d) array does not)
    out = {
        "wa_all": jnp.stack(wa_rows), "a_s": jnp.stack(a_s),
        "a_zs": jnp.stack(a_zs), "ba": jnp.stack(ba)[:, None, :],
        "wb_all": jnp.stack(wb_rows), "b_s": jnp.stack(b_s),
        "b_zs": jnp.stack(b_zs), "bb": jnp.stack(bb)[:, None, :],
        "lnf_s": dec["ln"]["scale"].astype(jnp.float32)[None, :],
        "lnf_b": dec["ln"]["bias"].astype(jnp.float32)[None, :],
        "wh": wh, "h_s": h_s, "h_zs": h_zs,
    }
    for k, v in lns.items():
        out[k] = jnp.stack(v)[:, None, :]
    return out


def aed_fused_mode_ok(interpret: bool = False) -> bool:
    """Whether the CURRENT backend/quant mode can ever engage the step
    megakernel: a TPU backend (or interpret-mode tests) running bf16
    serving numerics with the Pallas route enabled. Sessions gate the
    weight stacking on this — the stacked copy duplicates the whole q8
    decoder plus the (D, V_pad) tied head in device memory (~150-400 MB
    for Whisper/FireRed), dead weight on CPU or in f32 parity mode."""
    if not (jax.default_backend() == "tpu" or interpret):
        return False
    from asr_tpu.ops.quant_matmul import _resolve_kernel, _resolve_mm

    return _resolve_mm(None) == "bf16" and _resolve_kernel() != "xla"


def stack_whisper_step_params(params: dict, cfg) -> dict | None:
    """Whisper adapter: ``params["decoder"]`` through the generic stacker."""
    if not isinstance(params, dict) or "decoder" not in params:
        return None
    return stack_aed_step_params(
        params["decoder"], AedGeom(cfg.d_model, cfg.ffn_dim, cfg.num_heads))


def aed_fused_fits(geom: AedGeom, t_self: int, t_cross: int, block: int = 128,
                   budget: int = 14 << 20, cache_bytes: int = 2) -> bool:
    """Whether the step kernel's VMEM plan fits (see module docstring)."""
    p = _aed_plan(geom.d_model, geom.ffn_dim, geom.num_heads, block)
    if p is None or t_self % 8 or geom.head_dim != 64:
        return False
    d = geom.d_model
    tc_chunk = t_cross if t_cross <= 768 else -(-t_cross // 2 // 8) * 8
    if t_cross % tc_chunk:
        return False
    rows = max(t_self, tc_chunk)
    smax = max(t_self, t_cross)
    pairs = geom.num_heads // 2
    fixed = (
        _SLOTS * d * p["wa"]               # pool_a (int8)
        + _SLOTS * p["rb"] * d             # pool_b (int8)
        + 3 * max(d * p["wa"], p["rb"] * d)  # live strip planes (bf16/i32)
        + _SLOTS * rows * d * cache_bytes  # attention tile pool
        + 4 * 8 * d * cache_bytes          # k/v patches
        + (2 * pairs) * smax * 4           # scores/probs scratch
        + (2 * pairs) * 128 * 4            # ctx scratch
        + 8 * d * 4                        # xs/xo/xn + ln rows
    )
    scales = 2 * 2 * 4 * (d // block) * p["na_cols"] \
        + 2 * 2 * 4 * (geom.ffn_dim // block) * d
    biases = 2 * 4 * (p["na_cols"] + d)
    head = 2 * p["wa"] * 4 + 2 * 2 * 4 * (d // block) * p["wa"]
    return fixed + scales + biases + head <= budget


def whisper_fused_fits(cfg, t_self: int, t_cross: int, block: int = 128,
                       budget: int = 14 << 20, cache_bytes: int = 2) -> bool:
    return aed_fused_fits(AedGeom(cfg.d_model, cfg.ffn_dim, cfg.num_heads),
                          t_self, t_cross, block, budget, cache_bytes)


def _strip8(pool, slot, sem, s_ref, zs_ref, x_row, rows, width,
            nb_strip, kblk0, col0, x_k0, block):
    """q8 strip matvec: wait the (rows, width) int8 strip and return the
    dequantized contribution via the rank-1 affine identity (single plane
    — int8 is exact in bf16)."""
    pltpu.make_async_copy(pool.at[slot], pool.at[slot], sem.at[slot]).wait()
    v16 = pool[slot][:rows, :width].astype(jnp.bfloat16)
    xv = x_row[:, x_k0:x_k0 + rows].astype(jnp.bfloat16)
    acc = None
    for b in range(nb_strip):
        rs = slice(b * block, (b + 1) * block)
        s = s_ref[0, kblk0 + b, pl.ds(col0, width)][None, :]
        zs = zs_ref[0, kblk0 + b, pl.ds(col0, width)][None, :]
        p = jnp.dot(xv[:, rs], v16[rs, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        xs = jnp.sum(xv[:, rs].astype(jnp.float32), axis=1, keepdims=True)
        term = p * s - xs * zs
        acc = term if acc is None else acc + term
    return acc


def _kernel(cfg_static, smem_ref, x_ref,
            ln1_s, ln1_b, lnc_s, lnc_b, ln2_s, ln2_b, lnf_s, lnf_b,
            ba_ref, bb_ref,
            wa_ref, a_s_ref, a_zs_ref, wb_ref, b_s_ref, b_zs_ref,
            kself_ref, vself_ref, ck_ref, cv_ref,
            wh_ref, h_s_ref, h_zs_ref,
            kself_out, vself_out, logits_ref,
            xs, pool_a, pool_b, tiles, kpatch, vpatch,
            scores, ctx, xo, xn,
            sem_a, sem_b, sem_t, sem_wk, sem_wv):
    (nl, d, heads, ffn, block, t_self, t_cross, tc_chunk, eps,
     wa, rb, na, nb, n_head, off_o, off_cq, off_co, off_fc1) = cfg_static
    l = pl.program_id(0)
    pairs = heads // 2
    n_cc = t_cross // tc_chunk
    n_tiles = 2 + 2 * n_cc  # self-k, self-v, cross-k chunks, cross-v chunks
    pos = smem_ref[0]
    tc_valid = smem_ref[1]  # VALID cross rows — dynamic, no per-length retrace
    scale = jnp.float32(64) ** -0.5

    # half-lane pair masks: row 0 keeps lanes [0,64), row 1 keeps [64,128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    pmask = ((lane < 64) == (rown == 0)).astype(jnp.float32)

    # ---- weight strips ---------------------------------------------------
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
        """Consume pool-A strips [first, first+n_strips) covering columns
        [col0, col0 + n_strips*wa) of the layer's concatenated weights."""
        parts = []
        for i in range(n_strips):
            j = first + i
            slot = (l * na + j) % _SLOTS
            parts.append(_strip8(pool_a, slot, sem_a, s_ref, zs_ref, x_row,
                                 d, wa, d // block, 0, col0 + i * wa, 0, block))
            next_a(j)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    # ---- attention tiles through the shared pool -------------------------
    def tile_src(j, lidx):
        if j == 0:
            return kself_ref.at[lidx]
        if j == 1:
            return vself_ref.at[lidx]
        if j < 2 + n_cc:
            c = j - 2
            return ck_ref.at[lidx, pl.ds(c * tc_chunk, tc_chunk), :]
        c = j - 2 - n_cc
        return cv_ref.at[lidx, pl.ds(c * tc_chunk, tc_chunk), :]

    def tile_dma(j, lidx, slot):
        rows = t_self if j < 2 else tc_chunk
        return pltpu.make_async_copy(tile_src(j, lidx),
                                     tiles.at[slot, pl.ds(0, rows), :],
                                     sem_t.at[slot])

    def tile_wait(j):
        tile_dma(j, l, (l * n_tiles + j) % _SLOTS).wait()
        return (l * n_tiles + j) % _SLOTS

    def tile_next(j):
        """Refill tile j's slot with tile j+_SLOTS — call AFTER consuming
        tile j (the DMA overwrites the slot j occupies)."""
        g = l * n_tiles + j
        nxt = j + _SLOTS
        if nxt < n_tiles:
            tile_dma(nxt, l, (g + _SLOTS) % _SLOTS).start()
        else:
            @pl.when(l + 1 < nl)
            def _():
                tile_dma(nxt - n_tiles, l + 1, (g + _SLOTS) % _SLOTS).start()

    def wb_dma(buf, out_ref, sem, slot, lidx):
        pos8 = pl.multiple_of((pos // 8) * 8, 8)
        return pltpu.make_async_copy(
            buf.at[slot], out_ref.at[lidx, pl.ds(pos8, 8), :], sem.at[slot])

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

    def pair_scores(qrow, ktile, rows, into_row0):
        """All pairs' scores against ktile (rows, d) -> scores[...] rows."""
        kt16 = ktile[:rows, :].astype(jnp.bfloat16)
        for j in range(pairs):
            q2 = jnp.broadcast_to(qrow[:, 128 * j:128 * (j + 1)], (2, 128))
            q2 = (q2 * pmask * scale).astype(jnp.bfloat16)
            sc = jax.lax.dot_general(
                q2, kt16[:, 128 * j:128 * (j + 1)], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)  # (2, rows)
            scores[2 * j:2 * j + 2, pl.ds(into_row0, rows)] = sc

    def pair_ctx(vtile, rows, col0, extra=None):
        """Accumulate ctx[2j:2j+2] += probs[2j:2j+2, col0:col0+rows] @ vtile
        (per pair; probs read from the scores scratch)."""
        vt16 = vtile[:rows, :].astype(jnp.bfloat16)
        for j in range(pairs):
            pr = scores[2 * j:2 * j + 2, pl.ds(col0, rows)].astype(jnp.bfloat16)
            add = jnp.dot(pr, vt16[:, 128 * j:128 * (j + 1)],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
            base = jnp.zeros((2, 128), jnp.float32) if extra is None else ctx[2 * j:2 * j + 2, :]
            ctx[2 * j:2 * j + 2, :] = base + add

    def combine_pairs():
        for j in range(pairs):
            c2 = ctx[2 * j:2 * j + 2, :] * pmask
            xo[0:1, 128 * j:128 * (j + 1)] = c2[0:1, :] + c2[1:2, :]

    def layer_body():
        x = xs[:]
        # ---- self attention ------------------------------------------
        y = layernorm(x, ln1_s[0], ln1_b[0])
        qkv = strips_a(y, 0, 3 * d // wa, 0, a_s_ref, a_zs_ref)
        qkv = qkv + ba_ref[0, :, pl.ds(0, 3 * d)]
        qrow = qkv[:, :d]
        krow = qkv[:, d:2 * d]
        vrow = qkv[:, 2 * d:3 * d]

        sl_k = tile_wait(0)  # self-k tile
        # fresh-row patch (k) — wait the slot's previous writeback first
        @pl.when(l >= 2)
        def _():
            wb_dma(kpatch, kself_out, sem_wk, l % 2, l - 2).wait()
            wb_dma(vpatch, vself_out, sem_wv, l % 2, l - 2).wait()
        pos8 = pl.multiple_of((pos // 8) * 8, 8)
        in_row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) + pos8 == pos
        cdt = kpatch.dtype
        kpatch[l % 2] = jnp.where(
            in_row, jnp.broadcast_to(krow.astype(cdt), (8, d)),
            tiles[sl_k, pl.ds(pos8, 8), :])
        wb_dma(kpatch, kself_out, sem_wk, l % 2, l).start()

        pair_scores(qrow, tiles[sl_k], t_self, 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (2 * pairs, t_self), 1)
        is_pos = kpos == pos
        sc = scores[0:2 * pairs, pl.ds(0, t_self)]
        # fresh-row score via VPU (f32): snew_h = q_h . k_h
        sn_rows = []
        for j in range(pairs):
            q2 = jnp.broadcast_to(qrow[:, 128 * j:128 * (j + 1)], (2, 128)) * pmask
            k2 = jnp.broadcast_to(krow[:, 128 * j:128 * (j + 1)], (2, 128))
            sn_rows.append(jnp.sum(q2 * k2 * scale, axis=1, keepdims=True))
        snew = jnp.concatenate(sn_rows, axis=0)  # (2*pairs, 1)
        sc = jnp.where(kpos < pos, sc, _NEG)
        sc = jnp.where(is_pos, snew, sc)
        m = jnp.max(sc, axis=1, keepdims=True)
        e = jnp.exp(sc - m)
        pr = e / jnp.sum(e, axis=1, keepdims=True)
        pn = jnp.sum(jnp.where(is_pos, pr, 0.0), axis=1, keepdims=True)
        scores[0:2 * pairs, pl.ds(0, t_self)] = jnp.where(is_pos, 0.0, pr)
        tile_next(0)  # self-k tile fully consumed

        sl_v = tile_wait(1)  # self-v tile
        vpatch[l % 2] = jnp.where(
            in_row, jnp.broadcast_to(vrow.astype(cdt), (8, d)),
            tiles[sl_v, pl.ds(pos8, 8), :])
        wb_dma(vpatch, vself_out, sem_wv, l % 2, l).start()
        pair_ctx(tiles[sl_v], t_self, 0)
        tile_next(1)  # self-v tile fully consumed
        for j in range(pairs):  # + fresh-row contribution
            v2 = jnp.broadcast_to(vrow[:, 128 * j:128 * (j + 1)], (2, 128))
            ctx[2 * j:2 * j + 2, :] = (ctx[2 * j:2 * j + 2, :]
                                       + pn[2 * j:2 * j + 2] * v2)
        combine_pairs()
        o = strips_a(xo[:], off_o, d // wa, 3 * d // wa, a_s_ref, a_zs_ref)
        x = x + o + ba_ref[0, :, pl.ds(off_o, d)]

        # ---- cross attention -----------------------------------------
        y = layernorm(x, lnc_s[0], lnc_b[0])
        qc = strips_a(y, off_cq, d // wa, 4 * d // wa, a_s_ref, a_zs_ref)
        qc = qc + ba_ref[0, :, pl.ds(off_cq, d)]
        for c in range(n_cc):
            slc = tile_wait(2 + c)
            pair_scores(qc, tiles[slc], tc_chunk, c * tc_chunk)
            tile_next(2 + c)
        scx = scores[0:2 * pairs, pl.ds(0, t_cross)]
        cpos = jax.lax.broadcasted_iota(jnp.int32, (2 * pairs, t_cross), 1)
        scx = jnp.where(cpos < tc_valid, scx, _NEG)
        m = jnp.max(scx, axis=1, keepdims=True)
        e = jnp.exp(scx - m)
        scores[0:2 * pairs, pl.ds(0, t_cross)] = e / jnp.sum(e, axis=1,
                                                             keepdims=True)
        for c in range(n_cc):
            slc = tile_wait(2 + n_cc + c)
            pair_ctx(tiles[slc], tc_chunk, c * tc_chunk,
                     extra=None if c == 0 else True)
            tile_next(2 + n_cc + c)
        combine_pairs()
        co = strips_a(xo[:], off_co, d // wa, 5 * d // wa, a_s_ref, a_zs_ref)
        x = x + co + ba_ref[0, :, pl.ds(off_co, d)]

        # ---- MLP -------------------------------------------------------
        y = layernorm(x, ln2_s[0], ln2_b[0])
        h1 = strips_a(y, off_fc1, ffn // wa, 6 * d // wa, a_s_ref, a_zs_ref)
        h1 = h1 + ba_ref[0, :, pl.ds(off_fc1, ffn)]
        # exact GELU; Mosaic lowers neither erf nor erfc, so erf comes from
        # the Abramowitz–Stegun 7.1.26 rational fit (max abs err 1.5e-7 —
        # below f32 rounding of the surrounding bf16-activation pipeline)
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
            wb_dma(kpatch, kself_out, sem_wk, l % 2, l).wait()
            wb_dma(vpatch, vself_out, sem_wv, l % 2, l).wait()
            @pl.when(nl >= 2)
            def _():
                wb_dma(kpatch, kself_out, sem_wk, (l - 1) % 2, l - 1).wait()
                wb_dma(vpatch, vself_out, sem_wv, (l - 1) % 2, l - 1).wait()

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
def fused_aed_step(stacked: dict, geom: AedGeom, x: jnp.ndarray,
                   k_self: jnp.ndarray, v_self: jnp.ndarray,
                   cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                   pos: jnp.ndarray, tc_valid=None,
                   interpret: bool = False):
    """One batch-1 AED decode step through the megakernel.

    Args:
      stacked: from :func:`stack_aed_step_params`.
      geom: decoder geometry (static).
      x: (1, D) f32 input row (token embed + positional embed at ``pos``).
      k_self/v_self: (NL, T, D) head-major self caches (f32 or bf16).
      cross_k/cross_v: (NL, Tc, D) precomputed cross KV (Tc a multiple of
        the chunk size the VMEM plan picked; pad rows are masked).
      pos: scalar int32 — cache slot of this token.
      tc_valid: number of REAL cross rows (< Tc when padded) — int or
        traced scalar (rides SMEM, so per-utterance encoder lengths share
        one executable); defaults Tc.

    Returns ``(logits (1, V_pad) f32, k_self', v_self')`` (caches aliased
    in-place on TPU); pad logits columns are exactly 0.
    """
    nl, t_self = k_self.shape[0], k_self.shape[1]
    t_cross = cross_k.shape[1]
    assert t_self % 8 == 0
    d, ffn = geom.d_model, geom.ffn_dim
    plan = _aed_plan(d, ffn, geom.num_heads, 128)
    tc_chunk = t_cross if t_cross <= 768 else -(-t_cross // 2 // 8) * 8
    assert t_cross % tc_chunk == 0, (t_cross, tc_chunk)
    n_head = stacked["wh"].shape[1] // plan["wa"]
    if tc_valid is None:
        tc_valid = t_cross
    cfg_static = (nl, d, geom.num_heads, ffn, 128, t_self, t_cross, tc_chunk,
                  1e-5, plan["wa"], plan["rb"], plan["na"],
                  plan["nb"], n_head, plan["off_o"], plan["off_cq"],
                  plan["off_co"], plan["off_fc1"])
    smem = jnp.stack([pos.astype(jnp.int32),
                      jnp.asarray(tc_valid, jnp.int32)])

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
        pl.BlockSpec((1, wa), lambda g: (0, jnp.maximum(g - nl, 0)),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(k_self.shape, k_self.dtype),
        jax.ShapeDtypeStruct(v_self.shape, v_self.dtype),
        jax.ShapeDtypeStruct((1, stacked["wh"].shape[1]), jnp.float32),
    ]
    cdt = k_self.dtype
    rows = max(t_self, tc_chunk)
    pairs = geom.num_heads // 2
    smax = max(t_self, t_cross)
    scratch = [
        pltpu.VMEM((1, d), jnp.float32),                 # xs
        pltpu.VMEM((_SLOTS, d, wa), jnp.int8),           # pool_a
        pltpu.VMEM((_SLOTS, plan["rb"], d), jnp.int8),   # pool_b
        pltpu.VMEM((_SLOTS, rows, d), cdt),              # attention tiles
        pltpu.VMEM((2, 8, d), cdt),                      # kpatch
        pltpu.VMEM((2, 8, d), cdt),                      # vpatch
        pltpu.VMEM((2 * pairs, smax), jnp.float32),      # scores/probs
        pltpu.VMEM((2 * pairs, 128), jnp.float32),       # ctx
        pltpu.VMEM((1, d), jnp.float32),                 # xo
        pltpu.VMEM((1, d), jnp.float32),                 # xn
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


def fused_whisper_step(stacked: dict, cfg, x, k_self, v_self, cross_k,
                       cross_v, pos, tc_valid=None, interpret: bool = False):
    """Whisper adapter for :func:`fused_aed_step` (geometry from cfg)."""
    return fused_aed_step(
        stacked, AedGeom(cfg.d_model, cfg.ffn_dim, cfg.num_heads), x,
        k_self, v_self, cross_k, cross_v, pos, tc_valid=tc_valid,
        interpret=interpret)


def fused_ar_decode(params, cfg, state, enc, enc_valid, first, buf,
                    decode_cfg, rng, stacked, fused_interpret,
                    start_pos=1):
    """Shared batch-1 AR decode loop for the sqrt(d)-scaled-embedding AED
    families (FireRed / Dolphin — ``models/*._decoder_pass`` input math:
    ``embed[token] * sqrt(d) + reversed-relative-PE[pos]``, tied head).

    Routes through :func:`fused_aed_step` when the megakernel applies
    (batch 1, TPU-or-interpret, bf16 serving mode, geometry fits);
    returns ``ar_decode``'s (tokens, counts), or None for the caller's
    per-weight fallback. Whisper keeps its own branch
    (``models/whisper.transcribe_window``) — its input math differs
    (unscaled embed + learned positions).
    """
    from asr_tpu.decode.ar import ar_decode
    from asr_tpu.layers.conformer import relative_position_embedding
    from asr_tpu.ops.quant_matmul import _resolve_kernel, _resolve_mm

    b = enc.shape[0]
    if stacked is None or b != 1:
        return None
    if not (jax.default_backend() == "tpu" or fused_interpret):
        return None
    d = cfg.d_model
    geom = AedGeom(d, cfg.dec_ffn, cfg.dec_heads)
    t_max = state["layers"][0]["self_k"].shape[1]
    tc = enc.shape[1]
    tc_pad = -(-tc // 16) * 16  # 16: the >768 two-chunk split stays 8-aligned
    cdt = state["layers"][0]["self_k"].dtype
    if not (_resolve_mm(None) == "bf16" and _resolve_kernel() != "xla"
            and aed_fused_fits(geom, t_max, tc_pad,
                               cache_bytes=jnp.dtype(cdt).itemsize)):
        return None
    kc = jnp.stack([ls["self_k"][0].reshape(t_max, d) for ls in state["layers"]])
    vc = jnp.stack([ls["self_v"][0].reshape(t_max, d) for ls in state["layers"]])
    ck = jnp.stack([ls["cross_k"][0].reshape(tc, d) for ls in state["layers"]])
    cv = jnp.stack([ls["cross_v"][0].reshape(tc, d) for ls in state["layers"]])
    if tc_pad != tc:
        ck = jnp.pad(ck, ((0, 0), (0, tc_pad - tc), (0, 0)))
        cv = jnp.pad(cv, ((0, 0), (0, tc_pad - tc), (0, 0)))
    dec = params["decoder"]
    pe = jnp.asarray(relative_position_embedding(cfg.max_target_positions, d))
    pos_table = pe[: cfg.max_target_positions][::-1]
    tc_valid = enc_valid[0].astype(jnp.int32)

    def fused_step_fn(st, token, pos):
        kcc, vcc = st
        x = (dec["embed"][token[:, 0]] * (d ** 0.5)
             + jax.lax.dynamic_slice(pos_table, (pos, 0), (1, d)))
        lg, kcc, vcc = fused_aed_step(
            stacked, geom, x.astype(jnp.float32), kcc, vcc, ck, cv, pos,
            tc_valid=tc_valid, interpret=fused_interpret)
        return lg[:, : cfg.vocab_size], (kcc, vcc)

    return ar_decode(fused_step_fn, (kc, vc),
                     jnp.asarray(start_pos, jnp.int32), first, buf,
                     decode_cfg, rng)
