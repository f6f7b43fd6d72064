"""Correctness of the multi-slot continuous-batching decode megakernel.

Compares ``fused_decode_step_multi`` (interpret mode) against the
per-weight ``qwen3.decoder_step_rowwise`` reference at per-slot positions
(different per slot, one slot parked inactive), on the same
tiny-but-tiling geometry as ``test_fused_decode.py``.

Tolerances: the kernel's dots are bf16 with f32 accumulation while the
reference dequantizes to f32 (HIGHEST matmuls under conftest) —
differences are bounded by bf16 rounding (~2^-8 relative per dot).
"""

import jax
import jax.numpy as jnp
import numpy as np

from asr_tpu.layers import qwen3
from asr_tpu.layers.rope import rope_tables
from asr_tpu.ops.fused_decode import stack_decode_params
from asr_tpu.ops.fused_decode_multi import fused_decode_step_multi, fused_fits_multi
from asr_tpu.quant.quantize import quantize_pytree

CFG = qwen3.Qwen3Config(
    vocab_size=64,
    hidden=256,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,
    head_dim=128,
    ffn_dim=512,
    rope_theta=1e4,
    max_seq_len=32,
    tie_embeddings=True,
)
T_MAX = 16
B = 4


def _quantized_params(seed=0, qembed=False):
    params = qwen3.init_params(CFG, jax.random.PRNGKey(seed))
    qparams = quantize_pytree(params, bits=4, block=128, min_size=0, pack=True,
                              refine_iters=0, quantize_embeddings=qembed)
    return qwen3.fuse_params(qparams, CFG)


def _prefilled_state(fused, lens, seed=7):
    """Per-slot compact prefill: slot b's prompt occupies cache [0, lens[b])."""
    state = qwen3.make_kv_state(CFG, B, T_MAX, jnp.float32)
    for b, lb in enumerate(lens):
        if lb == 0:
            continue
        emb = jax.random.normal(jax.random.PRNGKey(seed + b),
                                (1, lb, CFG.hidden), jnp.float32) * 0.3
        bias = qwen3.causal_prefill_bias(jnp.asarray([lb], jnp.int32), lb, T_MAX)
        _, small = qwen3.decoder_pass(fused, CFG, emb, small_state(),
                                      jnp.asarray(0, jnp.int32), bias)
        state = jax.tree.map(lambda big, sm: big.at[b].set(sm[0]), state, small)
    return state


def small_state():
    return qwen3.make_kv_state(CFG, 1, T_MAX, jnp.float32)


def _stack_multi(state):
    """Per-layer dict state (B, T, hkv, d) -> (NL, B, T, kvw) bf16 planes."""
    kvw = CFG.num_kv_heads * CFG.head_dim
    k = jnp.stack([ls["k"].reshape(B, T_MAX, kvw) for ls in state["layers"]])
    v = jnp.stack([ls["v"].reshape(B, T_MAX, kvw) for ls in state["layers"]])
    return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


def _rope_rows(pos):
    cs = jnp.asarray(rope_tables(T_MAX, CFG.head_dim, CFG.rope_theta))
    logical = jnp.clip(pos, 0, T_MAX - 1)
    return jnp.take(cs[0], logical, axis=0), jnp.take(cs[1], logical, axis=0)


def test_fits_gates_geometry():
    assert fused_fits_multi(CFG, 4, T_MAX)
    assert not fused_fits_multi(CFG, 1, T_MAX)      # batch-1 -> other kernel
    assert not fused_fits_multi(CFG, 4, T_MAX + 4)  # unaligned cache
    real = qwen3.Qwen3Config()  # 0.6B geometry
    assert fused_fits_multi(real, 8, 512, head_cols=152064)
    assert not fused_fits_multi(real, 8, 4096)      # KV tiles blow VMEM


def test_multi_step_matches_rowwise_reference():
    from asr_tpu.layers.norms import rms_norm

    fused = _quantized_params()
    stacked = stack_decode_params(fused, CFG)
    assert stacked is not None

    lens = [6, 3, 9, 5]
    state = _prefilled_state(fused, lens)
    kc, vc = _stack_multi(state)

    pos = jnp.asarray(lens, jnp.int32)
    active = jnp.asarray([True, True, False, True])
    x = jax.random.normal(jax.random.PRNGKey(2), (B, CFG.hidden),
                          jnp.float32) * 0.3

    h_ref, state_ref = qwen3.decoder_step_rowwise(
        fused, CFG, x[:, None], state, pos, active)
    ref_hn = np.asarray(rms_norm(h_ref[:, 0], fused["final_norm"]["scale"],
                                 CFG.rms_eps))

    posf = jnp.where(active, pos, -1)
    cos, sin = _rope_rows(jnp.where(active, pos, 0))
    h_got, lg, kc2, vc2 = fused_decode_step_multi(
        stacked, CFG, x, kc, vc, posf, cos, sin, interpret=True)
    assert lg is None
    got = np.asarray(h_got)

    for b in range(B):
        if not bool(active[b]):
            continue  # parked slot output is garbage-but-finite
        np.testing.assert_allclose(
            got[b], ref_hn[b], rtol=0, atol=2e-2 * np.abs(ref_hn[b]).max())
    assert np.isfinite(got).all()  # inactive slot must not produce NaN/inf

    kvw = CFG.num_kv_heads * CFG.head_dim
    for b in range(B):
        pb = lens[b]
        kr = np.asarray(state_ref["layers"][-1]["k"][b].reshape(T_MAX, kvw))
        if bool(active[b]):
            np.testing.assert_allclose(
                np.asarray(kc2[-1, b, pb], np.float32), kr[pb],
                rtol=0, atol=2e-2 * max(np.abs(kr[pb]).max(), 1e-9))
            mask = np.arange(T_MAX) != pb
        else:
            mask = np.arange(T_MAX) >= 0  # nothing written at all
        np.testing.assert_array_equal(
            np.asarray(kc2[-1, b][mask]),
            np.asarray(kc[-1, b][mask]))  # untouched rows bit-identical


def test_multi_head_logits_and_slot_independence():
    """Fused tied head emits (B, V_pad) logits matching the reference per
    active slot; a slot's result must not depend on which other slots are
    live (run the same request in two different slot layouts)."""
    fused = _quantized_params(seed=5, qembed=True)
    stacked = stack_decode_params(fused, CFG)
    assert stacked is not None and "wh" in stacked

    lens = [4, 7, 2, 5]
    state = _prefilled_state(fused, lens, seed=11)
    kc, vc = _stack_multi(state)
    pos = jnp.asarray(lens, jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.hidden),
                          jnp.float32) * 0.3

    h_ref, _ = qwen3.decoder_step_rowwise(fused, CFG, x[:, None], state, pos)
    logits_ref = np.asarray(qwen3.logits_from_hidden(fused, CFG, h_ref[:, 0]))

    cos, sin = _rope_rows(pos)
    _, lg, _, _ = fused_decode_step_multi(
        stacked, CFG, x, kc, vc, pos, cos, sin, interpret=True)
    assert lg is not None and lg.shape == (B, stacked["wh"].shape[1])
    got = np.asarray(lg[:, : CFG.vocab_size])
    for b in range(B):
        np.testing.assert_allclose(
            got[b], logits_ref[b], rtol=0,
            atol=3e-2 * np.abs(logits_ref[b]).max())
    np.testing.assert_array_equal(np.asarray(lg[:, CFG.vocab_size:]), 0.0)

    # slot independence: park slots 1 and 3, move slot 2's request into
    # slot 1 — its logits row must be IDENTICAL to the full-batch run
    kc_p = kc.at[:, 1].set(kc[:, 2])
    vc_p = vc.at[:, 1].set(vc[:, 2])
    pos_p = jnp.asarray([lens[0], lens[2], -1, -1], jnp.int32)
    x_p = x.at[1].set(x[2])
    cos_p, sin_p = _rope_rows(jnp.maximum(pos_p, 0))
    _, lg_p, _, _ = fused_decode_step_multi(
        stacked, CFG, x_p, kc_p, vc_p, pos_p, cos_p, sin_p, interpret=True)
    np.testing.assert_array_equal(np.asarray(lg_p[0]), np.asarray(lg[0]))
    np.testing.assert_array_equal(np.asarray(lg_p[1]), np.asarray(lg[2]))


def test_batcher_fused_matches_rowwise_tokens():
    """ContinuousLlmBatcher with stacked weights (interpret-mode megakernel)
    must generate the same token ids as the rowwise XLA path, including a
    request that joins mid-flight — weights are shaped so logits gaps dwarf
    the bf16-dot differences."""
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.parallel.llm_batcher import ContinuousLlmBatcher

    fused = _quantized_params(seed=3, qembed=True)
    stacked = stack_decode_params(fused, CFG)
    assert stacked is not None
    dc = DecodeConfig(max_new_tokens=3, eot_id=-1)
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=n)) for n in (3, 5, 2)]

    def run(stk):
        bat = ContinuousLlmBatcher(fused, CFG, dc, n_slots=3, t_max=40,
                                   kv_dtype=jnp.bfloat16, stacked=stk,
                                   fused_interpret=stk is not None)
        assert (bat.stacked is not None) == (stk is not None)
        got = [None] * len(prompts)
        emb = lambda p: fused["embed"][jnp.asarray([p], jnp.int32)][0]
        slots = {bat.try_submit(emb(p), len(p)): r
                 for r, p in enumerate(prompts[:2])}
        evs = bat.step()  # one step mid-flight, then request 2 joins
        for s, tok, fin in evs:
            if fin:
                got[slots.pop(s)] = bat.take_result(s)
        slots[bat.try_submit(emb(prompts[2]), len(prompts[2]))] = 2
        for _ in range(dc.max_new_tokens + 2):
            evs = bat.step()
            if not evs:
                break
            for s, tok, fin in evs:
                if fin:
                    got[slots.pop(s)] = bat.take_result(s)
        return got

    got_fused = run(stacked)
    got_row = run(None)
    assert got_fused == got_row, (got_fused, got_row)


def test_batcher_fused_steps_per_tick_identity():
    """The megakernel step inside the steps_per_tick lax.scan (one dispatch,
    K pallas_calls) produces the same token stream as K single fused
    steps."""
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.parallel.llm_batcher import ContinuousLlmBatcher

    fused = _quantized_params(seed=5, qembed=True)
    stacked = stack_decode_params(fused, CFG)
    assert stacked is not None
    dc = DecodeConfig(max_new_tokens=3, eot_id=-1)
    rng = np.random.default_rng(6)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=n)) for n in (4, 2)]

    def run(k):
        bat = ContinuousLlmBatcher(fused, CFG, dc, n_slots=2, t_max=40,
                                   kv_dtype=jnp.bfloat16, stacked=stacked,
                                   fused_interpret=True, steps_per_tick=k)
        emb = lambda p: fused["embed"][jnp.asarray([p], jnp.int32)][0]
        slots = {bat.try_submit(emb(p), len(p)): r
                 for r, p in enumerate(prompts)}
        stream, got = [], [None, None]
        for _ in range(dc.max_new_tokens + 2):
            evs = bat.step_tick()
            if not evs:
                break
            stream.extend(evs)
            for s, tok, fin in evs:
                if fin:
                    got[slots.pop(s)] = bat.take_result(s)
        return stream, got

    assert run(2) == run(1)
