"""Correctness of the multi-slot AED decode megakernel (interpret mode).

Per-slot outputs must match the PROVEN batch-1 AED kernel
(``fused_whisper_step``, itself parity-tested against the per-weight
path) — same strip math, same paired-head attention, same q8 head — with
per-slot positions, per-slot cross-KV/tc_valid, and parked slots writing
nowhere. Then the continuous batcher routed through the kernel must
generate the same ids as the batch-1 fused solo path."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_tpu.models import whisper as wh
from asr_tpu.ops.fused_aed_multi import aed_fused_fits_multi, fused_aed_step_multi
from asr_tpu.ops.fused_aed_step import (
    AedGeom,
    fused_whisper_step,
    stack_whisper_step_params,
)
from asr_tpu.quant.quantize import quantize_pytree

CFG = wh.WhisperConfig(
    vocab_size=64, d_model=256, encoder_layers=1, decoder_layers=2,
    num_heads=4, ffn_dim=1024, n_mels=16, max_source_positions=24,
    max_target_positions=16, sot_id=1, eot_id=0, no_speech_id=2,
    first_language_id=8, num_languages=4,
)
GEOM = AedGeom(CFG.d_model, CFG.ffn_dim, CFG.num_heads)
T_SELF = 16
TC_PAD = 32


def _qparams(seed=0):
    params = wh.init_params(CFG, jax.random.PRNGKey(seed))
    return quantize_pytree(params, bits=8, block=128, min_size=0,
                           refine_iters=0, quantize_embeddings=True)


def _slot_state(params, seed, p_len):
    """One request: own encoder output, own prompt prefill."""
    tc_valid = 16 + 4 * (seed % 3)
    enc = jax.random.normal(jax.random.PRNGKey(100 + seed),
                            (1, tc_valid, CFG.d_model), jnp.float32) * 0.3
    state = wh.make_state(params, CFG, enc)
    prompt = jnp.asarray([[3 + seed, 7, 11, 2][:p_len]], jnp.int32)
    _, state = wh.prefill(params, CFG, state, prompt)
    d = CFG.d_model
    k = jnp.stack([ls["self_k"][0].reshape(T_SELF, d) for ls in state["layers"]])
    v = jnp.stack([ls["self_v"][0].reshape(T_SELF, d) for ls in state["layers"]])
    ck = jnp.stack([ls["cross_k"][0].reshape(tc_valid, d) for ls in state["layers"]])
    cv = jnp.stack([ls["cross_v"][0].reshape(tc_valid, d) for ls in state["layers"]])
    pad = TC_PAD - tc_valid
    ck = jnp.pad(ck, ((0, 0), (0, pad), (0, 0)))
    cv = jnp.pad(cv, ((0, 0), (0, pad), (0, 0)))
    bf = jnp.bfloat16
    return (k.astype(bf), v.astype(bf), ck.astype(bf), cv.astype(bf), tc_valid)


def test_fits():
    assert aed_fused_fits_multi(GEOM, 4, T_SELF, TC_PAD)
    assert not aed_fused_fits_multi(GEOM, 1, T_SELF, TC_PAD)   # batch-1 kernel
    assert not aed_fused_fits_multi(GEOM, 4, T_SELF - 4, TC_PAD)  # unaligned
    turbo = AedGeom(1280, 5120, 20)
    assert aed_fused_fits_multi(turbo, 8, 448, 1504)


def test_multi_matches_batch1_kernel_per_slot():
    """Every slot of one multi-slot step == that slot alone through the
    batch-1 kernel: logits, written cache row, untouched rows — with
    DIFFERENT per-slot positions and tc_valid."""
    params = _qparams()
    stacked = stack_whisper_step_params(params, CFG)
    assert stacked is not None
    bs = 3
    slots = [_slot_state(params, s, p_len=4) for s in range(bs)]
    kc = jnp.stack([s[0] for s in slots], axis=1)   # (NL, B, T, D)
    vc = jnp.stack([s[1] for s in slots], axis=1)
    ck = jnp.stack([s[2] for s in slots], axis=1)
    cv = jnp.stack([s[3] for s in slots], axis=1)
    tcv = jnp.asarray([s[4] for s in slots], jnp.int32)
    pos = jnp.asarray([4, 6, 5], jnp.int32)
    toks = jnp.asarray([5, 9, 13], jnp.int32)

    emb = params["decoder"]["embed"]
    posemb = params["decoder"]["pos"]
    x = (emb[toks] + posemb[pos]).astype(jnp.float32)

    lg, kc2, vc2 = fused_aed_step_multi(stacked, GEOM, x, kc, vc, ck, cv,
                                        pos, tcv, interpret=True)
    for b in range(bs):
        lg1, k1, v1 = fused_whisper_step(
            stacked, CFG, x[b:b + 1], kc[:, b], vc[:, b], ck[:, b], cv[:, b],
            pos[b], tc_valid=tcv[b], interpret=True)
        np.testing.assert_allclose(np.asarray(lg[b]), np.asarray(lg1[0]),
                                   rtol=0, atol=1e-4 * float(jnp.abs(lg1).max()))
        np.testing.assert_array_equal(np.asarray(kc2[:, b]), np.asarray(k1))
        np.testing.assert_array_equal(np.asarray(vc2[:, b]), np.asarray(v1))


def test_parked_slot_writes_nowhere_and_stays_finite():
    params = _qparams()
    stacked = stack_whisper_step_params(params, CFG)
    bs = 2
    slots = [_slot_state(params, s, p_len=4) for s in range(bs)]
    kc = jnp.stack([s[0] for s in slots], axis=1)
    vc = jnp.stack([s[1] for s in slots], axis=1)
    ck = jnp.stack([s[2] for s in slots], axis=1)
    cv = jnp.stack([s[3] for s in slots], axis=1)
    tcv = jnp.asarray([s[4] for s in slots], jnp.int32)
    pos = jnp.asarray([4, -1], jnp.int32)  # slot 1 parked
    x = (params["decoder"]["embed"][jnp.asarray([5, 0], jnp.int32)]
         + params["decoder"]["pos"][jnp.asarray([4, 0], jnp.int32)]
         ).astype(jnp.float32)
    lg, kc2, vc2 = fused_aed_step_multi(stacked, GEOM, x, kc, vc, ck, cv,
                                        pos, tcv, interpret=True)
    assert np.isfinite(np.asarray(lg)).all()
    np.testing.assert_array_equal(np.asarray(kc2[:, 1]), np.asarray(kc[:, 1]))
    np.testing.assert_array_equal(np.asarray(vc2[:, 1]), np.asarray(vc[:, 1]))
    assert (np.asarray(kc2[:, 0, 4]) != 0).any()  # active slot wrote its row


def test_batcher_fused_matches_solo_fused():
    """ContinuousAedBatcher routed through the multi-slot kernel generates
    the same ids as the solo batch-1 fused path (same numerics family),
    with a mid-flight join."""
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.parallel.aed_batcher import ContinuousAedBatcher, spec_for_whisper

    params = _qparams(seed=2)
    stacked = stack_whisper_step_params(params, CFG)
    dc = DecodeConfig(max_new_tokens=5, eot_id=-1)
    mels = [jax.random.normal(jax.random.PRNGKey(40 + s), (1, 48, CFG.n_mels),
                              jnp.float32) for s in range(3)]
    prompt = jnp.asarray([[CFG.sot_id, -1, 5, 6]], jnp.int32)

    def solo(mel):
        out = wh.transcribe_window(params, CFG, mel, prompt, dc,
                                   stacked=stacked, fused_interpret=True)
        c = int(out["counts"][0])
        return [int(t) for t in np.asarray(out["tokens"])[0, 4:4 + c]]

    want = [solo(m) for m in mels]

    spec = spec_for_whisper(CFG)
    # f32 caches: the solo path's make_state caches are f32 (cfg.kv_dtype
    # None), so identity requires matching storage dtype
    bat = ContinuousAedBatcher(params, spec, dc, n_slots=2,
                               kv_dtype=jnp.float32, stacked=stacked,
                               fused_interpret=True)
    assert bat.stacked is not None  # kernel actually engaged

    def submit(mel):
        pre = wh.prefill_window(params, CFG, mel, prompt, dc)
        tc = pre["state"]["layers"][0]["cross_k"].shape[1]
        return bat.try_submit(pre["state"], 4, pre["logits0"], tc)

    slots = {submit(mels[0]): 0}
    bat.step()
    slots[submit(mels[1])] = 1  # joins mid-flight
    got = [None] * 3
    for _ in range(dc.max_new_tokens + 2):
        events = bat.step()
        if not events:
            break
        for slot, _tok, fin in events:
            if fin and slot in slots:
                got[slots[slot]] = bat.take_result(slot)
                del slots[slot]
    slots[submit(mels[2])] = 2
    for _ in range(dc.max_new_tokens + 2):
        events = bat.step()
        if not events:
            break
        for slot, _tok, fin in events:
            if fin and slot in slots:
                got[slots[slot]] = bat.take_result(slot)
                del slots[slot]
    assert got == want
