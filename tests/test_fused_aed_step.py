"""Correctness of the fused AED decode-step megakernel (Whisper geometry here;
FireRed/Dolphin coverage below).

Compares ``fused_whisper_step`` (interpret mode) against the per-weight
``whisper.step`` reference (q8 weights dequantized to f32, HIGHEST matmuls
under conftest) on a tiny-but-tiling geometry: head_dim is fixed at 64
(the head-pair masking trick), d_model must be a 256 multiple.

Tolerances bound bf16-dot rounding (~2^-8 relative per dot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_tpu.models import whisper as wh
from asr_tpu.ops.fused_aed_step import (
    _aed_plan,
    fused_whisper_step,
    stack_whisper_step_params,
    whisper_fused_fits,
)
from asr_tpu.quant.quantize import quantize_pytree

CFG = wh.WhisperConfig(
    vocab_size=64,
    d_model=256,
    encoder_layers=1,
    decoder_layers=2,
    num_heads=4,
    ffn_dim=1024,
    n_mels=16,
    max_source_positions=24,
    max_target_positions=16,
    sot_id=1,
    eot_id=0,
    no_speech_id=2,
    first_language_id=8,
    num_languages=4,
)
T_SELF = 16


def _qparams(seed=0):
    params = wh.init_params(CFG, jax.random.PRNGKey(seed))
    return quantize_pytree(params, bits=8, block=128, min_size=0,
                           refine_iters=0, quantize_embeddings=True)


def _stack_self(state):
    d = CFG.d_model
    k = jnp.stack([ls["self_k"][0].reshape(T_SELF, d) for ls in state["layers"]])
    v = jnp.stack([ls["self_v"][0].reshape(T_SELF, d) for ls in state["layers"]])
    return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


def _stack_cross(state, t_cross, valid):
    d = CFG.d_model
    k = jnp.stack([ls["cross_k"][0].reshape(valid, d) for ls in state["layers"]])
    v = jnp.stack([ls["cross_v"][0].reshape(valid, d) for ls in state["layers"]])
    pad = t_cross - valid
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


def test_plan_and_fits():
    assert _aed_plan(CFG.d_model, CFG.ffn_dim, CFG.num_heads, 128) is not None
    turbo = wh.WhisperConfig()  # large-v3-turbo geometry
    p = _aed_plan(turbo.d_model, turbo.ffn_dim, turbo.num_heads, 128)
    assert p is not None and p["na_cols"] == 6 * 1280 + 5120
    assert whisper_fused_fits(turbo, 448, 1504)
    assert not whisper_fused_fits(turbo, 444, 1504)  # unaligned cache


@pytest.mark.parametrize("t_cross_pad", [24, 1600])
def test_fused_step_matches_reference(t_cross_pad):
    """One fused step == per-weight step (logits + cache evolution),
    including the chunked cross-attention path (t_cross_pad=1600 -> two
    800-row chunks) and cross pad-row masking."""
    params = _qparams()
    tc_valid = 24
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, tc_valid, CFG.d_model),
                            jnp.float32) * 0.3

    state = wh.make_state(params, CFG, enc)
    prompt = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    _, state = wh.prefill(params, CFG, state, prompt)

    stacked = stack_whisper_step_params(params, CFG)
    assert stacked is not None
    kc, vc = _stack_self(state)
    ck, cv = _stack_cross(state, t_cross_pad, tc_valid)

    emb = params["decoder"]["embed"]
    posemb = params["decoder"]["pos"]
    tok = jnp.asarray([[5]], jnp.int32)
    for step_i in range(2):
        pos = jnp.asarray(4 + step_i, jnp.int32)
        logits_ref, state = wh.step(params, CFG, state, tok, pos)

        x = emb[tok[0]] + posemb[pos][None]
        lg, kc2, vc2 = fused_whisper_step(
            stacked, CFG, x.astype(jnp.float32), kc, vc, ck, cv, pos,
            tc_valid=tc_valid, interpret=True)

        ref = np.asarray(logits_ref)
        got = np.asarray(lg[:, : CFG.vocab_size])
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=3e-2 * np.abs(ref).max())
        np.testing.assert_array_equal(np.asarray(lg[:, CFG.vocab_size:]), 0.0)

        # cache: written row matches (bf16), all other rows untouched
        kr, vr = _stack_self(state)
        p = int(pos)
        np.testing.assert_allclose(
            np.asarray(kc2[:, p], np.float32), np.asarray(kr[:, p], np.float32),
            rtol=0, atol=2e-2 * np.abs(np.asarray(kr[:, p], np.float32)).max())
        mask = np.arange(T_SELF) != p
        np.testing.assert_array_equal(np.asarray(kc2[:, mask]),
                                      np.asarray(kc[:, mask]))
        np.testing.assert_array_equal(np.asarray(vc2[:, mask]),
                                      np.asarray(vc[:, mask]))

        # feed reference caches forward so errors don't compound
        kc, vc = kr, vr
        tok = jnp.asarray([[9 + step_i]], jnp.int32)


def test_stack_rejects_unquantized_and_q4():
    params = wh.init_params(CFG, jax.random.PRNGKey(0))
    assert stack_whisper_step_params(params, CFG) is None  # raw f32
    q4 = quantize_pytree(params, bits=4, block=128, min_size=0, pack=True,
                         refine_iters=0, quantize_embeddings=True)
    assert stack_whisper_step_params(q4, CFG) is None      # q8-only kernel
    q8_no_embed = quantize_pytree(params, bits=8, block=128, min_size=0,
                                  refine_iters=0)
    assert stack_whisper_step_params(q8_no_embed, CFG) is None


def test_transcribe_window_fused_routing():
    """The batch-1 fused route through transcribe_window (interpret mode on
    CPU) must produce the same generated ids, language and no-speech prob
    as the per-weight path."""
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.frontend.whisper_mel import WhisperMelConfig

    params = _qparams(seed=2)
    stacked = stack_whisper_step_params(params, CFG)
    assert stacked is not None
    # tiny mel straight in (encode expects (B, T, n_mels))
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 48, CFG.n_mels),
                            jnp.float32)
    prompt = jnp.asarray([[CFG.sot_id, -1, 5, 6]], jnp.int32)
    dc = DecodeConfig(max_new_tokens=4, eot_id=-1)

    out_f = wh.transcribe_window(params, CFG, mel, prompt, dc,
                                 stacked=stacked, fused_interpret=True)
    out_p = wh.transcribe_window(params, CFG, mel, prompt, dc)
    np.testing.assert_array_equal(np.asarray(out_f["language"]),
                                  np.asarray(out_p["language"]))
    np.testing.assert_array_equal(np.asarray(out_f["counts"]),
                                  np.asarray(out_p["counts"]))
    np.testing.assert_array_equal(np.asarray(out_f["tokens"]),
                                  np.asarray(out_p["tokens"]))


@pytest.mark.parametrize("family", ["firered", "dolphin"])
def test_fused_ar_decode_matches_per_weight(family):
    """FireRed / Dolphin batch-1 transcribe through the shared AED
    megakernel route (interpret mode) must generate the same ids as the
    per-weight path — same geometry constraints (head_dim 64, d%256==0),
    biased k (both) and bias-free o (FireRed) exercise the zero-fill
    bias stacking Whisper never does."""
    from asr_tpu.decode.ar import DecodeConfig

    if family == "firered":
        from asr_tpu.models import firered as m

        cfg = m.FireRedConfig(
            vocab_size=96, d_model=256, enc_layers=1, enc_heads=4,
            dec_layers=2, dec_heads=4, dec_ffn=768,
            max_target_positions=16, sos_id=1, eos_id=2,
        )
        run = lambda p, a, v, dc, **kw: m.transcribe(p, cfg, a, v, dc, **kw)
    else:
        from asr_tpu.models import dolphin as m

        cfg = m.DolphinConfig(
            vocab_size=96, d_model=256, enc_layers=1, enc_heads=4, enc_ffn=320,
            cgmlp_dim=320, csgu_kernel=7, fusion_kernel=3, dec_layers=2,
            dec_heads=4, dec_ffn=768, sos_id=1, eos_id=2,
            language_token_start=40, language_token_end=50,
            region_token_start=50, region_token_end=60,
            max_target_positions=16,
        )
        prompt = jnp.asarray([[cfg.sos_id, -1, -2]], jnp.int32)
        run = lambda p, a, v, dc, **kw: m.transcribe(p, cfg, a, v, prompt,
                                                     dc, **kw)

    # quantize the DECODER only: min_size=0 on the whole tiny pytree would
    # also hit encoder kernels that production min_size never touches
    params = m.init_params(cfg, jax.random.PRNGKey(7))
    params["decoder"] = quantize_pytree(
        {"decoder": params["decoder"]}, bits=8, block=128, min_size=0,
        refine_iters=0, quantize_embeddings=True)["decoder"]
    from asr_tpu.ops.fused_aed_step import AedGeom, stack_aed_step_params

    stacked = stack_aed_step_params(
        params["decoder"], AedGeom(cfg.d_model, cfg.dec_ffn, cfg.dec_heads))
    assert stacked is not None

    rng = np.random.default_rng(1)
    audio = jnp.asarray((rng.standard_normal((1, 8000)) * 2000)
                        .astype(np.float32))
    valid = jnp.asarray([8000], jnp.int32)
    dc = DecodeConfig(max_new_tokens=5, eot_id=-1)

    out_ref = run(params, audio, valid, dc)
    out_fused = run(params, audio, valid, dc, stacked=stacked,
                    fused_interpret=True)
    if isinstance(out_ref, dict):
        np.testing.assert_array_equal(np.asarray(out_fused["tokens"]),
                                      np.asarray(out_ref["tokens"]))
        np.testing.assert_array_equal(np.asarray(out_fused["counts"]),
                                      np.asarray(out_ref["counts"]))
        np.testing.assert_array_equal(np.asarray(out_fused["language"]),
                                      np.asarray(out_ref["language"]))
    else:
        np.testing.assert_array_equal(np.asarray(out_fused[0]),
                                      np.asarray(out_ref[0]))
        np.testing.assert_array_equal(np.asarray(out_fused[1]),
                                      np.asarray(out_ref[1]))
