"""Correctness of the single-call fused Qwen3 decode megakernel.

Compares ``fused_decode_step`` (interpret mode) against the per-weight
``qwen3.decoder_pass`` step on a tiny-but-tiling geometry (head_dim must
be 128 — the kernel hard-codes the lane width), including the left-padded
``shift`` masking and multi-step cache evolution.

Tolerances: the kernel dequantizes to bf16 and accumulates in f32, while
the reference path dequantizes to f32 (HIGHEST matmuls under conftest) —
differences are bounded by bf16 weight rounding (~2^-8 relative per dot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_tpu.layers import qwen3
from asr_tpu.layers.rope import rope_tables
from asr_tpu.ops.fused_decode import _plan, fused_decode_step, stack_decode_params
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


def _quantized_params(cfg=CFG, seed=0, qembed=False):
    params = qwen3.init_params(cfg, jax.random.PRNGKey(seed))
    qparams = quantize_pytree(params, bits=4, block=128, min_size=0, pack=True,
                              refine_iters=0, quantize_embeddings=qembed)
    return qwen3.fuse_params(qparams, cfg)


def _stack_caches(state, cfg, dtype=None):
    kvw = cfg.num_kv_heads * cfg.head_dim
    t = state["layers"][0]["k"].shape[1]
    k = jnp.stack([ls["k"][0].reshape(t, kvw) for ls in state["layers"]])
    v = jnp.stack([ls["v"][0].reshape(t, kvw) for ls in state["layers"]])
    if dtype is not None:
        k, v = k.astype(dtype), v.astype(dtype)
    return k, v


def _rope_rows(pos, shift, cfg, t_max):
    cs = jnp.asarray(rope_tables(t_max, cfg.head_dim, cfg.rope_theta))
    logical = jnp.clip(pos - shift, 0, t_max - 1)
    return cs[0][logical][None, :], cs[1][logical][None, :]


def test_plan_tiles_tiny_and_real_geometry():
    p = _plan(CFG.hidden, CFG.num_heads, CFG.num_kv_heads, CFG.ffn_dim, 128)
    assert p is not None
    assert p["n_qkv"] * p["wa"] == p["qn"] and p["n_gu"] * p["wa"] == p["gn"]
    real = qwen3.Qwen3Config()  # 0.6B geometry
    pr = _plan(real.hidden, real.num_heads, real.num_kv_heads, real.ffn_dim, 128)
    assert pr is not None
    assert pr["wa"] % 128 == 0 and pr["rb"] % 128 == 0


def test_stack_decode_params_roundtrip():
    fused = _quantized_params()
    stacked = stack_decode_params(fused, CFG)
    assert stacked is not None
    nl = CFG.num_layers
    assert stacked["wq"].shape == (nl, CFG.hidden // 2,
                                   (CFG.num_heads + 2 * CFG.num_kv_heads) * 128)
    # scale/zero*scale arrays are nibble-plane-major: plane 0 rows must
    # equal the first half of the per-leaf scale rows.
    w0 = fused["layers"][0]["attn"]["qkv"]["w"]
    nb2 = w0.scale.shape[0]
    np.testing.assert_array_equal(
        np.asarray(stacked["qkv_s"][0, 0]), np.asarray(w0.scale[: nb2 // 2]))
    np.testing.assert_allclose(
        np.asarray(stacked["qkv_zs"][0, 1]),
        np.asarray((w0.zero * w0.scale)[nb2 // 2:]), rtol=1e-6)


def test_stack_rejects_unpacked_or_mixed():
    params = qwen3.init_params(CFG, jax.random.PRNGKey(0))
    q8 = qwen3.fuse_params(
        quantize_pytree(params, bits=8, min_size=0, refine_iters=0), CFG)
    assert stack_decode_params(q8, CFG) is None
    unfused = quantize_pytree(params, bits=4, block=128, min_size=0, pack=True,
                              refine_iters=0)
    assert stack_decode_params(unfused, CFG) is None  # no qkv/gateup leaves
    no_final = dict(_quantized_params())
    no_final.pop("final_norm")
    assert stack_decode_params(no_final, CFG) is None  # final norm lives in-kernel


@pytest.mark.parametrize("shift_v", [0, 3])
def test_fused_step_matches_decoder_pass(shift_v):
    cfg = CFG
    fused = _quantized_params()
    shift = jnp.asarray([shift_v], jnp.int32)
    prompt_len = 6  # prompt occupies slots [shift_v, 6)

    rng = jax.random.PRNGKey(7)
    embeds = jax.random.normal(rng, (1, prompt_len, cfg.hidden), jnp.float32) * 0.3

    state = qwen3.make_kv_state(cfg, 1, T_MAX, jnp.float32)
    bias = qwen3.left_prefill_bias(shift, prompt_len, T_MAX)
    hidden, state = qwen3.decoder_pass(
        fused, cfg, embeds, state, jnp.asarray(0, jnp.int32), bias,
        pos_offset=shift)

    kc, vc = _stack_caches(state, cfg, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 1, cfg.hidden), jnp.float32) * 0.3

    from asr_tpu.layers.norms import rms_norm

    for step_i in range(2):
        pos = jnp.asarray(prompt_len + step_i, jnp.int32)
        sbias = qwen3.left_step_bias(shift, pos, T_MAX)
        h_ref, state = qwen3.decoder_pass(fused, cfg, x, state, pos, sbias,
                                          pos_offset=shift)
        cos, sin = _rope_rows(pos, shift[0], cfg, T_MAX)
        h_fused, lg, kc, vc = fused_decode_step(
            stacked_hashable(fused, cfg), cfg, x[:, 0], kc, vc, pos, shift[0],
            cos, sin, interpret=True)
        assert lg is None  # no tied-head arrays in this stacked dict

        # the kernel emits FINAL-NORMALIZED hidden
        ref = np.asarray(rms_norm(h_ref[:, 0], fused["final_norm"]["scale"],
                                  cfg.rms_eps))
        got = np.asarray(h_fused)
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-2 * np.abs(ref).max())

        kr, vr = _stack_caches(state, cfg)
        # the written row matches to bf16 tolerance; all other rows must
        # be untouched bit-for-bit (bf16 round of the reference rows).
        np.testing.assert_allclose(
            np.asarray(kc[:, pos], np.float32), np.asarray(kr[:, pos]),
            rtol=0, atol=2e-2 * np.abs(np.asarray(kr[:, pos])).max())
        np.testing.assert_allclose(
            np.asarray(vc[:, pos], np.float32), np.asarray(vr[:, pos]),
            rtol=0, atol=2e-2 * np.abs(np.asarray(vr[:, pos])).max())
        mask = np.arange(T_MAX) != int(pos)
        np.testing.assert_array_equal(
            np.asarray(kc[:, mask]), np.asarray(kr.astype(jnp.bfloat16)[:, mask]))
        np.testing.assert_array_equal(
            np.asarray(vc[:, mask]), np.asarray(vr.astype(jnp.bfloat16)[:, mask]))

        # feed the reference caches forward so errors do not compound
        # across steps through mismatched states
        kc, vc = kr.astype(jnp.bfloat16), vr.astype(jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(20 + step_i), (1, 1, cfg.hidden),
                              jnp.float32) * 0.3


_STACK_CACHE = {}


def stacked_hashable(fused, cfg):
    key = id(fused)
    if key not in _STACK_CACHE:
        _STACK_CACHE[key] = stack_decode_params(fused, cfg)
    return _STACK_CACHE[key]


def test_fused_head_logits_match_reference():
    """With a quantized tied embed, the LM head streams through the same
    kernel: its (1, V_pad) logits must match logits_from_hidden on the
    un-normalized hidden (same head weights, same affine), and the pad
    columns must be exactly 0 (zero-scale padding)."""
    cfg = CFG
    fused = _quantized_params(seed=5, qembed=True)
    stacked = stack_decode_params(fused, cfg)
    assert stacked is not None and "wh" in stacked

    shift = jnp.asarray([0], jnp.int32)
    prompt_len = 4
    embeds = jax.random.normal(jax.random.PRNGKey(6), (1, prompt_len, cfg.hidden),
                               jnp.float32) * 0.3
    state = qwen3.make_kv_state(cfg, 1, T_MAX, jnp.float32)
    bias = qwen3.left_prefill_bias(shift, prompt_len, T_MAX)
    _, state = qwen3.decoder_pass(fused, cfg, embeds, state,
                                  jnp.asarray(0, jnp.int32), bias,
                                  pos_offset=shift)
    kc, vc = _stack_caches(state, cfg, jnp.bfloat16)

    x = jax.random.normal(jax.random.PRNGKey(8), (1, 1, cfg.hidden), jnp.float32) * 0.3
    pos = jnp.asarray(prompt_len, jnp.int32)
    sbias = qwen3.left_step_bias(shift, pos, T_MAX)
    h_ref, _ = qwen3.decoder_pass(fused, cfg, x, state, pos, sbias,
                                  pos_offset=shift)
    logits_ref = qwen3.logits_from_hidden(fused, cfg, h_ref[:, 0])

    cos, sin = _rope_rows(pos, shift[0], cfg, T_MAX)
    _, lg, _, _ = fused_decode_step(stacked, cfg, x[:, 0], kc, vc, pos,
                                    shift[0], cos, sin, interpret=True)
    assert lg is not None and lg.shape[1] == stacked["wh"].shape[1]
    ref = np.asarray(logits_ref)
    got = np.asarray(lg[:, : cfg.vocab_size])
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-2 * np.abs(ref).max())
    np.testing.assert_array_equal(np.asarray(lg[:, cfg.vocab_size:]), 0.0)


def test_transcribe_embeds_fused_routing():
    """The batch-1 fused route through transcribe_embeds (interpret mode on
    CPU) must produce the same generated ids as the per-weight path —
    weights are shaped so logits gaps dwarf the bf16-dot differences."""
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.models.qwen_asr import QwenAsrConfig, transcribe_embeds

    cfg = CFG
    fused = _quantized_params(seed=3)
    qcfg = QwenAsrConfig(output_dim=cfg.hidden, llm=cfg, eot_id=5)
    stacked = stacked_hashable(fused, cfg)
    assert stacked is not None

    embeds = jax.random.normal(jax.random.PRNGKey(11), (1, 5, cfg.hidden),
                               jnp.float32) * 0.3
    valid = jnp.asarray([4], jnp.int32)
    dc = DecodeConfig(max_new_tokens=4, eot_id=-1)

    tok_f, cnt_f, start_f = transcribe_embeds(
        fused, qcfg, embeds, valid, dc, stacked=stacked, fused_interpret=True)
    tok_p, cnt_p, start_p = transcribe_embeds(fused, qcfg, embeds, valid, dc)
    assert int(start_f[0]) == int(start_p[0]) == 5
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_p))
    lf = int(start_f[0])
    np.testing.assert_array_equal(
        np.asarray(tok_f[:, lf:lf + int(cnt_f[0])]),
        np.asarray(tok_p[:, lf:lf + int(cnt_p[0])]))
