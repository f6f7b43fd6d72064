"""Quantization: RTN/refined block quantization error, pytree walking,
dequant-fused matmul (XLA + Pallas-interpret) correctness, bf16 cast,
quantized model end-to-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from asr_tpu.layers.transformer import dense
from asr_tpu.ops.quant_matmul import quant_dense, quant_matmul_pallas
from asr_tpu.quant.quantize import (
    cast_pytree,
    dequantize_weight,
    quantization_error,
    quantize_linear,
    quantize_pytree,
    quantization_error,
)


def test_q8_error_small_and_refine_helps():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    q_rtn = quantize_linear(w, bits=8, block=64, refine_iters=0)
    q_ref = quantize_linear(w, bits=8, block=64, refine_iters=3)
    e_rtn = quantization_error(w, q_rtn)
    e_ref = quantization_error(w, q_ref)
    assert e_rtn < 0.01
    assert e_ref <= e_rtn * 1.05  # refinement never materially worse


def test_q4_error_reasonable():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    qleaf = quantize_linear(w, bits=4, block=32, refine_iters=2)
    assert qleaf["q"].dtype == jnp.int8  # centered storage: q - 128
    assert int(qleaf["q"].max()) <= 15 - 128
    assert quantization_error(w, qleaf) < 0.12


def test_quant_dense_matches_dequant_matmul():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 5, 128)).astype(np.float32))
    qleaf = quantize_linear(w, bits=8, block=64)
    ref = x @ dequantize_weight(qleaf)
    out = quant_dense(x, qleaf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # dense() consumes quantized leaves transparently
    out2 = dense(x, {"w": qleaf, "b": jnp.zeros((96,))})
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_xla():
    rng = np.random.default_rng(3)
    m, k, n, block = 256, 512, 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    qleaf = quantize_linear(w, bits=8, block=block)
    ref = x @ dequantize_weight(qleaf)
    out = quant_matmul_pallas(
        x, qleaf["q"], qleaf["scale"], qleaf["zero"], block,
        tile_m=128, tile_n=128, tile_k=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_quantize_pytree_walks_and_model_runs():
    from asr_tpu.models import sensevoice as sv

    cfg = sv.SenseVoiceConfig(
        vocab_size=300, hidden=64, num_heads=4, head_dim=16, ffn_dim=256,
        num_encoders0=1, num_encoders=1, num_tp_encoders=1, fsmn_kernel=5,
    )
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_pytree(params, bits=8, block=64, min_size=4096)
    from asr_tpu.quant.quantize import QuantizedLinear

    # ffn weights (64*256 = 16k >= 4096) got quantized
    assert isinstance(qparams["encoders"][0]["ffn"]["w1"], QuantizedLinear)
    assert isinstance(qparams["encoders"][0]["qkv"]["w"], QuantizedLinear)
    x = jnp.ones((1, 3, 64))
    y = dense(x, qparams["encoders"][0]["out"])
    assert y.shape[-1] == 64


def test_cast_pytree_bf16():
    tree = {"a": jnp.ones((4,), jnp.float32), "b": jnp.asarray([1, 2], jnp.int32)}
    out = cast_pytree(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


def test_quantized_sensevoice_forward_agrees():
    """A q8-quantized SenseVoice must produce near-identical CTC tokens."""
    from asr_tpu.models import sensevoice as sv

    cfg = sv.SenseVoiceConfig(
        vocab_size=300, hidden=64, num_heads=4, head_dim=16, ffn_dim=256,
        num_encoders0=1, num_encoders=2, num_tp_encoders=1, fsmn_kernel=5,
    )
    params = sv.init_params(cfg, jax.random.PRNGKey(5))
    qparams = quantize_pytree(params, bits=8, block=64, min_size=4096)
    rng = np.random.default_rng(5)
    audio = jnp.asarray((rng.standard_normal((1, 8000)) * 2000).astype(np.float32))
    t1, n1 = sv.forward(params, cfg, audio, jnp.asarray([8000]), jnp.asarray([1]))
    t2, n2 = sv.forward(qparams, cfg, audio, jnp.asarray([8000]), jnp.asarray([1]))
    # random weights produce near-uniform logits; require strong agreement
    k = min(int(n1[0]), int(n2[0]))
    agree = (np.asarray(t1)[0, :k] == np.asarray(t2)[0, :k]).mean() if k else 1.0
    assert abs(int(n1[0]) - int(n2[0])) <= max(2, int(0.2 * int(n1[0])))
    assert agree > 0.7


def test_packed_int4_roundtrip_and_matmul():
    from asr_tpu.quant.quantize import quantize_linear, dequantize_weight, pack4_halves, unpack4_halves
    from asr_tpu.ops.quant_matmul import quant_matmul_pallas_p4

    rng = np.random.default_rng(9)
    k, n, block = 2048, 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    qleaf = quantize_linear(w, bits=4, block=block, pack=True)
    assert qleaf.packed and qleaf["q"].shape == (k // 2, n)
    # packed dequant error comparable to unpacked int4
    unpacked = quantize_linear(w, bits=4, block=block, pack=False)
    e_p = quantization_error(w, qleaf)
    e_u = quantization_error(w, unpacked)
    np.testing.assert_allclose(e_p, e_u, rtol=1e-5)

    x = jnp.asarray(rng.standard_normal((128, k)).astype(np.float32))
    ref = x @ dequantize_weight(qleaf)
    out = quant_matmul_pallas_p4(
        x, qleaf["q"], qleaf["scale"], qleaf["zero"], block,
        tile_m=128, tile_n=128, tile_k2=1024, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_packed_artifact_roundtrip(tmp_path):
    from asr_tpu.quant.quantize import quantize_linear, dequantize_weight
    from asr_tpu.runtime.artifact import save_model, load_model
    from asr_tpu.runtime.metadata import ModelMetadata

    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    qleaf = quantize_linear(w, bits=4, block=128, pack=True)
    save_model(tmp_path / "m", {"layer": {"w": qleaf}}, ModelMetadata(family="x"))
    loaded, _ = load_model(tmp_path / "m")
    q2 = loaded["layer"]["w"]
    assert q2.packed and q2.bits == 4
    np.testing.assert_allclose(
        np.asarray(dequantize_weight(q2)), np.asarray(dequantize_weight(qleaf)), atol=1e-6
    )


def test_q2_roundtrip_and_pack2():
    from asr_tpu.quant.quantize import (
        dequantize_weight, pack2_quarters, quantize_linear, quantization_error,
        unpack2_quarters,
    )

    rng = np.random.default_rng(11)
    k, n, block = 512, 64, 128
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))

    # pack2/unpack2 bit-exact roundtrip on raw 2-bit codes
    codes = jnp.asarray(rng.integers(0, 4, size=(k, n)).astype(np.uint8))
    packed = pack2_quarters(codes)
    assert packed.shape == (k // 4, n)
    np.testing.assert_array_equal(
        np.asarray(unpack2_quarters(packed)), np.asarray(codes, np.float32)
    )

    # Q2 quantization: coarse but bounded error, packed == unpacked dequant
    qleaf = quantize_linear(w, bits=2, block=block, pack=True)
    assert qleaf.packed and qleaf.bits == 2 and qleaf.q.shape == (k // 4, n)
    e_p = quantization_error(w, qleaf)
    unpacked = quantize_linear(w, bits=2, block=block, pack=False)
    e_u = quantization_error(w, unpacked)
    np.testing.assert_allclose(e_p, e_u, rtol=1e-5)
    # 4 uniform levels over a ~±2.9-sigma block range on gaussian data:
    # step ~1.9 sigma -> relative RMS error ~0.5-0.55.
    assert e_u < 0.6

    # quant_dense consumes the packed-2-bit leaf via the XLA path
    from asr_tpu.ops.quant_matmul import quant_dense

    x = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32))
    ref = x @ dequantize_weight(qleaf)
    np.testing.assert_allclose(np.asarray(quant_dense(x, qleaf)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_kquant_objective_beats_rtn_with_outliers():
    from asr_tpu.quant.quantize import dequantize_weight, quantize_linear

    rng = np.random.default_rng(12)
    k, n, block = 512, 64, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    # Inject sparse outliers: RTN stretches the block range to cover them,
    # wasting resolution on the bulk; kquant may shrink the scale instead.
    mask = rng.random((k, n)) < 0.005
    w = w + mask * rng.standard_normal((k, n)).astype(np.float32) * 12.0
    w = jnp.asarray(w)

    def weighted_err(qleaf):
        deq = dequantize_weight(qleaf)
        imp = np.asarray(w) ** 2
        return float(np.sum(imp * np.asarray(w - deq) ** 2))

    e_rtn = weighted_err(quantize_linear(w, bits=4, block=block, objective="rtn"))
    e_kq = weighted_err(quantize_linear(w, bits=4, block=block, objective="kquant"))
    assert e_kq <= e_rtn * 1.001, (e_kq, e_rtn)


def test_pallas_p2_kernel_interpret_matches_xla():
    from asr_tpu.ops.quant_matmul import quant_matmul_pallas_p2
    from asr_tpu.quant.quantize import dequantize_weight, quantize_linear

    rng = np.random.default_rng(13)
    k, n, block = 8192, 256, 256  # k4 = 2048, k4/block = 8 rows (aligned)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    qleaf = quantize_linear(w, bits=2, block=block, pack=True)
    assert qleaf.packed and qleaf.q.shape == (k // 4, n)
    x = jnp.asarray(rng.standard_normal((128, k)).astype(np.float32))
    ref = x @ dequantize_weight(qleaf)
    out = quant_matmul_pallas_p2(
        x, qleaf["q"], qleaf["scale"], qleaf["zero"], block,
        tile_m=128, tile_n=128, tile_k4=2048, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_hqq_beats_or_matches_rtn():
    """HQQ zero-point optimization: reconstruction error <= RTN on an
    outlier-heavy weight (the regime HQQ targets)."""
    from asr_tpu.quant.quantize import quantization_error, quantize_linear

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    w[rng.integers(0, 256, 40), rng.integers(0, 64, 40)] *= 12.0  # outliers
    w = jnp.asarray(w)
    err_rtn = quantization_error(w, quantize_linear(w, bits=4, block=64))
    err_hqq = quantization_error(w, quantize_linear(w, bits=4, block=64, objective="hqq"))
    assert err_hqq <= err_rtn * 1.02  # never meaningfully worse
    assert err_hqq < 0.5


def test_dynamic_int8_dense_close_to_f32():
    from asr_tpu.layers.transformer import dense
    from asr_tpu.quant.quantize import quantize_linear

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(96).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((2, 5, 128)).astype(np.float32))
    ref = np.asarray(dense(x, {"w": w, "b": b}))
    qleaf = quantize_linear(w, objective="dynamic")
    assert qleaf.dynamic and qleaf.block == 128 and qleaf.bits == 8
    out = np.asarray(dense(x, {"w": qleaf, "b": b}))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel

    # jit-compatible (QuantizedLinear is a pytree node; dynamic is aux).
    out2 = np.asarray(jax.jit(lambda x: dense(x, {"w": qleaf, "b": b}))(x))
    np.testing.assert_allclose(out2, out, rtol=1e-5, atol=1e-6)


def test_quantized_embedding_gather_and_tied_logits():
    from asr_tpu.quant.quantize import embedding_logits, quantize_embedding

    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((50, 64)).astype(np.float32))
    qemb = quantize_embedding(table, bits=8, block=32)
    ids = jnp.asarray([[0, 7, 49], [3, 3, 11]])
    got = np.asarray(qemb[ids])
    want = np.asarray(table)[np.asarray(ids)]
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.01, rel

    y = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    lg = np.asarray(embedding_logits(qemb, y))
    ref = np.asarray(y @ table.T)
    assert np.linalg.norm(lg - ref) / np.linalg.norm(ref) < 0.01


def test_qwen3_runs_with_quantized_embedding():
    """Tied Qwen3 decoder runs with a QuantizedEmbedding for lookup + head,
    and the artifact round trip preserves the leaf."""
    from asr_tpu.layers import qwen3
    from asr_tpu.quant.quantize import QuantizedEmbedding, quantize_pytree
    from asr_tpu.runtime.artifact import flatten_pytree, unflatten_pytree

    cfg = qwen3.Qwen3Config(vocab_size=512, hidden=64, num_layers=1, num_heads=4,
                            num_kv_heads=2, head_dim=16, ffn_dim=96)
    params = qwen3.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_pytree(params, min_size=1 << 10, quantize_embeddings=True)
    assert isinstance(qparams["embed"], QuantizedEmbedding)

    ids = jnp.asarray([[3, 17, 42]])
    embeds = qparams["embed"][ids].astype(jnp.float32)
    state = qwen3.make_kv_state(cfg, 1, 8)
    bias = qwen3.causal_prefill_bias(jnp.asarray([3]), 3, 8)
    hidden, _ = qwen3.decoder_pass(qparams, cfg, embeds, state, jnp.asarray(0, jnp.int32), bias)
    logits = qwen3.logits_from_hidden(qparams, cfg, hidden)
    assert logits.shape == (1, 3, 512)

    rt = unflatten_pytree(flatten_pytree(qparams))
    assert isinstance(rt["embed"], QuantizedEmbedding)
    np.testing.assert_array_equal(np.asarray(rt["embed"].q), np.asarray(qparams["embed"].q))


def test_whisper_runs_with_quantized_embedding():
    """Tied Whisper logits route through embedding_logits, so
    quantize_embeddings artifacts transcribe instead of crashing on .T
    (code-review r2 finding)."""
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.models import whisper as wh
    from asr_tpu.quant.quantize import QuantizedEmbedding, quantize_pytree

    cfg = wh.WhisperConfig(
        vocab_size=256, d_model=32, encoder_layers=1, decoder_layers=1,
        num_heads=4, n_mels=16, max_source_positions=20,
        max_target_positions=16, sot_id=1, eot_id=2, first_language_id=10,
        num_languages=4, transcribe_id=20, translate_id=21,
        no_timestamps_id=22, no_speech_id=30,
    )
    params = wh.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_pytree(params, min_size=1 << 10, quantize_embeddings=True)
    assert isinstance(qparams["decoder"]["embed"], QuantizedEmbedding)
    mel = jnp.zeros((1, 40, 16), jnp.float32)
    out = wh.transcribe_window(
        qparams, cfg, mel, jnp.asarray([[1, -1, 20, 22]], jnp.int32),
        DecodeConfig(max_new_tokens=3, eot_id=2))
    assert out["tokens"].shape[0] == 1


def test_penalty_excludes_prompt_slots():
    """Repetition penalty matches the reference's generated-only save_id:
    prompt slots (incl. zero-filled embed-prompt buffers) are never
    penalized (code-review r2 finding on qwen's zero buffer)."""
    from asr_tpu.decode.strategies import apply_repetition_penalty

    logits = jnp.ones((1, 8), jnp.float32)
    buf = jnp.asarray([[0, 0, 0, 5, 6, 0, 0, 0]], jnp.int32)  # prompt=3 zeros, gen=[5,6]
    # Without start: id 0 is phantom-penalized via the zero prompt slots.
    out_bad = np.asarray(apply_repetition_penalty(logits, buf, 5, 2.0, 8))
    assert out_bad[0, 0] == 0.5
    # With hist_start=3 only the generated ids 5 and 6 are penalized.
    out = np.asarray(apply_repetition_penalty(logits, buf, 5, 2.0, 8, hist_start=3))
    assert out[0, 0] == 1.0 and out[0, 5] == 0.5 and out[0, 6] == 0.5
    assert out[0, 1] == 1.0


def test_pallas_dispatch_pads_ragged_and_tiny_m():
    """_pallas_quant_dense_2d: M=1 (AR decode step), ragged M (1096 — a
    batch-8 SenseVoice window count) and tile-aligned M all round-trip
    through the padded kernel path and match the XLA dequant reference.
    Regression: uncapped tile_m blew the VMEM scoped limit at real model
    shapes, and M=1 silently fell back to full f32 dequant per step."""
    import jax.numpy as jnp
    from asr_tpu.ops.quant_matmul import _pallas_quant_dense_2d, _plan_tile_m, _xla_quant_dense
    from asr_tpu.quant.quantize import quantize_linear

    assert _plan_tile_m(1) == (8, 8)
    assert _plan_tile_m(300) == (256, 512)
    assert _plan_tile_m(12000) == (256, 12032)

    rng = np.random.default_rng(5)
    k, n = 512, 256
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    for bits, pack in ((8, False), (4, True)):
        qleaf = quantize_linear(w, bits=bits, block=64 if not pack else 32, pack=pack)
        if pack and not qleaf["packed"]:
            continue
        for m in (1, 9, 300):
            x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
            got = _pallas_quant_dense_2d(x, qleaf, interpret=True, mm="f32")
            if got is None:
                continue
            want = _xla_quant_dense(x, qleaf)
            assert got.shape == (m, n)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pallas_dispatch_small_block_count_packed():
    """Qwen3-0.6B layer shapes (K=1024, block=128 -> 4 scale rows per
    nibble half) must take the Pallas packed path — the old 8-aligned-slice
    guard silently sent every such layer to the XLA dequant fallback,
    erasing the quantization bandwidth win in AR decode."""
    import jax.numpy as jnp
    from asr_tpu.ops.quant_matmul import _pallas_quant_dense_2d, _xla_quant_dense
    from asr_tpu.quant.quantize import quantize_linear

    rng = np.random.default_rng(7)
    for bits, k in ((4, 1024), (2, 1024)):
        w = jnp.asarray(rng.standard_normal((k, 256)).astype(np.float32) * 0.05)
        qleaf = quantize_linear(w, bits=bits, block=128, pack=True)
        assert qleaf["packed"]
        x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32))
        got = _pallas_quant_dense_2d(x, qleaf, interpret=True, mm="f32")
        assert got is not None, f"int{bits} K={k} fell back to XLA"
        want = _xla_quant_dense(x, qleaf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_quantized_embedding_tied_head_paths_agree():
    """The Pallas tied-head path (stored (D, V) copy), the blockwise
    einsum fallback, and dense y @ dequant().T all agree; artifact
    roundtrip rebuilds the transposed copy from the stored flag."""
    import jax.numpy as jnp
    from asr_tpu.quant.quantize import quantize_embedding, embedding_logits
    from asr_tpu.runtime.artifact import flatten_pytree, unflatten_pytree

    rng = np.random.default_rng(3)
    v, d = 384, 256
    w = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32) * 0.05)
    y = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))

    emb = quantize_embedding(w, bits=8, block=64)
    v_pad = -(-v // 512) * 512  # head copy pads V to a 512 multiple
    assert emb.q_t is not None and emb.q_t.shape == (d, v_pad)
    assert emb.scale_t.shape == (d // 64, v_pad)
    dense_ref = np.asarray(y @ emb.dequant().T)

    got_tied = np.asarray(embedding_logits(emb, y))          # q_t path (XLA on CPU)
    np.testing.assert_allclose(got_tied, dense_ref, rtol=1e-5, atol=1e-5)

    emb_nt = quantize_embedding(w, bits=8, block=64, tie_head=False)
    got_einsum = np.asarray(embedding_logits(emb_nt, y))     # blockwise fallback
    np.testing.assert_allclose(got_einsum, dense_ref, rtol=1e-4, atol=1e-4)

    back = unflatten_pytree(flatten_pytree({"embed": emb}))["embed"]
    assert back.q_t is not None
    np.testing.assert_array_equal(np.asarray(back.q_t), np.asarray(emb.q_t))
    back_nt = unflatten_pytree(flatten_pytree({"embed": emb_nt}))["embed"]
    assert back_nt.q_t is None


def test_quantized_embedding_tied_head_q4_packs_nibbles():
    """4-bit tied heads store the (D/2, V_pad) NIBBLE-PACKED orientation
    (the head is the largest HBM read of a decode step; unpacked int8
    doubles it), V padded to 2048 for the wide decode tiles. Logits must
    match dense y @ dequant().T to quantization-roundoff, through both the
    XLA fallback (CPU) and the interpreted Pallas packed kernel; the
    artifact roundtrip must rebuild the packed copy bit-identically."""
    import jax.numpy as jnp
    from asr_tpu.ops.quant_matmul import _pallas_quant_dense_2d
    from asr_tpu.quant.quantize import embedding_logits, quantize_embedding
    from asr_tpu.runtime.artifact import flatten_pytree, unflatten_pytree

    rng = np.random.default_rng(7)
    v, d = 300, 256
    w = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32) * 0.05)
    y = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))

    emb = quantize_embedding(w, bits=4, block=128)
    assert emb.q_t_packed
    v_pad = -(-v // 2048) * 2048
    assert emb.q_t.shape == (d // 2, v_pad)
    assert emb.scale_t.shape == (d // 128, v_pad)
    dense_ref = np.asarray(y @ emb.dequant().T)

    got = np.asarray(embedding_logits(emb, y))  # XLA fallback on CPU
    assert got.shape == (2, v)
    np.testing.assert_allclose(got, dense_ref, rtol=1e-5, atol=1e-5)

    leaf = {"q": emb.q_t, "scale": emb.scale_t, "zero": emb.zero_t,
            "bits": 4, "block": 128, "packed": True}
    got_pl = _pallas_quant_dense_2d(y, leaf, interpret=True, mm="f32")
    assert got_pl is not None, "packed tied head fell back to XLA"
    np.testing.assert_allclose(np.asarray(got_pl)[:, :v], dense_ref,
                               rtol=2e-5, atol=2e-5)
    # padded columns have zero scale -> exactly-0 logits
    np.testing.assert_array_equal(np.asarray(got_pl)[:, v:], 0.0)

    back = unflatten_pytree(flatten_pytree({"embed": emb}))["embed"]
    assert back.q_t_packed
    np.testing.assert_array_equal(np.asarray(back.q_t), np.asarray(emb.q_t))
    np.testing.assert_array_equal(np.asarray(back.zero_t), np.asarray(emb.zero_t))


def test_pallas_bf16_mm_mode_within_quant_error():
    """Default kernel mode dequantizes to bf16 and runs one MXU pass:
    rounding must stay well below the quantization error itself (and the
    f32 mode must remain exact vs the XLA dequant reference)."""
    import jax.numpy as jnp
    from asr_tpu.ops.quant_matmul import _pallas_quant_dense_2d, _xla_quant_dense
    from asr_tpu.quant.quantize import quantize_linear

    rng = np.random.default_rng(11)
    k, n = 512, 256
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    for bits, pack in ((8, False), (4, True)):
        qleaf = quantize_linear(w, bits=bits, block=64 if not pack else 32, pack=pack)
        want = np.asarray(_xla_quant_dense(x, qleaf))
        got16 = np.asarray(_pallas_quant_dense_2d(x, qleaf, interpret=True, mm="bf16"))
        # bf16 rounding: relative error ~2^-8 per product, sqrt(K) growth.
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got16 - want).max() / scale < 5e-2
        got32 = np.asarray(_pallas_quant_dense_2d(x, qleaf, interpret=True, mm="f32"))
        np.testing.assert_allclose(got32, want, rtol=2e-5, atol=2e-5)


def test_quantize_pytree_skips_depthwise_conv_kernels():
    """Depthwise conv kernels ({"dw": {"w": (K, C)}}) are consumed
    elementwise, not via dense(); quantize_pytree must leave them raw
    (regression: FireRed q8 crashed with 'attribute name must be string'
    when the dw kernel became a QuantizedLinear)."""
    import jax
    import jax.numpy as jnp
    from asr_tpu.models import firered as fr
    from asr_tpu.decode.ar import DecodeConfig
    from asr_tpu.quant.quantize import QuantizedLinear, quantize_pytree

    cfg = fr.FireRedConfig(d_model=64, enc_heads=4, enc_layers=1, dec_layers=1,
                           dec_heads=4, dec_ffn=96, vocab_size=100, conv_kernel=9)
    params = quantize_pytree(fr.init_params(cfg, jax.random.PRNGKey(0)),
                             bits=8, min_size=16)
    dw = params["enc_blocks"][0]["conv"]["dw"]["w"]
    assert isinstance(dw, jnp.ndarray) and not isinstance(dw, QuantizedLinear)
    # and a real matmul weight DID quantize
    assert isinstance(params["enc_blocks"][0]["conv"]["pw1"]["w"], QuantizedLinear)
    audio = jnp.asarray((np.random.default_rng(0).standard_normal((1, 8000)) * 2000)
                        .astype(np.float32))
    out = fr.transcribe(params, cfg, audio, jnp.asarray([8000], jnp.int32),
                        DecodeConfig(max_new_tokens=3, eot_id=-1))
    assert jax.tree.leaves(out)
