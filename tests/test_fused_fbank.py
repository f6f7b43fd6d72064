"""Fused Pallas fbank kernel vs the XLA front-end (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from asr_tpu.frontend.kaldi_fbank import KaldiFbankConfig, log_mel_fbank
from asr_tpu.ops.fused_fbank import fused_frames_for, fused_log_mel_fbank


def test_fused_fbank_matches_xla_path():
    cfg = KaldiFbankConfig()
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((2, 20000)) * 3000).astype(np.float32))
    tile = 64
    n = fused_frames_for(cfg, 20000, tile)
    ref = log_mel_fbank(jnp.pad(audio, ((0, 0), (0, (n - 1) * 160 + 400 - 20000))), cfg, n)
    out = fused_log_mel_fbank(audio, cfg, n, tile_frames=tile, interpret=True)
    assert out.shape == (2, n, 80)
    valid = cfg.num_frames(20000)
    np.testing.assert_allclose(np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
                               rtol=1e-4, atol=1e-4)


def test_fused_dispatch_env_gate(monkeypatch):
    """ASR_TPU_FUSED_FBANK=interpret routes log_mel_fbank through the Pallas
    kernel transparently, matching the XLA path on the valid frames."""
    cfg = KaldiFbankConfig()
    rng = np.random.default_rng(1)
    audio = jnp.asarray((rng.standard_normal((2, 20000)) * 3000).astype(np.float32))
    n = cfg.num_frames(20000)
    ref = np.asarray(log_mel_fbank(audio, cfg, n))
    monkeypatch.setenv("ASR_TPU_FUSED_FBANK", "interpret")
    out = np.asarray(log_mel_fbank(audio, cfg, n))
    monkeypatch.delenv("ASR_TPU_FUSED_FBANK")
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
