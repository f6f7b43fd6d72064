"""Streaming sessions: chunked transcription with device-resident state.

Runtime parity with the reference streaming drivers (SURVEY.md §3.5):
fixed-size audio chunks, cache pytrees carried across jitted steps, the
decoder invoked only when the predictor fired, RMS-matched white-noise
final padding (reference ``Inference_Paraformer_Streaming_ONNX.py:352-362``)
and per-chunk RTF reporting.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from asr_tpu.runtime import audio as audio_io
from asr_tpu.runtime.session import TranscribeResult
from asr_tpu.streaming import paraformer_online as po


class ParaformerStreamingSession:
    def __init__(self, params, cfg: po.ParaformerStreamConfig, tokenizer=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.reset()

    def reset(self) -> None:
        self.state = po.init_state(self.cfg, self.params)
        self.token_ids: list[int] = []
        self.elapsed = 0.0
        self.audio_samples = 0

    def push_chunk(self, chunk: np.ndarray) -> list[int]:
        """Feed one fixed-size chunk; returns newly decoded token ids."""
        assert len(chunk) == self.cfg.chunk_samples, "fixed-size chunks required"
        t0 = time.perf_counter()
        self.state, fired, count, enc_out = po.encoder_step(
            self.params, self.cfg, self.state, jnp.asarray(chunk, jnp.float32)[None]
        )
        n_fired = int(count)  # the reference's single scalar host read per chunk
        new_ids: list[int] = []
        if n_fired > 0:
            self.state, ids, _ = po.decoder_step(
                self.params, self.cfg, self.state, enc_out, fired, count
            )
            new_ids = [int(t) for t in np.asarray(ids)[0, :n_fired]]
            self.token_ids.extend(new_ids)
        self.elapsed += time.perf_counter() - t0
        self.audio_samples += len(chunk)
        return new_ids

    def transcribe(self, audio: np.ndarray | str | Path) -> TranscribeResult:
        if isinstance(audio, (str, Path)):
            audio = audio_io.load_audio(audio, self.cfg.base.sample_rate)
        audio = np.asarray(audio, np.float32)
        self.reset()
        w = self.cfg.chunk_samples
        n = len(audio)
        num_chunks = -(-n // w)
        rng = np.random.default_rng(0)
        for i in range(num_chunks):
            chunk = audio[i * w : (i + 1) * w]
            if len(chunk) < w:
                # RMS-matched white-noise pad (reference: zero padding biases
                # the CIF tail; matched noise keeps the fbank energy profile).
                rms = float(np.sqrt(np.mean(np.square(chunk)))) if len(chunk) else 1.0
                pad = (rng.standard_normal(w - len(chunk)) * max(rms, 1e-3)).astype(np.float32)
                chunk = np.concatenate([chunk, pad])
            self.push_chunk(chunk)
        text = self.tokenizer.decode(self.token_ids) if self.tokenizer else ""
        return TranscribeResult(
            text=text,
            token_ids=list(self.token_ids),
            audio_seconds=n / self.cfg.base.sample_rate,
            elapsed_seconds=self.elapsed,
        )


def snip_edges_false_pad(waveform: np.ndarray, win_length: int, hop_length: int) -> np.ndarray:
    """Reflection-pad so snip_edges=True framing of the padded signal equals
    Kaldi ``snip_edges=False`` fbank of the original (reference
    ``Inference_X_ASR_ONNX.py:204-217``)."""
    pad = win_length // 2 - hop_length // 2
    rev = waveform[::-1]
    if pad > 0:
        return np.concatenate([rev[-pad:], waveform, rev])
    return np.concatenate([waveform[-pad:], rev])


class XasrStreamingSession:
    """X-ASR Zipformer2 chunked transcription (reference
    ``Inference_X_ASR_ONNX.py:399-433``): snip_edges=False padding, 0.3 s
    tail padding, fixed windows, per-chunk greedy transducer."""

    def __init__(self, params, cfg, tokenizer=None):
        from asr_tpu.models import zipformer as zf

        self.zf = zf
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.reset()

    def reset(self) -> None:
        self.state = self.zf.init_state(self.cfg)
        self.token_ids: list[int] = []
        self.elapsed = 0.0

    def transcribe(self, audio: np.ndarray | str | Path) -> TranscribeResult:
        cfg = self.cfg
        if isinstance(audio, (str, Path)):
            audio = audio_io.load_audio(audio, cfg.fbank.sample_rate)
        audio = np.asarray(audio, np.float32)
        n_orig = len(audio)
        fb = cfg.fbank
        padded = snip_edges_false_pad(audio, fb.win_length, fb.hop_length)
        padded = np.concatenate([padded, np.zeros(int(0.3 * fb.sample_rate), np.float32)])
        self.reset()
        w, adv = cfg.window_samples, cfg.advance_samples
        pos = 0
        while pos + w <= len(padded) or pos == 0:
            window = np.zeros(w, np.float32)
            chunk = padded[pos : pos + w]
            window[: len(chunk)] = chunk
            t0 = time.perf_counter()
            self.state, ids, count = self.zf.transcribe_chunk(
                self.params, cfg, self.state, jnp.asarray(window)
            )
            jax.block_until_ready(ids)
            self.elapsed += time.perf_counter() - t0
            self.token_ids.extend(int(t) for t in np.asarray(ids)[: int(count)])
            pos += adv
        text = self.tokenizer.decode(self.token_ids) if self.tokenizer else ""
        return TranscribeResult(
            text=text,
            token_ids=list(self.token_ids),
            audio_seconds=n_orig / fb.sample_rate,
            elapsed_seconds=self.elapsed,
        )
