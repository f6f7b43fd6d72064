"""Stage-activation probes for the parity harness (``asr_tpu parity``).

When the BASELINE token-for-token gate finally runs against real
checkpoints (BASELINE.md), a transcript mismatch alone does not say WHERE
the drift is.  These probes snapshot the pipeline stage-by-stage for the
FIRST window of each fixture — front-end features, encoder output, and
first-decode-step logits — alongside the golden transcripts.  On compare,
the first drifting stage localizes a mismatch to front-end vs encoder vs
decode without a manual bisect.  The reference debugs the same split by
running its per-stage ONNX graphs individually and printing intermediates
(e.g. the separate encoder/decoder sessions of
``Whisper/Inference_Whisper_ONNX.py`` and the post-export self-test of
``SenseVoice/Export_SenseVoice.py:424-433``).

Snapshots are compact (shape + mean/std + the first ``head`` flattened
values) so goldens stay reviewable JSON; comparisons are rtol-based — the
parity harness forces the kernels' bit-exact f32 mode, so the only drift a
healthy run sees is cross-platform libm noise, well under the default
rtol.
"""

from __future__ import annotations

import numpy as np

# Compare (and report) stages in pipeline order: the FIRST drifting stage
# is the localization.
STAGE_ORDER = ("frontend", "encoder", "logits")


def summarize(arr, head: int = 48) -> dict:
    """Compact JSON-able snapshot of one activation tensor."""
    a = np.asarray(arr, np.float32)
    flat = a.reshape(-1)
    return {
        "shape": [int(s) for s in a.shape],
        "mean": float(flat.mean()) if flat.size else 0.0,
        "std": float(flat.std()) if flat.size else 0.0,
        "head": [float(x) for x in flat[:head]],
    }


def _drift(got: dict, want: dict, rtol: float, atol: float) -> str | None:
    if list(got["shape"]) != list(want["shape"]):
        return f"shape {got['shape']} != {want['shape']}"
    g = np.asarray(got["head"], np.float64)
    w = np.asarray(want["head"], np.float64)
    n = min(len(g), len(w))
    scale = max(abs(want["mean"]) + want["std"], 1e-6)
    if not np.allclose(g[:n], w[:n], rtol=rtol, atol=atol * scale):
        i = int(np.argmax(np.abs(g[:n] - w[:n])))
        return f"head[{i}] {g[i]:.6g} != {w[i]:.6g}"
    for k in ("mean", "std"):
        if not np.isclose(got[k], want[k], rtol=rtol, atol=atol * scale):
            return f"{k} {got[k]:.6g} != {want[k]:.6g}"
    return None


def compare_probes(got: dict | None, want: dict | None,
                   rtol: float = 2e-3, atol: float = 1e-4) -> list[str]:
    """Ordered stage comparison -> list of drift messages (empty = clean).

    Only the FIRST drifting stage is reported — downstream stages drift as
    a consequence and would bury the signal.
    """
    if not want:
        return []
    if not got:
        return ["probe missing from run (family has no probe support?)"]
    for stage in STAGE_ORDER:
        if stage not in want:
            continue
        if stage not in got:
            return [f"stage {stage!r} missing from run"]
        msg = _drift(got[stage], want[stage], rtol, atol)
        if msg is not None:
            return [f"first drift at stage {stage!r}: {msg}"]
    return []


# ── per-family capture ────────────────────────────────────────────────────


def _first_window(sess, audio, pcm_scale: float):
    from asr_tpu.runtime import audio as audio_io

    if isinstance(audio, (str, bytes)) or hasattr(audio, "__fspath__"):
        audio = audio_io.load_audio(audio, getattr(sess, "sample_rate", 16000),
                                    pcm_scale=pcm_scale)
    audio = np.asarray(audio, np.float32)
    w = sess.window_samples
    buf = np.zeros((1, w), np.float32)
    n = min(len(audio), w)
    buf[0, :n] = audio[:n]
    return buf, n


def _probe_sensevoice(sess, audio) -> dict:
    import jax.numpy as jnp

    from asr_tpu.frontend.kaldi_fbank import log_mel_fbank
    from asr_tpu.models import sensevoice as sv

    buf, n = _first_window(sess, audio, sess.pcm_scale)
    cfg = sess.cfg
    fb = cfg.fbank
    mel = log_mel_fbank(jnp.asarray(buf), fb, fb.num_frames(buf.shape[-1]))
    logits, valid_seq = sv.encode_logits(
        sess.params, cfg, jnp.asarray(buf), jnp.asarray([n], np.int32),
        jnp.asarray([0], np.int32))
    t = int(np.asarray(valid_seq)[0])
    return {"frontend": summarize(mel[0, : max(t, 1)]),
            "logits": summarize(np.asarray(logits)[0, : max(t, 1)])}


def _probe_firered(sess, audio) -> dict:
    import jax.numpy as jnp

    from asr_tpu.frontend.kaldi_fbank import log_mel_fbank
    from asr_tpu.layers.attention import NEG_INF, length_mask
    from asr_tpu.models import firered as fr

    buf, n = _first_window(sess, audio, sess.pcm_scale)
    cfg = sess.cfg
    fb = cfg.fbank
    mel = log_mel_fbank(jnp.asarray(buf), fb, fb.num_frames(buf.shape[-1]))
    enc, enc_valid = fr.encode(sess.params, cfg, jnp.asarray(buf),
                               jnp.asarray([n], np.int32))
    t = int(np.asarray(enc_valid)[0])
    cross_bias = jnp.where(length_mask(enc_valid, enc.shape[1]), 0.0,
                           NEG_INF)[:, None, None, :].astype(jnp.float32)
    state = fr.make_state(sess.params, cfg, enc)
    prompt = jnp.full((1, 1), cfg.sos_id, jnp.int32)
    logits, _ = fr._decoder_pass(sess.params, cfg, state, prompt,
                                 jnp.asarray(0, jnp.int32), cross_bias)
    return {"frontend": summarize(mel[0]),
            "encoder": summarize(np.asarray(enc)[0, : max(t, 1)]),
            "logits": summarize(np.asarray(logits)[0, -1])}


def _probe_whisper(sess, audio) -> dict:
    import jax.numpy as jnp

    from asr_tpu.models import whisper as wh

    buf, _n = _first_window(sess, audio, 1.0)
    cfg = sess.cfg
    mel = wh.mel_for_audio(cfg, jnp.asarray(buf))
    enc = wh.encode(sess.params, cfg, mel)
    state = wh.make_state(sess.params, cfg, enc)
    prompt = jnp.full((1, 1), cfg.sot_id, jnp.int32)
    logits, _state = wh.prefill(sess.params, cfg, state, prompt)
    return {"frontend": summarize(mel[0]),
            "encoder": summarize(np.asarray(enc)[0]),
            "logits": summarize(np.asarray(logits)[0, -1])}


_PROBES = {
    "SenseVoiceSession": _probe_sensevoice,
    "FireRedSession": _probe_firered,
    "WhisperSession": _probe_whisper,
}


def capture_probe(sess, audio) -> dict | None:
    """First-window stage snapshots for ``sess``, or None when the family
    has no probe hook (the golden then carries transcripts only)."""
    fn = _PROBES.get(type(sess).__name__)
    if fn is None:
        return None
    out = fn(sess, audio)
    return {k: out[k] for k in STAGE_ORDER if k in out}
