"""RNN-T greedy decode (batched, on device).

Reference semantics (``Nemotron/Export_Nemotron_ASR.py:833-867`` +
``Inference_Nemotron_ASR_ONNX.py:300-317``): at each encoder frame the
joint may emit up to ``max_symbols_per_frame`` non-blank tokens (predictor
state advances per emission); a blank — or hitting the cap — moves to the
next frame with state kept. One ``lax.while_loop`` with per-sample frame
pointers replaces the reference's per-step ORT launches.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def rnnt_greedy(
    joint_step: Callable,
    enc: jnp.ndarray,
    enc_valid: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
    start_token: int,
    blank_id: int,
    max_tokens: int,
    max_symbols_per_frame: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched RNN-T greedy loop. Same interface as ``tdt_greedy`` minus
    durations; ``joint_step`` returns ``(logits (B, V+1), h', c')``."""
    b, t, _ = enc.shape
    max_steps = (max_symbols_per_frame + 1) * t

    init = (
        jnp.zeros((b,), jnp.int32),              # frame_idx
        jnp.zeros((b,), jnp.int32),              # symbols emitted in current frame
        jnp.full((b,), start_token, jnp.int32),  # token
        h0,
        c0,
        jnp.zeros((b, max_tokens + 1), jnp.int32),
        jnp.zeros((b,), jnp.int32),              # count
        jnp.zeros((b,), bool),                   # done
        jnp.asarray(0, jnp.int32),
    )

    def cond(carry):
        *_, done, steps = carry
        return (~jnp.all(done)) & (steps < max_steps)

    def body(carry):
        frame_idx, nsym, token, h, c, buf, count, done, steps = carry
        safe_idx = jnp.clip(frame_idx, 0, t - 1)
        enc_frame = jnp.take_along_axis(enc, safe_idx[:, None, None], axis=1)[:, 0]
        logits, h2, c2 = joint_step(token, h, c, enc_frame)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        is_blank = tok == blank_id
        emit = (~is_blank) & (~done) & (nsym < max_symbols_per_frame)
        dest = jnp.where(emit, count, max_tokens)
        buf = buf.at[jnp.arange(b), dest].set(tok, mode="drop")
        count = count + emit.astype(jnp.int32)
        token = jnp.where(emit, tok, token)
        h = jnp.where(emit[None, :, None], h2, h)
        c = jnp.where(emit[None, :, None], c2, c)
        advance = (is_blank | (nsym >= max_symbols_per_frame)) & ~done
        frame_idx = frame_idx + advance.astype(jnp.int32)
        nsym = jnp.where(advance, 0, nsym + emit.astype(jnp.int32))
        done = done | (frame_idx >= enc_valid) | (count >= max_tokens)
        return (frame_idx, nsym, token, h, c, buf, count, done, steps + 1)

    *_, buf, count, _, _ = jax.lax.while_loop(cond, body, init)
    return buf[:, :max_tokens], count
