"""Token-and-Duration Transducer (TDT) greedy decode, batched on device.

Reference semantics (``Parakeet/Export_Parakeet_ASR.py:496-517`` +
``Inference_Parakeet_ASR_ONNX.py:272-291``): each joint step at the current
encoder frame emits (token, duration); blank keeps the predictor state and
token, duration advances the frame pointer (forced >= 1 on blank to
guarantee progress); non-blank updates the state and may predict duration 0
(emit several tokens per frame), bounded by ``max_symbols_per_step *
n_frames`` total steps. The reference runs this loop in Python with one ORT
launch per step; here it is one ``lax.while_loop`` with per-sample frame
pointers, so a padded batch decodes in a single device call.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def tdt_greedy(
    joint_step: Callable,
    enc: jnp.ndarray,
    enc_valid: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
    start_token: int,
    blank_id: int,
    durations: tuple[int, ...],
    max_tokens: int,
    max_symbols_per_step: int = 10,
    eos_id: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched TDT greedy loop.

    Args:
      joint_step: ``(token (B,), h, c, enc_frame (B, D)) ->
        (token_logits (B, V), dur_logits (B, ND), h', c')``.
      enc: ``(B, T, D)`` projected encoder frames.
      enc_valid: ``(B,)`` valid frame counts.
      h0/c0: initial predictor state ``(L, B, H)``.
      start_token: SOS convention (Parakeet uses blank_id as start token).

    Returns (tokens ``(B, max_tokens)``, counts ``(B,)``).
    """
    b, t, _ = enc.shape
    dur_table = jnp.asarray(durations, jnp.int32)
    max_steps = max_symbols_per_step * t

    init = (
        jnp.zeros((b,), jnp.int32),                        # frame_idx
        jnp.full((b,), start_token, jnp.int32),            # token
        h0,
        c0,
        jnp.zeros((b, max_tokens + 1), jnp.int32),         # buf (+overflow slot)
        jnp.zeros((b,), jnp.int32),                        # count
        jnp.zeros((b,), bool),                             # done
        jnp.asarray(0, jnp.int32),                         # steps
    )

    def cond(carry):
        *_, done, steps = carry
        return (~jnp.all(done)) & (steps < max_steps)

    def body(carry):
        frame_idx, token, h, c, buf, count, done, steps = carry
        safe_idx = jnp.clip(frame_idx, 0, t - 1)
        enc_frame = jnp.take_along_axis(enc, safe_idx[:, None, None], axis=1)[:, 0]
        tok_logits, dur_logits, h2, c2 = joint_step(token, h, c, enc_frame)
        tok = jnp.argmax(tok_logits, axis=-1).astype(jnp.int32)
        dur = dur_table[jnp.argmax(dur_logits, axis=-1)]
        is_blank = tok == blank_id
        hit_eos = (tok == eos_id) if eos_id is not None else jnp.zeros((b,), bool)
        emit = (~is_blank) & (~hit_eos) & (~done)
        dest = jnp.where(emit, count, max_tokens)
        buf = buf.at[jnp.arange(b), dest].set(tok, mode="drop")
        count = count + emit.astype(jnp.int32)
        keep_state = is_blank | done
        token = jnp.where(keep_state | hit_eos, token, tok)
        h = jnp.where(keep_state[None, :, None], h, h2)
        c = jnp.where(keep_state[None, :, None], c, c2)
        dur = jnp.where(is_blank & (dur == 0), 1, dur)
        frame_idx = frame_idx + jnp.where(done, 0, dur)
        done = done | (frame_idx >= enc_valid) | (count >= max_tokens) | hit_eos
        return (frame_idx, token, h, c, buf, count, done, steps + 1)

    *_, buf, count, _, _ = jax.lax.while_loop(cond, body, init)
    return buf[:, :max_tokens], count
