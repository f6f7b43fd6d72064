"""Logit-processing decode strategies (on-device, fixed shape).

Mirrors the reference's decode-strategy micro-graphs (SURVEY.md §2.4,
reference ``Whisper/Export_Whisper.py:228-331``): token suppression,
begin-suppression, sliding-window repetition penalty, and
penalty -> temperature -> top-k -> top-p -> Gumbel sampling. Here they are
plain functions composed inside the jitted decode loop instead of separate
ONNX graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def suppress_tokens(logits: jnp.ndarray, ids) -> jnp.ndarray:
    """Hard-mask token ids (Whisper suppress list)."""
    if ids is None or len(ids) == 0:
        return logits
    return logits.at[..., jnp.asarray(list(ids), jnp.int32)].set(NEG_INF)


def apply_repetition_penalty(
    logits: jnp.ndarray,
    history: jnp.ndarray,
    hist_len: jnp.ndarray,
    penalty: float,
    penalty_range: int,
    hist_start: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Penalize ids seen in the last ``penalty_range`` generated tokens.

    Reference semantics (``Whisper/Export_Whisper.py:318-331``): for each
    id in the window, ``logit = logit * penalty if logit < 0 else
    logit / penalty``. The reference's ``save_id`` history holds ONLY
    generated ids (it starts empty) — ``hist_start`` excludes the prompt
    slots of our combined buffer so semantics match (and embed-prompt
    models whose buffer slots are zeros don't phantom-penalize id 0).

    Args:
      logits: ``(B, V)``.
      history: ``(B, H)`` full token buffer (prompt + generated).
      hist_len: ``(B,)`` or scalar number of valid tokens in ``history``.
      hist_start: first penalizable slot (the prompt length).
    """
    b, v = logits.shape
    h = history.shape[1]
    idx = jnp.arange(h, dtype=jnp.int32)[None, :]
    hist_len = jnp.broadcast_to(jnp.asarray(hist_len, jnp.int32), (b,))[:, None]
    start = jnp.broadcast_to(jnp.asarray(hist_start, jnp.int32), (b,))[:, None]
    in_window = (idx < hist_len) & (idx >= hist_len - penalty_range) & (idx >= start)
    # Scatter window membership into vocab space.
    marks = jnp.zeros((b, v), bool)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    safe_ids = jnp.where(in_window, history, v)  # out-of-window -> dropped slot
    marks = marks.at[bidx, safe_ids].set(True, mode="drop")
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(marks, penalized, logits)


def top_k_top_p_sample(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Temperature -> top-k -> top-p (nucleus) -> Gumbel-argmax sampling.

    Matches the reference's sampling graph ordering
    (``Whisper/Export_Whisper.py:263-307``). ``top_k <= 0`` disables top-k;
    ``top_p >= 1`` disables nucleus.
    Returns ``(B,)`` int32 sampled ids.
    """
    x = logits.astype(jnp.float32)
    if temperature != 1.0:
        x = x / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(x, top_k)[0][..., -1:]
        x = jnp.where(x < kth, NEG_INF, x)
    if top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens whose cumulative prob (exclusive) < top_p.
        keep_sorted = (cum - probs) < top_p
        cutoff = jnp.min(jnp.where(keep_sorted, sorted_x, jnp.inf), axis=-1, keepdims=True)
        x = jnp.where(x < cutoff, NEG_INF, x)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, x.shape, jnp.float32, 1e-20, 1.0)))
    return jnp.argmax(x + gumbel, axis=-1).astype(jnp.int32)
