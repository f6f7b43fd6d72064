"""Training: CTC fine-tuning step for SenseVoice-style encoders.

The reference toolkit has no training (SURVEY.md §0); this extends the
framework to fine-tuning so the multi-chip story (dp × tp over an ICI
mesh) is exercised end-to-end. Loss: CTC (optax), computed from the same
``encode_logits`` path inference uses, so padded-batch masking semantics
are shared.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from asr_tpu.models import sensevoice as sv


def ctc_loss_from_logits(
    logits: jnp.ndarray,
    valid_seq: jnp.ndarray,
    labels: jnp.ndarray,
    label_valid: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    t = logits.shape[1]
    n = labels.shape[1]
    logit_paddings = (jnp.arange(t)[None, :] >= valid_seq[:, None]).astype(jnp.float32)
    label_paddings = (jnp.arange(n)[None, :] >= label_valid[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings, blank_id=blank_id)
    return jnp.mean(per_seq)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"))
def train_step(
    params: Any,
    opt_state: Any,
    cfg: sv.SenseVoiceConfig,
    optimizer,
    audio: jnp.ndarray,
    valid_samples: jnp.ndarray,
    language_idx: jnp.ndarray,
    labels: jnp.ndarray,
    label_valid: jnp.ndarray,
):
    """One dp×tp-shardable CTC training step. Shapes are fixed; sharding
    comes from the placement of ``params`` and the batch inputs."""

    def loss_fn(p):
        logits, valid_seq = sv.encode_logits(p, cfg, audio, valid_samples, language_idx)
        return ctc_loss_from_logits(
            logits.astype(jnp.float32), valid_seq, labels, label_valid, cfg.blank_id
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
