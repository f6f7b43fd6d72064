"""RNN-T (transducer) loss as a diagonal-wavefront lax.scan.

The reference has no training path (SURVEY.md §5: "no training
checkpoints"); this framework adds transducer training so the RNN-T /
TDT families (Parakeet, Nemotron, X-ASR) can be fine-tuned on TPU. The
forward-variable recursion

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + label[t, u-1])

is evaluated along anti-diagonals (t + u = const): every cell on a
diagonal depends only on the previous diagonal, so one ``lax.scan`` of
T+U steps updates whole (B, T, U+1) slabs with pure elementwise VPU work —
no per-cell host loop, static shapes, batch-friendly. Gradients flow
through the scan via autodiff with ``jax.checkpoint`` on the step to keep
the saved-residual footprint at O(T+U) masks instead of per-op.

Loss = -log P(labels | enc) = -(alpha[T-1, U] + blank[T-1, U]) gathered at
each sample's (T_valid, U_valid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=())
def rnnt_loss(
    log_probs: jnp.ndarray,   # (B, T, U+1, V) joint log-softmax
    labels: jnp.ndarray,      # (B, U) int32
    t_valid: jnp.ndarray,     # (B,) frames per sample
    u_valid: jnp.ndarray,     # (B,) label counts per sample
    blank_id: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Per-sample negative log-likelihood (B,)."""
    b, t_max, u1, _ = log_probs.shape
    u_max = u1 - 1

    blank_lp = log_probs[..., blank_id]                       # (B, T, U+1)
    # label_lp[b, t, u] = log_prob of emitting labels[b, u] at (t, u)
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :u_max, :], labels[:, None, :, None], axis=3
    )[..., 0]                                                  # (B, T, U)

    # Mask emissions outside each sample's valid lattice so paths cannot
    # escape through padding.
    t_ids = jnp.arange(t_max)[None, :, None]
    u_ids = jnp.arange(u1)[None, None, :]
    blank_lp = jnp.where((t_ids < t_valid[:, None, None]) & (u_ids <= u_valid[:, None, None]),
                         blank_lp, NEG_INF)
    label_lp = jnp.where((t_ids < t_valid[:, None, None])
                         & (u_ids[:, :, :u_max] < u_valid[:, None, None]),
                         label_lp, NEG_INF)

    alpha0 = jnp.full((b, t_max, u1), NEG_INF)
    alpha0 = alpha0.at[:, 0, 0].set(0.0)

    diag_t = jnp.arange(t_max)[None, :, None]
    diag_u = jnp.arange(u1)[None, None, :]

    @jax.checkpoint
    def step(alpha, d):
        # from above: arrived by emitting blank at (t-1, u)
        from_t = jnp.pad(alpha[:, :-1, :] + blank_lp[:, :-1, :],
                         ((0, 0), (1, 0), (0, 0)), constant_values=NEG_INF)
        # from left: arrived by emitting label u-1 at (t, u-1)
        from_u = jnp.pad(alpha[:, :, :-1] + label_lp,
                         ((0, 0), (0, 0), (1, 0)), constant_values=NEG_INF)
        new = jnp.logaddexp(from_t, from_u)
        on_diag = (diag_t + diag_u) == d
        return jnp.where(on_diag, new, alpha), None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max + u1))

    # Total log-prob: final blank emitted from (T_valid-1, U_valid).
    tv = jnp.clip(t_valid - 1, 0, t_max - 1)
    uv = jnp.clip(u_valid, 0, u_max)
    gather = lambda m: m[jnp.arange(b), tv, uv]
    ll = gather(alpha) + gather(blank_lp)
    return -ll


def rnnt_loss_from_logits(logits, labels, t_valid, u_valid, blank_id=0):
    """Convenience: joint LOGITS (B, T, U+1, V) -> mean loss (scalar)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(rnnt_loss(lp, labels, t_valid, u_valid, blank_id))
