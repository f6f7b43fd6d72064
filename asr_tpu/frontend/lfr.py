"""Low-Frame-Rate (LFR) stacking and CMVN.

FunASR-style LFR: stack ``m`` consecutive frames every ``n`` frames, with
clamped indices at both boundaries (reference
``SenseVoice/Export_SenseVoice.py:162-169,279-283``: a precomputed index
table clamped to ``[0, valid_frames - 1]``). The dynamic upper clamp makes
the padded fixed-shape output *identical in the valid region* to a
variable-length run — edge frames replicate the last valid frame exactly
like the reference's ONNX ``Min(indices, num_frames - 1)``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def lfr_out_len(frames: int, lfr_n: int) -> int:
    return (frames + lfr_n - 1) // lfr_n


@functools.lru_cache(maxsize=16)
def _lfr_index_table(t_lfr: int, lfr_m: int, lfr_n: int) -> np.ndarray:
    base = np.arange(0, t_lfr * lfr_n, lfr_n, dtype=np.int32)[:, None]
    offs = np.arange(lfr_m, dtype=np.int32)[None, :] - (lfr_m - 1) // 2
    return np.maximum(base + offs, 0)


def lfr_stack(
    feats: jnp.ndarray, lfr_m: int, lfr_n: int, valid_frames: jnp.ndarray | int | None = None
) -> jnp.ndarray:
    """Stack LFR frames.

    Args:
      feats: ``(..., T, n_mels)``.
      lfr_m: window of frames stacked per output step (odd, e.g. 7).
      lfr_n: hop in input frames (e.g. 6).
      valid_frames: dynamic number of valid input frames (scalar or
        ``(batch,)``); indices are clamped to ``valid_frames - 1``.

    Returns:
      ``(..., ceil(T / lfr_n), n_mels * lfr_m)``.
    """
    t = feats.shape[-2]
    t_lfr = lfr_out_len(t, lfr_n)
    table = jnp.asarray(_lfr_index_table(t_lfr, lfr_m, lfr_n))  # (t_lfr, lfr_m)
    if valid_frames is None:
        idx = jnp.minimum(table, t - 1)
        stacked = jnp.take(feats, idx.reshape(-1), axis=-2)
    else:
        valid = jnp.asarray(valid_frames, dtype=jnp.int32)
        if valid.ndim == 0:
            idx = jnp.minimum(table, valid - 1)
            stacked = jnp.take(feats, idx.reshape(-1), axis=-2)
        else:
            # Per-batch clamp: (B, t_lfr * lfr_m) indices into (B, T, n_mels).
            idx = jnp.minimum(table[None], valid[:, None, None] - 1)
            stacked = jnp.take_along_axis(
                feats, idx.reshape(idx.shape[0], -1)[..., None], axis=-2
            )
    return stacked.reshape(feats.shape[:-2] + (t_lfr, feats.shape[-1] * lfr_m))


def apply_cmvn_addmul(feats: jnp.ndarray, means: jnp.ndarray, istd: jnp.ndarray) -> jnp.ndarray:
    """FunASR CMVN: ``(x + means) * istd`` — means are negated means, istd is
    inverse stddev, exactly the checkpoint's stored layout (reference
    ``SenseVoice/Export_SenseVoice.py:285``)."""
    return (feats + means) * istd
