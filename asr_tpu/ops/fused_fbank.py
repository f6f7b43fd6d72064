"""Fused Pallas log-mel front-end: audio -> log-mel in one kernel.

The XLA path (``asr_tpu.frontend.kaldi_fbank``) materializes the framed
signal and the (T, 2*n_bins) spectrum in HBM between matmuls. This kernel
keeps the whole pipeline in VMEM per frame-tile: DMA the overlapping audio
span from HBM, build frames with shifted slices, run the folded-DFT matmul
on the MXU, square/sum the complex halves, apply the mel matmul and the
log floor — one HBM read of audio, one HBM write of (T, n_mels).

Covers SURVEY.md §7.1 ("the single most-shared component"); the same
grid/DMA structure serves all four front-end conventions since they differ
only in basis/mel constants and the log epilogue.

Measured on TPU v5e (batch 8 x 8 s): matches the XLA path to 1e-5 at
HIGHEST precision but is not faster (854us vs 733us — XLA already fuses
this chain well and both are dispatch-bound at this size), so the XLA path
remains the default; this kernel is the opt-in building block for deeper
fusions (e.g. fbank+LFR+CMVN in one pass).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_tpu.frontend.kaldi_fbank import KaldiFbankConfig, _kaldi_constants


LANE = 256  # hop blocks zero-padded to this lane width (128-aligned)


def _kernel(audio_hbm, basis_ref, mel_ref, out_ref, scratch, sem, *,
            tile_frames: int, hop: int, k_blocks: int, log_eps: float):
    b = pl.program_id(0)
    ft = pl.program_id(1)
    # DMA span rounded up to a sublane multiple (Mosaic requires 8-aligned
    # slice lengths); the caller pads the block view accordingly.
    span_rows = -(-(tile_frames - 1 + k_blocks) // 8) * 8
    copy = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(ft * tile_frames, span_rows), :],
        scratch, sem,
    )
    copy.start()
    copy.wait()
    # Frame matmul decomposed over hop-block shifts (Mosaic cannot concat
    # sublane-offset slices): spec = sum_i blocks[i : i+TF] @ basis_chunk_i,
    # where blocks are LANE-padded and basis chunks carry matching zero rows.
    blocks = scratch[:]
    hi = jax.lax.Precision.HIGHEST  # match the f32 XLA path bit-for-bit-ish
    spec = jnp.dot(
        blocks[0:tile_frames, :], basis_ref[pl.ds(0, LANE), :],
        preferred_element_type=jnp.float32, precision=hi,
    )
    for i in range(1, k_blocks):
        spec += jnp.dot(
            blocks[i : i + tile_frames, :], basis_ref[pl.ds(i * LANE, LANE), :],
            preferred_element_type=jnp.float32, precision=hi,
        )
    n_bins = spec.shape[-1] // 2
    power = jnp.square(spec[:, :n_bins]) + jnp.square(spec[:, n_bins:])
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.log(jnp.maximum(mel, log_eps))


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames", "tile_frames", "interpret"))
def fused_log_mel_fbank(
    audio: jnp.ndarray,
    cfg: KaldiFbankConfig,
    n_frames: int,
    tile_frames: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Kaldi log-mel via the fused kernel. audio (B, S); returns
    (B, n_frames, n_mels). n_frames must be a multiple of tile_frames
    (pad the audio; callers use :func:`fused_frames_for`)."""
    assert n_frames % tile_frames == 0, (n_frames, tile_frames)
    basis_np, mel_np = _kaldi_constants(cfg)
    # Pad mel bank columns to a lane multiple (kernel output slices it off).
    n_mels = mel_np.shape[1]
    mel_pad = (-n_mels) % 128
    mel = jnp.asarray(np.pad(mel_np, ((0, 0), (0, mel_pad))))
    hop = cfg.hop_length
    k_blocks = math.ceil(cfg.win_length / hop)
    span = (tile_frames - 1 + k_blocks) * hop
    b, s = audio.shape
    span_rows = -(-(tile_frames - 1 + k_blocks) // 8) * 8
    need = (n_frames - tile_frames + span_rows) * hop
    if s < need:
        audio = jnp.pad(audio, ((0, 0), (0, need - s)))
    elif s > need:
        audio = audio[:, :need]
    # Hop-aligned 2-D block view, zero-padded to LANE columns (Mosaic needs
    # 128-aligned lane slices); basis chunks get matching zero rows.
    audio = audio.reshape(b, need // hop, hop)
    audio = jnp.pad(audio, ((0, 0), (0, 0), (0, LANE - hop)))
    basis_chunks = np.zeros((k_blocks * LANE, basis_np.shape[1]), np.float32)
    for i in range(k_blocks):
        rows = basis_np[i * hop : min((i + 1) * hop, basis_np.shape[0])]
        basis_chunks[i * LANE : i * LANE + rows.shape[0]] = rows
    basis = jnp.asarray(basis_chunks)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tile_frames=tile_frames, hop=hop, k_blocks=k_blocks,
            log_eps=float(np.finfo(np.float32).eps),
        ),
        grid=(b, n_frames // tile_frames),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # audio stays in HBM; kernel DMAs spans
            pl.BlockSpec(basis.shape, lambda b, f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel.shape, lambda b, f: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_frames, mel.shape[1]), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, mel.shape[1]), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span_rows, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio.astype(jnp.float32), basis, mel)
    return out[..., :n_mels]


def fused_frames_for(cfg: KaldiFbankConfig, num_samples: int, tile_frames: int = 256) -> int:
    """Padded frame count (multiple of tile_frames) covering the signal."""
    n = cfg.num_frames(num_samples)
    return -(-n // tile_frames) * tile_frames
