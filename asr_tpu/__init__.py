"""asr_tpu — TPU-native multi-family ASR framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of
DakeQQ/Automatic-Speech-Recognition-ASR-ONNX as an idiomatic TPU stack:

- ``asr_tpu.frontend``  — in-graph audio DSP (Kaldi fbank, Whisper STFT-mel,
  LFR, CMVN) expressed as MXU matmuls / Pallas kernels.
- ``asr_tpu.layers``    — encoder/decoder building blocks (SANM, Conformer,
  E-Branchformer, Zipformer, GQA+RoPE decoder layers, LSTM).
- ``asr_tpu.decode``    — on-device decode loops (CTC collapse, AR
  greedy/penalty/sampling with KV cache, CIF, TDT, RNN-T) as
  ``lax.scan`` / ``lax.while_loop`` programs with fixed shapes.
- ``asr_tpu.models``    — the 12 model families.
- ``asr_tpu.loaders``   — checkpoint ingestion (safetensors/HF/FunASR/...)
  directly into JAX pytrees (replaces the reference's Export+Optimize ONNX
  pipeline entirely).
- ``asr_tpu.runtime``   — audio ingest, tokenizers, metadata contract,
  sessions, sliding windows, RTF reporting.
- ``asr_tpu.parallel``  — ``jax.sharding`` meshes (batch-DP / TP) for
  multi-chip serving and training.
- ``asr_tpu.ops``       — Pallas TPU kernels for the hot paths.
- ``asr_tpu.quant``     — int8/int4 weight-only quantization with fused
  dequant matmuls.

The reference's five layers (SURVEY.md §1) map as: L1 -> frontend/ops,
L2 -> models+layers, L3+L4 (ONNX graph surgery + quantization) collapse into
"load checkpoint into one pytree and let XLA fuse" plus quant/,
L5 -> runtime+decode.
"""

__version__ = "0.1.0"
