"""Qwen3-ASR session: prompt assembly + context/hot-word support.

Runtime parity with reference ``Qwen_ASR/Inference_Qwen_ASR_ONNX.py``: the
chat-style prompt [system/head | user context text | suffix | audio |
tail] is tokenized on host (hot words / context biasing go into the user
text, ``:106-127``), the audio window is padded to the tower's
chunk-window multiple, and one device call runs probe-free
prefill+decode (Qwen has no language probe — language comes from the
context prompt or the model itself).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from asr_tpu.decode.ar import DecodeConfig
from asr_tpu.models import qwen_asr as qa
from asr_tpu.runtime import audio as audio_io
from asr_tpu.runtime.session import TranscribeResult


@dataclasses.dataclass
class QwenPromptTemplate:
    """Token-id templates around the audio (loader fills from the chat
    template / special tokens of the checkpoint)."""

    head_ids: tuple[int, ...] = ()      # e.g. <|im_start|>system...<|im_start|>user
    suffix_ids: tuple[int, ...] = ()    # between context text and audio
    tail_ids: tuple[int, ...] = ()      # e.g. <|im_end|><|im_start|>assistant


class QwenAsrSession:
    def __init__(
        self,
        tower_params,
        llm_params,
        cfg: qa.QwenAsrConfig,
        tokenizer=None,
        template: QwenPromptTemplate | None = None,
        max_new_tokens: int = 256,
        strategy: str = "greedy",
        penalty: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        max_seconds: float = 30.0,
    ):
        self.tower_params = tower_params
        self.llm_params = llm_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.template = template or QwenPromptTemplate()
        self.decode_cfg = DecodeConfig(
            max_new_tokens=max_new_tokens, eot_id=cfg.eot_id, strategy=strategy,
            penalty=penalty, top_k=top_k, top_p=top_p,
        )
        self.max_samples = int(max_seconds * cfg.sample_rate)

    def _prompt_ids(self, context: str) -> dict:
        query = self.tokenizer.encode(context) if (context and self.tokenizer) else []
        mk = lambda ids: jnp.asarray([list(ids) or [0]][0], jnp.int32)[None] if ids else jnp.zeros((1, 0), jnp.int32)
        return {
            "head": mk(self.template.head_ids),
            "query": mk(tuple(query)),
            "suffix": mk(self.template.suffix_ids),
            "tail": mk(self.template.tail_ids),
        }

    def transcribe(
        self, audio: np.ndarray | str | Path, context: str = "", rng=None
    ) -> TranscribeResult:
        """``context``: optional text prompt (hot words / domain biasing)."""
        if isinstance(audio, (str, Path)):
            audio = audio_io.load_audio(audio, self.cfg.sample_rate, pcm_scale=1.0)
        audio = np.asarray(audio, np.float32)[: self.max_samples]
        n = len(audio)
        buf = np.zeros((1, self.max_samples), np.float32)
        buf[0, :n] = audio
        t0 = time.perf_counter()
        tokens, counts, valid = qa.forward(
            self.tower_params, self.llm_params, self.cfg,
            jnp.asarray(buf), jnp.asarray([n]), self._prompt_ids(context),
            self.decode_cfg, rng,
        )
        tokens = np.asarray(jax.block_until_ready(tokens))
        elapsed = time.perf_counter() - t0
        v, c = int(valid[0]), int(counts[0])
        ids = [int(t) for t in tokens[0, v : v + c] if t != self.cfg.eot_id]
        text = self.tokenizer.decode(ids) if self.tokenizer else ""
        return TranscribeResult(text=text, token_ids=ids,
                                audio_seconds=n / self.cfg.sample_rate,
                                elapsed_seconds=elapsed)


class FunAsrNanoLlmSession:
    """Fun-ASR-Nano LLM decode path (reference
    ``Fun_ASR_Nano/Inference_Fun_ASR_Nano_ONNX.py`` LLM branch): SANM
    encoder audio tokens spliced into a Qwen3 chat prompt
    [head | context text | audio | tail], one device call for
    prefill+decode. Shares the prompt-template convention with
    :class:`QwenAsrSession` (the reference reuses its Qwen3 shells)."""

    def __init__(
        self,
        params,
        llm_params,
        cfg,
        tokenizer=None,
        template: QwenPromptTemplate | None = None,
        max_new_tokens: int = 256,
        strategy: str = "greedy",
        penalty: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        max_seconds: float = 30.0,
    ):
        self.params = params
        self.llm_params = llm_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.template = template or QwenPromptTemplate()
        self.decode_cfg = DecodeConfig(
            max_new_tokens=max_new_tokens, eot_id=cfg.eot_id, strategy=strategy,
            penalty=penalty, top_k=top_k, top_p=top_p,
        )
        self.max_samples = int(max_seconds * cfg.sample_rate)

    def _prompt_ids(self, context: str) -> dict:
        query = self.tokenizer.encode(context) if (context and self.tokenizer) else []
        mk = lambda ids: (jnp.asarray([list(ids)], jnp.int32)
                          if ids else jnp.zeros((1, 0), jnp.int32))
        # head/suffix collapse into one pre-audio segment for this family
        return {
            "head": mk(tuple(self.template.head_ids)),
            "query": mk(tuple(query) + tuple(self.template.suffix_ids)),
            "tail": mk(tuple(self.template.tail_ids)),
        }

    def transcribe(self, audio, context: str = "", rng=None) -> TranscribeResult:
        from asr_tpu.models import fun_asr_nano as fn

        if isinstance(audio, (str, Path)):
            audio = audio_io.load_audio(audio, self.cfg.sample_rate)  # int16 range
        audio = np.asarray(audio, np.float32)[: self.max_samples]
        n = len(audio)
        buf = np.zeros((1, self.max_samples), np.float32)
        buf[0, :n] = audio
        t0 = time.perf_counter()
        tokens, counts, valid = fn.forward_llm(
            self.params, self.llm_params, self.cfg,
            jnp.asarray(buf), jnp.asarray([n]), self._prompt_ids(context),
            self.decode_cfg, rng,
        )
        tokens = np.asarray(jax.block_until_ready(tokens))
        elapsed = time.perf_counter() - t0
        v, c = int(valid[0]), int(counts[0])
        ids = [int(t) for t in tokens[0, v : v + c] if t != self.cfg.eot_id]
        text = self.tokenizer.decode(ids) if self.tokenizer else ""
        return TranscribeResult(text=text, token_ids=ids,
                                audio_seconds=n / self.cfg.sample_rate,
                                elapsed_seconds=elapsed)
