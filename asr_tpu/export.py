"""Checkpoint -> artifact-folder builders (the reference's Export_*.py analog).

Each builder loads a source checkpoint directly into a pytree, stamps the
family's metadata contract (sample_rate, pcm scale, special tokens,
language catalog — reference ``SenseVoice/Export_SenseVoice.py:311-351``),
copies tokenizer assets, and writes a self-describing folder that
``asr_tpu.cli`` / the sessions consume. No ONNX, no graph surgery: the
"export" is a name-mapped weight load plus metadata.
"""

from __future__ import annotations

import dataclasses
import shutil
from pathlib import Path

from asr_tpu.runtime.artifact import save_model
from asr_tpu.runtime.metadata import LanguageProfile, ModelMetadata


def _copy_asset(src_dir: Path, name: str, dst_dir: Path) -> str | None:
    src = src_dir / name
    if src.exists():
        shutil.copy2(src, dst_dir / name)
        return name
    return None


def build_sensevoice_artifact(
    checkpoint_dir: str | Path, out_dir: str | Path, cfg=None
) -> Path:
    """FunASR SenseVoiceSmall folder (model.pt + am.mvn + *.bpe.model) ->
    artifact."""
    from asr_tpu.loaders import funasr
    from asr_tpu.models.sensevoice import LANGUAGE_PROFILES, SenseVoiceConfig

    checkpoint_dir = Path(checkpoint_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = cfg or SenseVoiceConfig()
    sd = funasr.load_checkpoint_file(checkpoint_dir / "model.pt")
    neg_means, istd = funasr.parse_kaldi_mvn(checkpoint_dir / "am.mvn")
    params = funasr.sensevoice_params_from_state_dict(sd, cfg, neg_means, istd)

    tok_file = None
    for cand in checkpoint_dir.glob("*.bpe.model"):
        tok_file = _copy_asset(checkpoint_dir, cand.name, out_dir)
        break
    meta = ModelMetadata(
        family="sensevoice",
        sample_rate=cfg.sample_rate,
        audio_pcm_scale=32768.0,
        special_token_ids={"blank": cfg.blank_id},
        supported_languages=[
            LanguageProfile(code, desc, tuple(aliases), tok, i)
            for i, (code, desc, aliases, tok) in enumerate(LANGUAGE_PROFILES)
        ],
        tokenizer={"kind": "sentencepiece", "file": tok_file or ""},
        extra={"config": dataclasses.asdict(cfg) | {"fbank": None}},
    )
    meta.extra["config"].pop("fbank", None)
    save_model(out_dir, params, meta)
    return out_dir


def build_whisper_artifact(checkpoint_dir: str | Path, out_dir: str | Path) -> Path:
    """HF Whisper snapshot (config.json + model.safetensors + tokenizer.json
    + generation_config.json) -> artifact."""
    import json

    from asr_tpu.loaders.whisper_hf import load_from_pretrained_dir

    checkpoint_dir = Path(checkpoint_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    params, cfg = load_from_pretrained_dir(checkpoint_dir)

    special = {"sot": cfg.sot_id, "eot": cfg.eot_id}
    suppress: list[int] = []
    begin_suppress: list[int] = []
    lang_map: dict[str, int] = {}
    gen_path = checkpoint_dir / "generation_config.json"
    if gen_path.exists():
        gen = json.loads(gen_path.read_text())
        suppress = list(gen.get("suppress_tokens", []) or [])
        begin_suppress = list(gen.get("begin_suppress_tokens", []) or [])
        lang_map = {
            code.strip("<|>"): int(tok)
            for code, tok in (gen.get("lang_to_id") or {}).items()
        }
        for key in ("no_timestamps_token_id", "no_speech_token_id"):
            if gen.get(key) is not None:
                special[key.removesuffix("_token_id")] = int(gen[key])
        task_map = gen.get("task_to_id") or {}
        for task, tok in task_map.items():
            special[task] = int(tok)
    tok_file = _copy_asset(checkpoint_dir, "tokenizer.json", out_dir)
    meta = ModelMetadata(
        family="whisper",
        sample_rate=cfg.sample_rate,
        audio_pcm_scale=1.0,
        special_token_ids=special,
        supported_languages=[
            LanguageProfile(code, code, (), tok) for code, tok in sorted(lang_map.items())
        ],
        max_seq_len=cfg.max_target_positions,
        tokenizer={"kind": "hf", "file": tok_file or ""},
        extra={
            "config": dataclasses.asdict(cfg),
            "suppress_tokens": suppress,
            "begin_suppress_tokens": begin_suppress,
        },
    )
    save_model(out_dir, params, meta)
    return out_dir


def build_paraformer_artifact(
    checkpoint_dir: str | Path, out_dir: str | Path, cfg=None,
    decode_mode: str = "zh", streaming: bool = False,
) -> Path:
    """FunASR Paraformer folder (model.pt + am.mvn + vocab txt) -> artifact.

    Mirrors the reference export entry points
    (``Paraformer/Non-Streaming/Export_Paraformer.py`` and the streaming
    variant): one weight map serves both; ``streaming=True`` stamps the
    streaming family so the CLI builds a chunked session."""
    from asr_tpu.loaders import funasr
    from asr_tpu.models.paraformer import ParaformerConfig

    checkpoint_dir = Path(checkpoint_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = cfg or ParaformerConfig()
    sd = funasr.load_checkpoint_file(checkpoint_dir / "model.pt")
    neg_means, istd = funasr.parse_kaldi_mvn(checkpoint_dir / "am.mvn")
    params = funasr.paraformer_params_from_state_dict(sd, cfg, neg_means, istd)

    tok_file = None
    for name in ("tokens.txt", "vocab.txt", "tokens.json"):
        tok_file = _copy_asset(checkpoint_dir, name, out_dir)
        if tok_file:
            break
    meta = ModelMetadata(
        family="paraformer_streaming" if streaming else "paraformer",
        sample_rate=cfg.sample_rate,
        audio_pcm_scale=32768.0,
        special_token_ids={"blank": 0, "sos": 1, "eos": 2},
        tokenizer={"kind": "vocab_txt", "file": tok_file or ""},
        extra={"config": dataclasses.asdict(cfg), "decode_mode": decode_mode},
    )
    save_model(out_dir, params, meta)
    return out_dir


def build_dolphin_artifact(
    checkpoint_path: str | Path, out_dir: str | Path, cfg=None,
    vocab_path: str | Path | None = None,
) -> Path:
    """espnet Dolphin checkpoint (.pt state dict) -> artifact (reference
    ``Dolphin/v1/Export_Dolphin.py`` / CN-Dialect variants)."""
    import torch

    from asr_tpu.loaders.dolphin_espnet import params_from_state_dict
    from asr_tpu.models.dolphin import DolphinConfig

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = cfg or DolphinConfig()
    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    params = params_from_state_dict(sd, cfg)

    tok_file = None
    if vocab_path is not None:
        tok_file = _copy_asset(Path(vocab_path).parent, Path(vocab_path).name, out_dir)
    meta = ModelMetadata(
        family="dolphin",
        sample_rate=cfg.sample_rate,
        audio_pcm_scale=32768.0,
        special_token_ids={"sos": cfg.sos_id, "eos": cfg.eos_id},
        tokenizer={"kind": "vocab_txt", "file": tok_file or ""},
        extra={"config": dataclasses.asdict(cfg)},
    )
    save_model(out_dir, params, meta)
    return out_dir


def build_xasr_artifact(
    checkpoint_path: str | Path, out_dir: str | Path, cfg=None,
    weight_key: str = "model_avg", bpe_model: str | Path | None = None,
) -> Path:
    """icefall Zipformer2 checkpoint (.pt) -> X-ASR streaming artifact.

    Mirrors reference ``X-ASR/Export_X_ASR.py:22-25,157-167``: reads
    ``ckpt[weight_key]`` (``model_avg`` = icefall's averaged weights) and
    bakes the fixed streaming geometry (pos tables, fused convs) for
    ``cfg.chunk_size``/``cfg.left_context_frames``."""
    import torch

    from asr_tpu.loaders.zipformer_icefall import zipformer_params_from_state_dict
    from asr_tpu.models.zipformer import ZipformerConfig

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = cfg or ZipformerConfig()
    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get(weight_key, ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params = zipformer_params_from_state_dict(sd, cfg)

    tok_file = None
    if bpe_model is not None:
        tok_file = _copy_asset(Path(bpe_model).parent, Path(bpe_model).name, out_dir)
    meta = ModelMetadata(
        family="x_asr",
        sample_rate=cfg.fbank.sample_rate,
        audio_pcm_scale=32768.0,
        special_token_ids={"blank": cfg.blank_id},
        tokenizer={"kind": "sentencepiece", "file": tok_file or ""},
        extra={"config": dataclasses.asdict(cfg)},
    )
    save_model(out_dir, params, meta)
    return out_dir


def build_firered_artifact(
    checkpoint_dir: str | Path, out_dir: str | Path, cfg=None
) -> Path:
    """FireRedASR-AED folder (model.pth.tar + cmvn.ark + dict.txt
    [+ train_bpe1000.model]) -> artifact (reference
    ``FireRedASR/Export_FireRedASR_AED.py:1231-1249`` load path)."""
    from asr_tpu.loaders import firered as fr_loader

    checkpoint_dir = Path(checkpoint_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sd, _args = fr_loader.load_checkpoint(checkpoint_dir / "model.pth.tar")
    cfg = cfg or fr_loader.config_from_state_dict(sd)
    cmvn_means = cmvn_istd = None
    cmvn_path = checkpoint_dir / "cmvn.ark"
    if cmvn_path.exists():
        cmvn_means, cmvn_istd = fr_loader.parse_kaldi_cmvn_stats(cmvn_path)
    params = fr_loader.firered_params_from_state_dict(sd, cfg, cmvn_means, cmvn_istd)

    tok_file = _copy_asset(checkpoint_dir, "dict.txt", out_dir)
    _copy_asset(checkpoint_dir, "train_bpe1000.model", out_dir)  # encode-side spm
    meta = ModelMetadata(
        family="firered",
        sample_rate=cfg.sample_rate,
        audio_pcm_scale=32768.0,
        special_token_ids={"sos": cfg.sos_id, "eos": cfg.eos_id},
        max_seq_len=cfg.max_target_positions,
        tokenizer={"kind": "firered_dict", "file": tok_file or ""},
        extra={"config": dataclasses.asdict(cfg) | {"fbank": None}},
    )
    meta.extra["config"].pop("fbank", None)
    save_model(out_dir, params, meta)
    return out_dir


def build_parakeet_artifact(checkpoint_dir: str | Path, out_dir: str | Path, cfg=None) -> Path:
    """HF parakeet-tdt safetensors snapshot -> artifact."""
    from safetensors.numpy import load_file

    from asr_tpu.loaders.parakeet_hf import tdt_params_from_state_dict
    from asr_tpu.models.parakeet import ParakeetConfig

    checkpoint_dir = Path(checkpoint_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = cfg or ParakeetConfig()
    sd: dict = {}
    for f in sorted(checkpoint_dir.glob("*.safetensors")):
        sd.update(load_file(str(f)))
    params = tdt_params_from_state_dict(sd, cfg)
    tok_file = _copy_asset(checkpoint_dir, "tokenizer.json", out_dir)
    meta = ModelMetadata(
        family="parakeet",
        sample_rate=cfg.sample_rate,
        audio_pcm_scale=1.0,
        special_token_ids={"blank": cfg.blank_id},
        tokenizer={"kind": "hf", "file": tok_file or ""},
        extra={"config": dataclasses.asdict(cfg), "durations": list(cfg.durations)},
    )
    save_model(out_dir, params, meta)
    return out_dir
