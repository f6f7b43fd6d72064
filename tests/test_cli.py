"""CLI: artifact inspect / quantize / transcribe round trip."""

import json
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from asr_tpu.cli import main
from asr_tpu.models import sensevoice as sv
from asr_tpu.runtime.artifact import save_model
from asr_tpu.runtime.metadata import ModelMetadata

TINY = sv.SenseVoiceConfig(
    vocab_size=64, hidden=32, num_heads=4, head_dim=8, ffn_dim=48,
    num_encoders0=1, num_encoders=1, num_tp_encoders=1, fsmn_kernel=5,
)
TINY_DICT = dict(vocab_size=64, hidden=32, num_heads=4, head_dim=8, ffn_dim=48,
                 num_encoders0=1, num_encoders=1, num_tp_encoders=1, fsmn_kernel=5)


def _make_artifact(folder):
    params = sv.init_params(TINY, jax.random.PRNGKey(0))
    meta = ModelMetadata(family="sensevoice", extra={"config": TINY_DICT})
    save_model(folder, params, meta)


def test_inspect_and_transcribe(tmp_path, capsys):
    _make_artifact(tmp_path / "m")
    assert main(["inspect", "--model-dir", str(tmp_path / "m")]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["family"] == "sensevoice"

    wav = "/root/reference/Test_Examples/en/test_sample.wav"
    assert main(["transcribe", "--model-dir", str(tmp_path / "m"), "--language", "en", wav]) == 0
    text = capsys.readouterr().out
    assert "RTF" in text


def test_quantize_roundtrip(tmp_path, capsys):
    _make_artifact(tmp_path / "m")
    assert main(["quantize", "--model-dir", str(tmp_path / "m"),
                 "--out", str(tmp_path / "q"), "--bits", "8", "--block", "32"]) == 0
    meta = json.loads((tmp_path / "q" / "metadata.json").read_text())
    assert meta["extra"]["quantization"]["bits"] == 8


def test_cli_build_firered(tmp_path):
    """`asr_tpu build` end-to-end: synthetic FireRed checkpoint -> artifact
    -> transcribe-able session."""
    import torch

    from asr_tpu.cli import main, _build_session
    from tests.test_firered import TINY, _firered_sd

    rng = np.random.default_rng(1)
    src = tmp_path / "ckpt"
    src.mkdir()
    torch.save({"args": {}, "model_state_dict": _firered_sd(TINY, rng)},
               src / "model.pth.tar")
    (src / "dict.txt").write_text("\n".join(f"t{i} {i}" for i in range(TINY.vocab_size)))
    out = tmp_path / "artifact"
    rc = main(["--platform", "cpu", "build", "--family", "firered",
               "--checkpoint", str(src), "--out", str(out)])
    assert rc == 0
    sess = _build_session(out)
    assert type(sess).__name__ == "FireRedSession"


def test_cli_parity_harness(tmp_path):
    """parity: transcribe fixtures, capture goldens, detect drift."""
    import json

    import torch

    from asr_tpu.cli import main
    from tests.test_firered import TINY, _firered_sd

    rng = np.random.default_rng(2)
    src = tmp_path / "ckpt"
    src.mkdir()
    torch.save({"args": {}, "model_state_dict": _firered_sd(TINY, rng)},
               src / "model.pth.tar")
    (src / "dict.txt").write_text("\n".join(f"t{i} {i}" for i in range(TINY.vocab_size)))
    art = tmp_path / "artifact"
    assert main(["--platform", "cpu", "build", "--family", "firered",
                 "--checkpoint", str(src), "--out", str(art)]) == 0

    golden = tmp_path / "golden.json"
    assert main(["--platform", "cpu", "parity", "--model-dir", str(art),
                 "--save-golden", str(golden)]) == 0
    data = json.loads(golden.read_text())
    assert "zh-Shanghai.wav" in data

    # Same run -> OK; perturbed golden -> drift detected.
    assert main(["--platform", "cpu", "parity", "--model-dir", str(art),
                 "--golden", str(golden)]) == 0
    data["zh-Shanghai.wav"]["token_ids"] = [1, 2, 3]
    data["zh-Shanghai.wav"]["text"] = "different"
    golden.write_text(json.dumps(data))
    assert main(["--platform", "cpu", "parity", "--model-dir", str(art),
                 "--golden", str(golden)]) == 1


def test_serve_stream_rejects_non_streaming_family(tmp_path):
    """serve-stream on an offline artifact fails loudly naming the
    streaming families instead of crashing into the runner."""
    import dataclasses

    import pytest

    from asr_tpu.cli import main
    from asr_tpu.models import sensevoice as sv
    from asr_tpu.runtime.artifact import save_model
    from asr_tpu.runtime.metadata import ModelMetadata

    cfg = sv.SenseVoiceConfig(
        vocab_size=64, hidden=32, num_heads=4, head_dim=8, ffn_dim=48,
        num_encoders0=1, num_encoders=1, num_tp_encoders=1, fsmn_kernel=5,
    )
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    folder = tmp_path / "art"
    folder.mkdir()
    save_model(folder, params, ModelMetadata(
        family="sensevoice", extra={"config": dataclasses.asdict(cfg)}))
    with pytest.raises(SystemExit, match="streaming families"):
        main(["serve-stream", "--model-dir", str(folder), "--streams", "2"])
