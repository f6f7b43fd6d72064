"""MP3 ingest. Pure-Python MPEG-1 Layer III decoding is planned; until then
this delegates to ffmpeg when present and fails with a clear message
otherwise (the build environment has neither ffmpeg nor pydub)."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import numpy as np


def read_mp3(path: str | Path) -> tuple[np.ndarray, int]:
    """Decode an MP3 -> (float32 (channels, n) int16-range samples, rate)."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise NotImplementedError(
            "MP3 decoding requires ffmpeg on PATH (pure-Python decoder not yet "
            "implemented); convert to WAV or install ffmpeg"
        )
    probe = subprocess.run(
        [ffmpeg, "-i", str(path), "-f", "s16le", "-acodec", "pcm_s16le", "-"],
        capture_output=True,
        check=True,
    )
    # Default ffmpeg output keeps source channel count/rate; parse from stderr.
    import re

    m = re.search(rb"(\d+) Hz, (stereo|mono|\d+ channels)", probe.stderr)
    rate = int(m.group(1)) if m else 44100
    ch = 2 if (m and m.group(2) == b"stereo") else 1
    data = np.frombuffer(probe.stdout, dtype="<i2").astype(np.float32)
    return data.reshape(-1, ch).T, rate
