"""MP3 ingest via libmpg123 on the real reference fixtures."""

import numpy as np
import pytest

from asr_tpu.runtime import mp3
from asr_tpu.runtime import audio as audio_io

pytestmark = pytest.mark.skipif(not mp3.mpg123_available(), reason="libmpg123 unavailable")


def test_decode_fixture_mp3():
    samples, rate = mp3.read_mp3("/root/reference/Test_Examples/ja/ja.mp3")
    assert rate in (16000, 22050, 24000, 32000, 44100, 48000)
    assert samples.ndim == 2 and samples.shape[1] > rate  # > 1 second
    assert np.abs(samples).max() > 100  # int16 numeric range, non-silent


def test_load_audio_mp3_end_to_end():
    out = audio_io.load_audio("/root/reference/Test_Examples/ko/ko.mp3", 16000)
    assert out.ndim == 1 and out.dtype == np.float32
    assert len(out) > 16000
