"""End-to-end file pipeline: WAV → recognize_file → .txt + .json with
paragraphs and timestamps (tiny random model; no downloads, no ffmpeg)."""

import json

import numpy as np

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.recognize import recognize, recognize_file
from speechcatcher_tpu.streaming import Speech2TextStreaming
from speechcatcher_tpu.utils.audio import read_wav, write_wav


def make_s2t():
    model = ASRModel.random_init(tiny_config(), seed=8)
    return Speech2TextStreaming(model=model, beam_size=2)


def synth_pcm16(seconds, rate=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.4 * np.sin(2 * np.pi * 250 * t) + 0.05 * rng.randn(len(t))
    return (np.clip(x, -1, 1) * 30000).astype(np.int16)


def test_wav_roundtrip(tmp_path):
    pcm = synth_pcm16(1.0)
    path = tmp_path / "a.wav"
    write_wav(path, pcm)
    data, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_array_equal(data, pcm)


def test_recognize_file_writes_outputs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    pcm = synth_pcm16(3.0, seed=1)
    wav = tmp_path / "utt.wav"
    write_wav(wav, pcm)

    s2t = make_s2t()
    result = recognize_file(s2t, str(wav), output_file=str(tmp_path / "out"),
                            quiet=True, progress=False)
    assert "complete_text" in result and "paragraphs" in result
    txt = (tmp_path / "out.txt").read_text()
    payload = json.loads((tmp_path / "out.json").read_text())
    assert payload["complete_text"] == txt
    for para in payload["paragraphs"]:
        assert set(para) >= {"start", "end", "text", "tokens",
                             "token_timestamps"}
        assert len(para["tokens"]) == len(para["token_timestamps"])
        for ts in para["token_timestamps"]:
            assert para["start"] <= ts <= para["end"] + 1.0


def test_recognize_long_audio_segments(tmp_path):
    """>60 s audio goes through energy segmentation into paragraphs."""
    rng = np.random.RandomState(2)
    rate = 16000
    pcm = (rng.randn(70 * rate) * 8000).astype(np.int16)
    pcm[30 * rate : 31 * rate] = 0  # a silence for the endpointer
    s2t = make_s2t()
    text, aux = recognize(s2t, pcm, rate, progress=False, quiet=True)
    assert isinstance(text, str)
    assert len(aux) >= 1
    assert aux[0]["start"] == 0.0
    assert aux[-1]["end"] > 60.0
