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

def test_overlong_utterance_raises_loudly():
    """Past max_enc_frames the single-stream decode must fail loudly, never
    silently clip (the capacity clip corrupted CTC/cross-attn context)."""
    import pytest

    cfg = tiny_config(max_enc_frames=40)
    model = ASRModel.random_init(cfg, seed=8)
    s2t = Speech2TextStreaming(model=model, beam_size=2)
    rng = np.random.RandomState(3)
    audio = (rng.randn(16000 * 30)).astype(np.float32) * 0.1
    with pytest.raises(RuntimeError, match="too long"):
        s2t.recognize(audio)


def test_long_segment_splits_and_decodes():
    """A segment longer than the decode-state capacity is split below the
    bound and decodes to the same text as pre-split halves."""
    from speechcatcher_tpu.recognize import _split_overlong_spans

    cfg = tiny_config(max_enc_frames=128)  # ~20s capacity at 160ms/frame? no:
    # frame = hop*subsample/rate = 160*4/16000 = 40ms -> 128 frames = 5.12s
    model = ASRModel.random_init(cfg, seed=8)
    s2t = Speech2TextStreaming(model=model, beam_size=2)

    rate = 16000
    rng = np.random.RandomState(5)
    t = np.arange(12 * rate) / rate
    x = 0.4 * np.sin(2 * np.pi * 250 * t) + 0.05 * rng.randn(len(t))
    pcm = (np.clip(x, -1, 1) * 30000).astype(np.int16)

    # 12 s > 0.9*128*0.04 = 4.6 s: must split (into 3 sub-spans) and decode
    # without tripping the overflow guard.
    spans = _split_overlong_spans([(0.0, 12.0)], 0.9 * 128 * 0.04)
    assert len(spans) == 3
    assert all(s1 - s0 <= 0.9 * 128 * 0.04 + 1e-9 for s0, s1 in spans)
    text, aux = recognize(s2t, pcm, rate, progress=False, quiet=True,
                          num_processes=1)
    assert isinstance(text, str)

    # The same audio decoded segment-by-segment (pre-split at the same
    # boundaries, same chunked driver) matches.
    from speechcatcher_tpu.recognize import _decode_segment

    speech = pcm.astype(np.float32) / 32767.0
    parts = []
    for s0, s1 in spans:
        txt, _toks, _ts = _decode_segment(
            s2t, speech, int(s0 * rate), int(s1 * rate), 8192
        )
        parts.append(txt)
    # recognize() merges paragraphs by sentence completion and capitalizes
    # paragraph starts; compare whitespace/case-normalized content.
    def norm(s):
        return "".join(s.lower().split())

    assert norm("".join(parts)) == norm(text)


def test_batched_segments_match_serial():
    """num_processes>1 routes segments through the batched engine; the
    output must be byte-identical to the serial path."""
    rate = 16000
    rng = np.random.RandomState(7)
    t = np.arange(70 * rate) / rate
    x = 0.4 * np.sin(2 * np.pi * 250 * t) + 0.05 * rng.randn(len(t))
    pcm = (np.clip(x, -1, 1) * 25000).astype(np.int16)
    pcm[20 * rate : 21 * rate] = 0
    pcm[45 * rate : 46 * rate] = 0

    s2t = make_s2t()
    text_serial, aux_serial = recognize(
        s2t, pcm, rate, progress=False, quiet=True, num_processes=1
    )
    text_batch, aux_batch = recognize(
        s2t, pcm, rate, progress=False, quiet=True, num_processes=4
    )
    assert text_batch == text_serial
    assert json.dumps(aux_batch) == json.dumps(aux_serial)


def test_linear_interpolate_positions():
    """Plateaus of repeated positions become monotone ramps ending exactly
    on the plateau value; distinct values pass through unchanged. (The
    reference defines this transform but never calls it, and its ramp
    coefficients are reversed — see the docstring in recognize.py.)"""
    from speechcatcher_tpu.recognize import linear_interpolate_positions as lip

    assert lip([]) == []
    assert lip([4.0]) == [4.0]
    assert lip([1.0, 2.0, 5.0]) == [1.0, 2.0, 5.0]
    # Leading plateau ramps from 0; last element exact.
    assert lip([6.0, 6.0, 6.0]) == [2.0, 4.0, 6.0]
    # Interior plateau ramps from the previous distinct value.
    assert lip([2.0, 8.0, 8.0, 8.0, 9.0]) == [2.0, 4.0, 6.0, 8.0, 9.0]
    out = lip([3, 3, 7, 7, 7, 10])
    assert all(b > a for a, b in zip(out, out[1:]))
    assert out[-1] == 10.0


def test_recognize_interpolate_timestamps_flag():
    """interpolate_timestamps=True keeps text/tokens identical and maps
    the timestamp list through linear_interpolate_positions exactly."""
    from speechcatcher_tpu.recognize import linear_interpolate_positions as lip

    s2t = make_s2t()
    pcm = synth_pcm16(4.0, seed=3)
    text0, aux0 = recognize(s2t, pcm, 16000, progress=False, quiet=True)
    text1, aux1 = recognize(s2t, pcm, 16000, progress=False, quiet=True,
                            interpolate_timestamps=True)
    assert text1 == text0
    assert [a["tokens"] for a in aux1] == [a["tokens"] for a in aux0]
    ts0 = aux0[0]["token_timestamps"]
    ts1 = aux1[0]["token_timestamps"]
    assert len(ts0) > 0 and len(ts1) == len(ts0)
    np.testing.assert_allclose(ts1, lip(ts0), rtol=0, atol=1e-9)
