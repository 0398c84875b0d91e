"""mu-law wire codec: codec math, host/device decode agreement, and the
engine-level exactness contract — a uint8 (mu-law) wire tick/finalize is
token-identical to feeding the host-decoded float32 of the same bytes
(the lossy step is ONLY the one-time encode quantization, ~38 dB SNR:
telephone-line transport, which the reference pipeline also accepts via
ffmpeg ingest, /root/reference/speechcatcher/speechcatcher.py:414)."""

import jax.numpy as jnp
import numpy as np
import pytest

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.serve.engine import StreamingEngine
from speechcatcher_tpu.serve.wire import (
    encode_chunk,
    mulaw_decode,
    mulaw_encode_f32,
    mulaw_encode_i16,
)

CFG = tiny_config()
CHUNK = 8192


def speech_like(n, seed=0, rate=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / rate
    f = 180 + 90 * (seed % 6)
    x = 0.3 * np.sin(2 * np.pi * f * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
    x = np.clip(x + 0.05 * rng.randn(n), -1, 1)
    return x.astype(np.float32)


def test_roundtrip_snr():
    x = speech_like(32000)
    y = mulaw_decode(mulaw_encode_f32(x))
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
    assert snr > 33.0, f"mu-law SNR {snr:.1f} dB"


def test_encode_monotone_and_symmetric():
    x = np.linspace(-1, 1, 4001, dtype=np.float32)
    u = mulaw_encode_f32(x)
    assert (np.diff(u.astype(np.int32)) >= 0).all()
    assert u[0] == 0 and u[-1] == 255
    # decode is odd-symmetric around the zero codes
    d = mulaw_decode(np.arange(256, dtype=np.uint8))
    np.testing.assert_allclose(d, -d[::-1], atol=1e-7)


def test_i16_lut_matches_f32_formula():
    x = np.array([-32768, -12345, -1, 0, 1, 777, 32767], np.int16)
    np.testing.assert_array_equal(
        mulaw_encode_i16(x),
        mulaw_encode_f32(x.astype(np.float64) / 32767.0),
    )


def test_device_decode_matches_host():
    """The device ingest (engine._MULAW_TABLE gather) must equal
    wire.mulaw_decode bit-for-bit; the closed-form jnp formula does NOT
    (1-ulp expm1 differences on ~18% of codes), which is why the engine
    expands through the table."""
    from speechcatcher_tpu.serve.engine import _MULAW_TABLE

    u = np.arange(256, dtype=np.uint8)
    dev = np.asarray(jnp.asarray(_MULAW_TABLE)[jnp.asarray(u, jnp.int32)])
    np.testing.assert_array_equal(dev, mulaw_decode(u))
    # the formula stays within float32 ulp noise of the table
    v = jnp.asarray(u).astype(jnp.float32) / 127.5 - 1.0
    form = np.asarray(
        jnp.sign(v) * jnp.expm1(jnp.abs(v) * 5.545177444479562) / 255.0
    )
    np.testing.assert_allclose(form, mulaw_decode(u), atol=2e-7)


def test_encode_chunk_formats():
    a = (speech_like(128) * 32767).astype(np.int16)
    assert encode_chunk(a, "mulaw").dtype == np.uint8
    assert encode_chunk(a, "int16") is a
    f = encode_chunk(a, "float32")
    assert f.dtype == np.float32 and np.abs(f).max() <= 1.0
    with pytest.raises(ValueError):
        encode_chunk(a, "opus")


@pytest.fixture(scope="module")
def model():
    return ASRModel.random_init(CFG, seed=2)


def _run(engine, wave_u8, decode_on_host):
    s = engine.acquire_slot()
    parts = []
    n_full = (len(wave_u8) - 1) // CHUNK
    for i in range(n_full):
        c = wave_u8[i * CHUNK : (i + 1) * CHUNK]
        if decode_on_host:
            c = mulaw_decode(c)
        parts.append(engine.tick({s: c})[s])
    tail = wave_u8[n_full * CHUNK :]
    if decode_on_host:
        tail = mulaw_decode(tail)
    res = engine.finalize_batch({s: tail})[s]
    return parts, res


def test_engine_uint8_wire_token_identical(model):
    """uint8 wire through the device == host-decoded float32 wire: same
    partials every tick, same final tokens/xpos/score."""
    wave = mulaw_encode_i16(
        (speech_like(int(CHUNK * 2.5), seed=3) * 32767).astype(np.int16)
    )
    eng_u8 = StreamingEngine(model, n_slots=2, beam_size=3,
                             chunk_samples=CHUNK)
    eng_f32 = StreamingEngine(model, n_slots=2, beam_size=3,
                              chunk_samples=CHUNK)
    parts_u8, (y_u8, x_u8, s_u8) = _run(eng_u8, wave, False)
    parts_f, (y_f, x_f, s_f) = _run(eng_f32, wave, True)
    assert parts_u8 == parts_f
    assert list(map(int, y_u8)) == list(map(int, y_f))
    assert list(map(int, x_u8)) == list(map(int, x_f))
    assert s_u8 == pytest.approx(s_f, rel=1e-5, abs=1e-5)
