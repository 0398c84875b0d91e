"""SessionManager tests (no sockets): staging, partials, plateau
endpointing, finalization, busy rejection."""

import json

import numpy as np
import pytest

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.serve.engine import StreamingEngine
from speechcatcher_tpu.serve.server import SessionManager

CFG = tiny_config()
CHUNK = 8192


@pytest.fixture(scope="module")
def manager():
    model = ASRModel.random_init(CFG, seed=2)
    engine = StreamingEngine(model, n_slots=2, beam_size=2,
                             chunk_samples=CHUNK)
    return SessionManager(engine, finalize_update_iters=3,
                          max_partial_iters=10)


def pcm16(seconds, seed=0, rate=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.3 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.randn(len(t))
    return (np.clip(x, -1, 1) * 32000).astype(np.int16).tobytes()


def test_session_lifecycle_and_busy(manager):
    s1 = manager.open_session()
    s2 = manager.open_session()
    assert s1 is not None and s2 is not None
    assert manager.open_session() is None  # pool exhausted → busy
    manager.close_session(s2)
    s3 = manager.open_session()
    assert s3 is not None
    manager.close_session(s1)
    manager.close_session(s3)


def test_partials_and_finalize(manager):
    sid = manager.open_session()
    audio = pcm16(2.0, seed=1)
    manager.feed(sid, audio)
    assert manager.ready()

    partials = []
    while manager.ready():
        out = manager.tick()
        if sid in out:
            partials.append(out[sid])
            if "result" in out[sid]:
                break
        if manager.sessions[sid].staged.available() < CHUNK:
            break
    assert partials, "no messages produced"
    assert all("partial" in p or "result" in p for p in partials)

    # Force finalization of the remainder.
    manager.request_final(sid)
    out = manager.tick()
    assert sid in out and "result" in out[sid]
    msg = out[sid]
    assert "text" in msg
    for w in msg["result"]:
        assert set(w) == {"conf", "start", "end", "word"}
        assert w["end"] >= w["start"] >= 0
    # JSON-serializable (the wire format).
    json.dumps(msg)
    manager.close_session(sid)


def test_mulaw_wire_end_to_end(manager):
    """A SessionManager configured with the uint8 mu-law wire produces a
    well-formed Vosk result end to end (the token-exactness contract of
    the wire itself is covered in tests/test_wire.py; this covers the
    server plumbing: staged float32 -> encode_chunk -> engine tick)."""
    mgr = SessionManager(manager.engine, finalize_update_iters=3,
                         max_partial_iters=10, wire="mulaw")
    sid = mgr.open_session()
    assert sid is not None
    mgr.feed(sid, pcm16(2.0, seed=7))
    saw_tick = False
    while mgr.ready():
        out = mgr.tick()
        saw_tick = saw_tick or bool(out)
        if mgr.sessions[sid].staged.available() < CHUNK:
            break
    assert saw_tick, "mu-law wire produced no tick output"
    mgr.request_final(sid)
    out = mgr.tick()
    assert sid in out and "result" in out[sid]
    json.dumps(out[sid])
    mgr.close_session(sid)


def test_two_sessions_batched(manager):
    s1 = manager.open_session()
    s2 = manager.open_session()
    manager.feed(s1, pcm16(1.0, seed=2))
    manager.feed(s2, pcm16(1.0, seed=3))
    out = manager.tick()
    assert s1 in out and s2 in out
    manager.request_final(s1)
    manager.request_final(s2)
    out = manager.tick()
    assert "result" in out[s1] and "result" in out[s2]
    manager.close_session(s1)
    manager.close_session(s2)
