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
def model():
    return ASRModel.random_init(CFG, seed=2)


@pytest.fixture(scope="module")
def manager(model):
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


def test_eof_with_backlog_drains_through_ticks(manager):
    """A client that uploads a multi-chunk backlog and immediately sends
    eof must get the SAME transcript as one that interleaved ticks: the
    backlog drains through normal full-chunk ticks (finalize only takes
    the sub-chunk remainder), instead of being stuffed into one oversized
    finalize tail."""
    audio = pcm16(2.2, seed=9)

    # Interleaved baseline: feed chunk-by-chunk with ticks between.
    sid_a = manager.open_session()
    n = len(audio) // 2  # samples
    step = CHUNK * 2     # bytes per chunk
    for i in range(0, len(audio), step):
        manager.feed(sid_a, audio[i : i + step])
        while manager.ready() and manager.sessions[
            sid_a
        ].staged.available() >= CHUNK:
            manager.tick()
    manager.request_final(sid_a)
    final_a = None
    while final_a is None:
        out = manager.tick()
        if sid_a in out and "result" in out[sid_a]:
            final_a = out[sid_a]
    manager.close_session(sid_a)

    # Backlog client: everything staged before eof.
    sid_b = manager.open_session()
    manager.feed(sid_b, audio)
    manager.request_final(sid_b)
    final_b = None
    for _ in range(64):
        out = manager.tick()
        if sid_b in out and "result" in out[sid_b]:
            final_b = out[sid_b]
            break
    assert final_b is not None, "backlog eof never produced a final"
    assert final_b["text"] == final_a["text"]
    assert final_b["result"] == final_a["result"]
    manager.close_session(sid_b)


def test_capacity_stall_segments_instead_of_dropping(model):
    """A continuous stream longer than the encoder ring must segment:
    the server stops consuming at the stall (audio stays staged), cuts a
    final, re-arms the slot, and decodes the remainder — no audio is
    silently dropped by engine.tick. tiny_config's ring (256 frames) fits
    ~19 chunks; we feed 30."""
    engine = StreamingEngine(model, n_slots=1, beam_size=2,
                             chunk_samples=CHUNK)
    mgr = SessionManager(engine, finalize_update_iters=1000,
                         max_partial_iters=10_000)
    sid = mgr.open_session()
    n_chunks = 30
    mgr.feed(sid, pcm16(n_chunks * CHUNK / 16000 + 0.01, seed=12))

    finals = []
    ticks = 0
    while mgr.ready() and ticks < 200:
        out = mgr.tick()
        ticks += 1
        if sid in out and "result" in out[sid]:
            finals.append(out[sid])
        if mgr.sessions[sid].staged.available() < CHUNK:
            break
    mgr.request_final(sid)
    for _ in range(8):
        out = mgr.tick()
        if sid in out and "result" in out[sid]:
            finals.append(out[sid])
            break
    assert len(finals) >= 2, (
        f"expected a capacity segment final plus the eof final, got "
        f"{len(finals)} finals after {ticks} ticks"
    )
    assert any(f["text"] for f in finals), "all segment finals empty"
    mgr.close_session(sid)
