"""Batched multi-stream engine parity: S slots with different audio must
reproduce S independent single-stream sessions token-for-token."""

import numpy as np
import pytest

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.serve.engine import StreamingEngine
from speechcatcher_tpu.streaming import Speech2TextStreaming

CFG = tiny_config()  # full 80-mel frontend, tiny encoder/decoder
CHUNK = 8192


@pytest.fixture(scope="module")
def model():
    return ASRModel.random_init(CFG, seed=1)


def synth_audio(seconds, seed, rate=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    f = 200 + 100 * (seed % 5)
    tone = 0.3 * np.sin(2 * np.pi * f * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
    return (tone + 0.05 * rng.randn(len(t))).astype(np.float32)


def single_stream_tokens(model, audio, n_chunks):
    """Final (token_ids, token_pos) via the single-stream session."""
    s2t = Speech2TextStreaming(model=model, beam_size=3)
    results = []
    for i in range(n_chunks):
        chunk = audio[i * CHUNK : (i + 1) * CHUNK]
        results = s2t(chunk, is_final=(i == n_chunks - 1))
    assert results, "no final result"
    _text, _tokens, ids, pos = results[0]
    return ids, pos


def final_to_ids(model, yseq, xpos):
    """Engine finalize output → same filtered (ids, pos) convention."""
    cfg = model.cfg
    ids = list(map(int, yseq[1:]))
    pos = list(map(int, xpos[1:]))
    if ids and ids[-1] == cfg.eos_id:
        ids, pos = ids[:-1], pos[:-1]
    drop = {cfg.blank_id, model.tokenizer.unk_id, cfg.eos_id}
    keep = [i for i, t in enumerate(ids) if t not in drop]
    return [ids[i] for i in keep], [pos[i] for i in keep]


def test_engine_matches_single_stream(model):
    n_streams = 3
    n_chunks = 4
    audios = [synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=s)
              for s in range(n_streams)]

    # Golden: independent single-stream sessions.
    golden = []
    for a in audios:
        # Recreate session per stream to reset all state.
        golden.append(single_stream_tokens(model, a, n_chunks))

    # Engine: all streams in one batch, finalized on the last tick.
    engine = StreamingEngine(model, n_slots=n_streams + 1, beam_size=3,
                             chunk_samples=CHUNK)
    slots = [engine.acquire_slot() for _ in range(n_streams)]
    for i in range(n_chunks - 1):
        engine.tick({
            s: audios[k][i * CHUNK : (i + 1) * CHUNK]
            for k, s in enumerate(slots)
        })
    finals = {}
    for k, s in enumerate(slots):
        yseq, xpos, _ = engine.finalize(
            s, audios[k][(n_chunks - 1) * CHUNK : n_chunks * CHUNK]
        )
        finals[k] = final_to_ids(model, yseq, xpos)

    for k in range(n_streams):
        g_ids, g_pos = golden[k]
        e_ids, e_pos = finals[k]
        assert e_ids == g_ids, (
            f"stream {k}: engine {e_ids} != single {g_ids}"
        )
        assert e_pos == g_pos, f"stream {k} xpos"


def test_engine_staggered_starts(model):
    """Streams joining at different ticks must not perturb each other."""
    n_chunks = 3
    a0 = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=10)
    a1 = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=11)

    golden0 = single_stream_tokens(model, a0, n_chunks)
    golden1 = single_stream_tokens(model, a1, n_chunks)

    engine = StreamingEngine(model, n_slots=4, beam_size=3,
                             chunk_samples=CHUNK)
    s0 = engine.acquire_slot()
    engine.tick({s0: a0[:CHUNK]})
    s1 = engine.acquire_slot()  # joins one tick later
    engine.tick({s0: a0[CHUNK : 2 * CHUNK], s1: a1[:CHUNK]})
    f0 = engine.finalize(s0, a0[2 * CHUNK : 3 * CHUNK])
    engine.tick({s1: a1[CHUNK : 2 * CHUNK]})
    f1 = engine.finalize(s1, a1[2 * CHUNK : 3 * CHUNK])

    assert final_to_ids(model, f0[0], f0[1]) == golden0
    assert final_to_ids(model, f1[0], f1[1]) == golden1


def test_engine_slot_reuse(model):
    """A released+reacquired slot must behave like a fresh session."""
    n_chunks = 2
    a = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=20)
    golden = single_stream_tokens(model, a, n_chunks)

    engine = StreamingEngine(model, n_slots=2, beam_size=3,
                             chunk_samples=CHUNK)
    s = engine.acquire_slot()
    engine.tick({s: a[:CHUNK]})
    engine.finalize(s, a[CHUNK:])  # completes + resets slot

    s2 = engine.acquire_slot()
    assert s2 == s  # reused
    engine.tick({s2: a[:CHUNK]})
    f = engine.finalize(s2, a[CHUNK : 2 * CHUNK])
    assert final_to_ids(model, f[0], f[1]) == golden


def test_slot_reuse_no_stale_partials(model):
    """The deferred (one-tick-lagged) packed-partials readback must not
    resurface a finalized utterance's tokens for a NEW session reusing
    the slot: _reset_slots patches _last_packed, but _pending_packed
    still holds a pre-reset row that tick() materializes wholesale on
    the next tick (engine.tick's async D2H overlap)."""
    n_chunks = 3
    a = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=20)
    b = synth_audio(2 * CHUNK / 16000 + 0.01, seed=21)

    engine = StreamingEngine(model, n_slots=1, beam_size=3,
                             chunk_samples=CHUNK)
    s = engine.acquire_slot()
    last = {}
    for i in range(n_chunks - 1):
        last = engine.tick({s: a[i * CHUNK : (i + 1) * CHUNK]})
    # Leave the last tick's readback pending (no further tick before the
    # finalize), then finalize + reuse the slot.
    assert engine._pending_packed is not None
    engine.finalize_batch({s: a[(n_chunks - 1) * CHUNK :]})
    s2 = engine.acquire_slot()
    assert s2 == s  # reused slot

    out = engine.tick({s2: b[:CHUNK]})
    assert out[s2] == [], (
        f"new session's first tick emitted stale tokens {out[s2]} "
        f"(previous utterance's last partial: {last.get(s, [])})"
    )
    # The new session's own (lagged) partials flow normally afterwards.
    out2 = engine.tick({s2: b[CHUNK : 2 * CHUNK]})
    ref = StreamingEngine(model, n_slots=1, beam_size=3,
                          chunk_samples=CHUNK)
    r = ref.acquire_slot()
    ref.tick({r: b[:CHUNK]})
    ref_out = ref.tick({r: b[CHUNK : 2 * CHUNK]})
    assert out2[s2] == ref_out[r]


def test_engine_int16_ingest_matches_float(model):
    """int16 PCM chunks (normalized on device) must produce exactly the
    same tokens as pre-normalized float32 chunks."""
    n_chunks = 3
    a16 = (np.clip(synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=77),
                   -1, 1) * 32767).astype(np.int16)
    af = a16.astype(np.float32) / 32767.0

    outs = []
    for audio in (af, a16):
        engine = StreamingEngine(model, n_slots=2, beam_size=3,
                                 chunk_samples=CHUNK)
        s = engine.acquire_slot()
        for i in range(n_chunks - 1):
            engine.tick({s: audio[i * CHUNK : (i + 1) * CHUNK]})
        outs.append(engine.finalize_batch(
            {s: audio[(n_chunks - 1) * CHUNK :]}
        )[s])
    assert list(map(int, outs[0][0])) == list(map(int, outs[1][0]))
    assert list(map(int, outs[0][1])) == list(map(int, outs[1][1]))


def test_engine_bf16_enc_ring_token_parity(model):
    """enc_ring_dtype='bfloat16' stores the emitted-frame ring (the CTC
    head's input AND the rematerialized cross-attention memory) in bf16;
    on this fixture the decoded tokens must not move vs the fp32 ring."""
    import dataclasses

    n_chunks = 3
    audio = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=21)
    model16 = dataclasses.replace(
        model, cfg=dataclasses.replace(model.cfg, enc_ring_dtype="bfloat16")
    )

    outs = []
    for m in (model, model16):
        engine = StreamingEngine(m, n_slots=2, beam_size=3,
                                 chunk_samples=CHUNK)
        s = engine.acquire_slot()
        for i in range(n_chunks - 1):
            engine.tick({s: audio[i * CHUNK : (i + 1) * CHUNK]})
        outs.append(engine.finalize_batch(
            {s: audio[(n_chunks - 1) * CHUNK :]}
        )[s])
    assert outs[1][0].dtype == outs[0][0].dtype
    assert list(map(int, outs[0][0])) == list(map(int, outs[1][0]))
    assert list(map(int, outs[0][1])) == list(map(int, outs[1][1]))


def test_fused_tick_matches_unfused(model, monkeypatch):
    """The one-program tick (_fused_tick: encode + all rounds in a single
    device program) must be token- and state-identical to the split
    per-round programs (SC_TPU_UNFUSED_TICK=1) across a multi-tick session
    with partials read every tick."""
    import os

    n_chunks = 5
    audio = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=7)

    def run(unfused: bool):
        if unfused:
            monkeypatch.setenv("SC_TPU_UNFUSED_TICK", "1")
        else:
            monkeypatch.delenv("SC_TPU_UNFUSED_TICK", raising=False)
        eng = StreamingEngine(model, n_slots=2, beam_size=3,
                              chunk_samples=CHUNK)
        assert eng._use_fused_tick is (not unfused)
        s0 = eng.acquire_slot()
        s1 = eng.acquire_slot()
        partials = []
        for i in range(n_chunks - 1):
            chunk = audio[i * CHUNK: (i + 1) * CHUNK]
            out = eng.tick({s0: chunk, s1: chunk})
            partials.append((tuple(out.get(s0, [])), tuple(out.get(s1, []))))
        res = eng.finalize(s0, audio[(n_chunks - 1) * CHUNK: n_chunks * CHUNK])
        return partials, tuple(int(t) for t in res[0])

    p_fused, f_fused = run(unfused=False)
    p_split, f_split = run(unfused=True)
    assert p_fused == p_split
    assert f_fused == f_split
