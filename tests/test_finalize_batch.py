"""Batched finalization parity: engine.finalize_batch must be token-exact
vs the per-slot single-stream finalizer (engine.finalize, itself golden-
tested against independent sessions in test_engine.py) for concurrent
finals of different lengths, tail sizes, and ages — including the
short-segment fallback and streams that keep ticking while others
finalize."""

import numpy as np
import pytest

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.serve.engine import StreamingEngine

CFG = tiny_config()
CHUNK = 8192


@pytest.fixture(scope="module")
def model():
    return ASRModel.random_init(CFG, seed=2)


def synth_audio(n_samples, seed, rate=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples) / rate
    f = 180 + 90 * (seed % 6)
    tone = 0.3 * np.sin(2 * np.pi * f * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
    return (tone + 0.05 * rng.randn(n_samples)).astype(np.float32)


def make_engine(model):
    return StreamingEngine(model, n_slots=6, beam_size=3,
                           chunk_samples=CHUNK)


def feed_engine(engine, slots, audios):
    """Feed full chunks; return {slot: tail_audio} for finalization."""
    max_full = max((len(a) - 1) // CHUNK for a in audios.values())
    for i in range(max_full):
        batch = {}
        for s in slots:
            a = audios[s]
            if (i + 1) * CHUNK < len(a):
                batch[s] = a[i * CHUNK : (i + 1) * CHUNK]
        if batch:
            engine.tick(batch)
    return {
        s: audios[s][((len(audios[s]) - 1) // CHUNK) * CHUNK :]
        for s in slots
    }


def assert_same(batched, single, label):
    yb, xb, sb = batched
    yg, xg, sg = single
    assert list(map(int, yb)) == list(map(int, yg)), f"{label} tokens"
    assert list(map(int, xb)) == list(map(int, xg)), f"{label} xpos"
    assert sb == pytest.approx(sg, rel=1e-4, abs=1e-4), f"{label} score"


def test_finalize_batch_matches_single_slot(model):
    """4 concurrent finals (different lengths + tails) == per-slot finalize
    on an identically-fed twin engine."""
    lengths = [3 * CHUNK + 1000, 2 * CHUNK + 5000, 3 * CHUNK, CHUNK + 17]
    audios = {k: synth_audio(n, seed=30 + k) for k, n in enumerate(lengths)}

    eng_b, eng_g = make_engine(model), make_engine(model)
    out_g = {}
    slots_b = [eng_b.acquire_slot() for _ in lengths]
    slots_g = [eng_g.acquire_slot() for _ in lengths]
    tails_b = feed_engine(eng_b, slots_b, {s: audios[k] for k, s in enumerate(slots_b)})
    tails_g = feed_engine(eng_g, slots_g, {s: audios[k] for k, s in enumerate(slots_g)})

    out_b = eng_b.finalize_batch(tails_b)
    for k, s in enumerate(slots_g):
        out_g[k] = eng_g.finalize(s, tails_g[s])

    assert set(out_b) == set(slots_b)
    for k, s in enumerate(slots_b):
        assert_same(out_b[s], out_g[k], f"stream {k}")
    assert not eng_b.c.active[slots_b].any()


def test_finalize_batch_short_utterance_fallback(model):
    """A sub-block utterance (npb==0 short-segment encoder path) in the same
    batch as a long one: both must match per-slot finalize."""
    a_long = synth_audio(2 * CHUNK + 3000, seed=40)
    a_short = synth_audio(6000, seed=41)  # < 1 chunk, never ticked

    eng_b, eng_g = make_engine(model), make_engine(model)
    res = {}
    for eng, out in ((eng_b, None), (eng_g, res)):
        s_long = eng.acquire_slot()
        s_short = eng.acquire_slot()
        eng.tick({s_long: a_long[:CHUNK]})
        eng.tick({s_long: a_long[CHUNK : 2 * CHUNK]})
        if out is None:
            out_b = eng.finalize_batch(
                {s_long: a_long[2 * CHUNK :], s_short: a_short}
            )
            b_long, b_short = out_b[s_long], out_b[s_short]
        else:
            out["long"] = eng.finalize(s_long, a_long[2 * CHUNK :])
            out["short"] = eng.finalize(s_short, a_short)
    assert_same(b_long, res["long"], "long")
    assert_same(b_short, res["short"], "short")


def test_finalize_batch_does_not_disturb_live_streams(model):
    """Finalizing some slots mid-flight must leave the others' eventual
    output identical to a twin engine that finalized per-slot."""
    a0 = synth_audio(2 * CHUNK + 100, seed=50)
    a1 = synth_audio(3 * CHUNK + 2000, seed=51)

    outs = []
    for use_batch in (True, False):
        eng = make_engine(model)
        s0 = eng.acquire_slot()
        s1 = eng.acquire_slot()
        eng.tick({s0: a0[:CHUNK], s1: a1[:CHUNK]})
        eng.tick({s0: a0[CHUNK : 2 * CHUNK], s1: a1[CHUNK : 2 * CHUNK]})
        if use_batch:
            f0 = eng.finalize_batch({s0: a0[2 * CHUNK :]})[s0]
        else:
            f0 = eng.finalize(s0, a0[2 * CHUNK :])
        eng.tick({s1: a1[2 * CHUNK : 3 * CHUNK]})
        if use_batch:
            f1 = eng.finalize_batch({s1: a1[3 * CHUNK :]})[s1]
        else:
            f1 = eng.finalize(s1, a1[3 * CHUNK :])
        outs.append((f0, f1))
    assert_same(outs[0][0], outs[1][0], "s0")
    assert_same(outs[0][1], outs[1][1], "s1")


def test_finalize_batch_slot_reuse(model):
    """Slots reset by finalize_batch must behave like fresh sessions."""
    a = synth_audio(CHUNK + 500, seed=60)
    eng = make_engine(model)
    s = eng.acquire_slot()
    eng.tick({s: a[:CHUNK]})
    first = eng.finalize_batch({s: a[CHUNK:]})[s]
    s2 = eng.acquire_slot()
    assert s2 == s
    eng.tick({s2: a[:CHUNK]})
    second = eng.finalize_batch({s2: a[CHUNK:]})[s2]
    assert_same(second, first, "reuse")


def test_finalize_batch_long_stream_token_burst(model):
    """Repetitive audio emits most tokens in the FINAL block (block_final
    disables BBD): the batched final round must not truncate at the
    streaming-path l_bound bucket (regression: paused at ylen=127)."""
    n_chunks = 12
    t = np.arange(n_chunks * CHUNK + 3000) / 16000
    rng = np.random.RandomState(9)
    a = np.clip(0.4 * np.sin(2 * np.pi * 250 * t)
                + 0.05 * rng.randn(len(t)), -1, 1).astype(np.float32)

    outs = []
    for use_batch in (True, False):
        eng = make_engine(model)
        s = eng.acquire_slot()
        for i in range(n_chunks):
            eng.tick({s: a[i * CHUNK : (i + 1) * CHUNK]})
        if use_batch:
            outs.append(eng.finalize_batch({s: a[n_chunks * CHUNK :]})[s])
        else:
            outs.append(eng.finalize(s, a[n_chunks * CHUNK :]))
    assert len(outs[0][0]) > 100  # the burst actually happened
    assert_same(outs[0], outs[1], "long")


def test_finalize_churn_generations(model):
    """Steady-state churn (the serving/bench load): slots finalize and are
    re-acquired across several generations WITHOUT any decoder-cache reset
    (rows are lane-resident and appended before they are read). Every
    generation's transcript must equal a fresh-engine decode of the same
    audio."""
    eng = make_engine(model)
    golden = {}
    for gen in range(3):
        seeds = [70 + gen, 80 + gen]
        slots = [eng.acquire_slot() for _ in seeds]
        audios = {
            s: synth_audio((3 + gen) * CHUNK + 700, seed=seed)
            for s, seed in zip(slots, seeds)
        }
        tails = feed_engine(eng, slots, audios)
        outs = eng.finalize_batch(tails)
        for s, seed in zip(slots, seeds):
            if seed not in golden:
                fresh = make_engine(model)
                fs = fresh.acquire_slot()
                ftails = feed_engine(fresh, [fs], {fs: audios[s]})
                golden[seed] = fresh.finalize_batch(ftails)[fs]
            assert_same(outs[s], golden[seed], f"gen{gen} seed{seed}")


def test_finalize_near_ring_capacity_zone():
    """Regression: when finalization extends visibility into the last
    EXTCAP frames of the encoder ring (vis > ECAP-EXTCAP), the
    new-frames gather must still start at frame `vis` — a clipped
    dynamic-slice start made ctc_extend/extend_memory_cache scatter the
    WRONG frames there (compact path only; the single-stream finalizer
    slices the buffer directly and is exempt, which this parity check
    exploits)."""
    cfg = tiny_config(max_enc_frames=56)
    m = ASRModel.random_init(cfg, seed=2)
    # 7 full chunks hit the tick stall plateau (buf=42 at ECAP=56); the
    # 5000-sample TAIL then pushes the final buf to ~56, so the drain's
    # last gather starts at 54 > ECAP-EXTCAP=48 — deep inside the zone
    # (verified: max_start=54; 6000 samples would overflow the ring).
    n_chunks = 7
    tail_len = 5000
    a = synth_audio(n_chunks * CHUNK + tail_len, seed=4)
    res = []
    for use_batch in (True, False):
        eng = StreamingEngine(m, n_slots=1, beam_size=3, chunk_samples=CHUNK)
        s = eng.acquire_slot()
        for i in range(n_chunks):
            eng.tick({s: a[i * CHUNK : (i + 1) * CHUNK]})
        if use_batch:
            res.append(eng.finalize_batch({s: a[n_chunks * CHUNK :]})[s])
            # NOT vacuous: the engine's own drain-schedule sim must report a
            # gather start strictly inside the clip zone, and the compact
            # path (not the single-stream fallback) must have run.
            zone = eng.ECAP - eng.EXTCAP
            assert eng._last_drain_max_start > zone, (
                f"drain gathers peaked at start={eng._last_drain_max_start} "
                f"<= {zone}: the clip-regression zone was never exercised"
            )
        else:
            res.append(eng.finalize(s, a[n_chunks * CHUNK :]))
    # The final state must actually have entered the zone.
    assert len(res[0][0]) > 40
    # Tokens/xpos must be identical; the score is compared at a slightly
    # looser tolerance — the two paths run differently-compiled programs
    # (compact capacity-padded vs exact-length single-stream) and fp32
    # reassociation across ~50 frames of CTC sums drifts the total by
    # O(1e-4) relative.
    yb, xb, sb = res[0]
    yg, xg, sg = res[1]
    assert list(map(int, yb)) == list(map(int, yg))
    assert list(map(int, xb)) == list(map(int, xg))
    assert sb == pytest.approx(sg, rel=2e-3)


def test_finalize_accepts_int16_tail(model):
    """engine.finalize must normalize an int16 PCM tail exactly like
    tick()/finalize_batch() (regression: it concatenated raw +/-32767
    samples with the normalized wave carry)."""
    a = synth_audio(2 * CHUNK + 900, seed=31)
    res = []
    for as_i16 in (False, True):
        eng = make_engine(model)
        s = eng.acquire_slot()
        for i in range(2):
            eng.tick({s: a[i * CHUNK : (i + 1) * CHUNK]})
        tail = a[2 * CHUNK :]
        if as_i16:
            tail = (tail * 32767.0).astype(np.int16)
        res.append(eng.finalize(s, tail))
    assert list(map(int, res[0][0])) == list(map(int, res[1][0]))
