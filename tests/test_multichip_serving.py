"""Multi-chip serving: the engine sharded over a dp mesh must produce the
same outputs as unsharded (virtual 8-device CPU mesh), plus fault isolation:
a pathological stream must not perturb its batch neighbors."""

import numpy as np
import pytest

import jax

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.parallel.mesh import make_mesh
from speechcatcher_tpu.parallel.serve_sharding import shard_engine
from speechcatcher_tpu.serve.engine import StreamingEngine

from test_engine import final_to_ids, synth_audio

CHUNK = 8192
CFG = tiny_config()


def run_engine(engine, audios, n_chunks):
    slots = [engine.acquire_slot() for _ in range(len(audios))]
    for i in range(n_chunks - 1):
        engine.tick({
            s: audios[k][i * CHUNK : (i + 1) * CHUNK]
            for k, s in enumerate(slots)
        })
    return [
        engine.finalize(s, audios[k][(n_chunks - 1) * CHUNK :])
        for k, s in enumerate(slots)
    ]


def test_dp_sharded_engine_matches_unsharded():
    assert len(jax.devices()) >= 8
    model = ASRModel.random_init(CFG, seed=6)
    n_chunks = 3
    audios = [synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=30 + k)
              for k in range(4)]

    plain = StreamingEngine(model, n_slots=4, beam_size=2,
                            chunk_samples=CHUNK)
    golden = run_engine(plain, audios, n_chunks)

    model2 = ASRModel.random_init(CFG, seed=6)
    sharded = StreamingEngine(model2, n_slots=4, beam_size=2,
                              chunk_samples=CHUNK)
    mesh = make_mesh(4, tp=1)
    sharded = shard_engine(sharded, mesh)
    with jax.set_mesh(mesh):
        got = run_engine(sharded, audios, n_chunks)

    for k in range(4):
        assert final_to_ids(model, got[k][0], got[k][1]) == final_to_ids(
            model, golden[k][0], golden[k][1]
        ), f"stream {k}"


def test_bad_stream_does_not_poison_batch():
    """NaN/inf audio in one slot must leave the other slots' outputs
    untouched (session-level isolation, SURVEY §5.3)."""
    model = ASRModel.random_init(CFG, seed=7)
    n_chunks = 2
    good = synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=40)

    solo = StreamingEngine(model, n_slots=1, beam_size=2,
                           chunk_samples=CHUNK)
    golden = run_engine(solo, [good], n_chunks)[0]

    engine = StreamingEngine(model, n_slots=2, beam_size=2,
                             chunk_samples=CHUNK)
    s_good = engine.acquire_slot()
    s_bad = engine.acquire_slot()
    bad = np.full(n_chunks * CHUNK + 160, np.nan, np.float32)
    bad[::7] = np.inf
    for i in range(n_chunks - 1):
        engine.tick({
            s_good: good[i * CHUNK : (i + 1) * CHUNK],
            s_bad: bad[i * CHUNK : (i + 1) * CHUNK],
        })
    out_good = engine.finalize(s_good, good[(n_chunks - 1) * CHUNK :])

    assert final_to_ids(model, out_good[0], out_good[1]) == final_to_ids(
        model, golden[0], golden[1]
    )
