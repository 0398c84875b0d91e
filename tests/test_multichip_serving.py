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

def test_tp_sharded_forward_matches_unsharded():
    """Tensor-parallel (tp=2) training forward must equal single-device
    numerics: XLA GSPMD partitions the column/row-parallel matmuls and
    inserts the psum on row-parallel outputs."""
    import jax.numpy as jnp

    from speechcatcher_tpu.models.ctc import ctc_log_softmax
    from speechcatcher_tpu.models.encoder import encoder_forward_train
    from speechcatcher_tpu.parallel.mesh import shard_batch, shard_params

    assert len(jax.devices()) >= 8
    cfg = tiny_config(n_mels=20)
    model = ASRModel.random_init(cfg, seed=12)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(4, 170, cfg.n_mels).astype(np.float32))
    feat_lens = jnp.full((4,), 170, np.int32)

    def fwd(params, feats, feat_lens):
        enc, lens = encoder_forward_train(params["encoder"], feats,
                                          feat_lens, cfg)
        return ctc_log_softmax(params["ctc"], enc), lens

    ref_logp, ref_lens = jax.jit(fwd)(model.params, feats, feat_lens)

    mesh = make_mesh(8, tp=2)
    with jax.set_mesh(mesh):
        params = shard_params(model.params, mesh)
        sfeats = shard_batch(feats, mesh)
        slens = shard_batch(feat_lens, mesh)
        got_logp, got_lens = jax.jit(fwd)(params, sfeats, slens)

    np.testing.assert_array_equal(np.asarray(ref_lens), np.asarray(got_lens))
    np.testing.assert_allclose(
        np.asarray(ref_logp), np.asarray(got_logp), atol=2e-4, rtol=2e-4
    )


def test_tp_sharded_engine_matches_unsharded():
    """A dp2×tp2-sharded serving engine must decode token-identically to the
    unsharded engine (one tick + finalize per stream)."""
    assert len(jax.devices()) >= 8
    model = ASRModel.random_init(CFG, seed=13)
    n_chunks = 2
    audios = [synth_audio(n_chunks * CHUNK / 16000 + 0.01, seed=50 + k)
              for k in range(2)]

    plain = StreamingEngine(model, n_slots=2, beam_size=2,
                            chunk_samples=CHUNK)
    golden = run_engine(plain, audios, n_chunks)

    model2 = ASRModel.random_init(CFG, seed=13)
    sharded = StreamingEngine(model2, n_slots=2, beam_size=2,
                              chunk_samples=CHUNK)
    mesh = make_mesh(4, tp=2)
    sharded = shard_engine(sharded, mesh)
    with jax.set_mesh(mesh):
        got = run_engine(sharded, audios, n_chunks)

    from test_engine import final_to_ids as fti
    for k in range(2):
        assert fti(model, got[k][0], got[k][1]) == fti(
            model, golden[k][0], golden[k][1]
        ), f"stream {k}"
