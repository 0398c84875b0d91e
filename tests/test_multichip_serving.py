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


# ---------------------------------------------------------------------------
# Multi-host (DCN) mesh layout — SURVEY §2.9's DCN half. No multi-host
# runtime exists in CI, so the layout rule (tp never spans hosts; dp
# enumerates host-major) is tested as a pure function of a fake global
# device list, plus a real pjit run over the grid built from the local
# virtual devices.
# ---------------------------------------------------------------------------

class _FakeDev:
    def __init__(self, pid, local_id):
        self.process_index = pid
        self.id = pid * 100 + local_id

    def __repr__(self):
        return f"dev(p{self.process_index}/{self.id})"


def test_hybrid_grid_tp_never_spans_hosts():
    from speechcatcher_tpu.parallel.mesh import hybrid_device_grid

    devs = [_FakeDev(p, i) for p in range(4) for i in range(8)]
    grid = hybrid_device_grid(devs, tp=4)
    assert grid.shape == (8, 4)  # dp = 32/4
    for row in grid:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, f"tp group spans hosts: {row}"
    # dp axis is host-major: each host's rows are contiguous.
    row_proc = [row[0].process_index for row in grid]
    assert row_proc == sorted(row_proc)
    # Every device appears exactly once.
    assert len({d.id for row in grid for d in row}) == 32


def test_hybrid_grid_rejects_tp_spanning_hosts():
    from speechcatcher_tpu.parallel.mesh import hybrid_device_grid

    devs = [_FakeDev(p, i) for p in range(4) for i in range(2)]
    with pytest.raises(ValueError, match="span hosts"):
        hybrid_device_grid(devs, tp=4)  # 2 local devices < tp


def test_hybrid_grid_rejects_ragged_hosts():
    from speechcatcher_tpu.parallel.mesh import hybrid_device_grid

    devs = [_FakeDev(0, i) for i in range(4)] + [_FakeDev(1, 0)]
    with pytest.raises(ValueError, match="unequal"):
        hybrid_device_grid(devs, tp=1)


def test_hybrid_mesh_executes_on_local_devices():
    """make_hybrid_mesh degenerates to a single-host (dp, tp) mesh here
    (all virtual devices share process_index 0) and must run a sharded
    computation end-to-end."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speechcatcher_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(tp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (4, 2)
    x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    got = jax.jit(lambda a: (a * 2).sum(axis=1))(xs)
    np.testing.assert_allclose(np.asarray(got), (x * 2).sum(axis=1))


def test_initialize_distributed_validates_args():
    from speechcatcher_tpu.parallel.mesh import initialize_distributed

    # No coordinator → single-host no-op.
    assert initialize_distributed(None, None, None) is False
    with pytest.raises(ValueError, match="requires"):
        initialize_distributed("host0:1234", None, None)
