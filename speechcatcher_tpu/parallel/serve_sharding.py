"""Multi-chip serving: shard the streaming engine's slot axis over a mesh.

The serving hot path is pure data parallelism (SURVEY §2.8-2.9): every
per-stream buffer shards along its slot axis, weights replicate, and the
tick programs run SPMD with zero cross-chip traffic — XLA partitions the
already-batched kernels, so n chips serve n× the slots at the same tick
latency.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speechcatcher_tpu.decode.beam_search import BeamArrays
from speechcatcher_tpu.decode.ctc_prefix import CTCScorerState
from speechcatcher_tpu.models.decoder import DecoderCache
from speechcatcher_tpu.serve.engine import EngineBuffers, StreamingEngine


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_arrays(a: BeamArrays, mesh: Mesh) -> BeamArrays:
    s = P("dp")
    return BeamArrays(
        yseq=_put(a.yseq, mesh, s),
        xpos=_put(a.xpos, mesh, s),
        lane=_put(a.lane, mesh, s),
        ylen=_put(a.ylen, mesh, s),
        score=_put(a.score, mesh, s),
        score_dec=_put(a.score_dec, mesh, s),
        score_ctc=_put(a.score_ctc, mesh, s),
        ctc=CTCScorerState(
            logp=_put(a.ctc.logp, mesh, s),
            enc_len=_put(a.ctc.enc_len, mesh, s),
            r=_put(a.ctc.r, mesh, s),
            s=_put(a.ctc.s, mesh, s),
        ),
    )


def shard_engine(engine: StreamingEngine, mesh: Mesh) -> StreamingEngine:
    """Place all engine state on the mesh (slot axis over "dp"; weights
    replicated for pure dp, tensor-parallel over "tp" when the mesh has a
    tp axis > 1 — column/row-parallel rules from parallel.mesh). n_slots
    must divide the dp size. Host bookkeeping is unchanged — ticks dispatch
    the same programs, now SPMD-partitioned."""
    dp = mesh.shape["dp"]
    assert engine.S % dp == 0, (engine.S, dp)
    tp = mesh.shape.get("tp", 1)

    rep = P()
    if tp > 1:
        from speechcatcher_tpu.parallel.mesh import shard_params

        engine.model.params = shard_params(engine.model.params, mesh)
    else:
        engine.model.params = jax.tree.map(
            lambda x: _put(x, mesh, rep), engine.model.params
        )
    engine.model.enc_pe = _put(engine.model.enc_pe, mesh, rep)
    engine.model.dec_pe = _put(engine.model.dec_pe, mesh, rep)
    fe = engine.model.frontend
    fe.window = _put(fe.window, mesh, rep)
    fe.mel_fb = _put(fe.mel_fb, mesh, rep)
    fe.mean = _put(fe.mean, mesh, rep)
    fe.inv_std = _put(fe.inv_std, mesh, rep)

    engine.buffers = EngineBuffers(
        wave=_put(engine.buffers.wave, mesh, P("dp")),
        raw=_put(engine.buffers.raw, mesh, P("dp")),
        post=_put(engine.buffers.post, mesh, P("dp")),
        prev_addin=_put(engine.buffers.prev_addin, mesh, P("dp")),
        past_ctx=_put(engine.buffers.past_ctx, mesh, P("dp")),
        enc_out=_put(engine.buffers.enc_out, mesh, P("dp")),
    )
    engine.arrays = _shard_arrays(engine.arrays, mesh)
    engine.prev_arrays = _shard_arrays(engine.prev_arrays, mesh)
    # The activation cache is (L, S·B, Lmax, d): shard the flat hypothesis
    # axis (slot-major, so B-row groups stay on their slot's shard).
    engine.dec_cache = DecoderCache(
        h=_put(engine.dec_cache.h, mesh, P(None, "dp")),
    )
    # (cross-attention memory K/V: no stored state — rematerialized from
    # the dp-sharded enc_out ring inside the decode programs)
    engine.prev_valid_dev = _put(engine.prev_valid_dev, mesh, P("dp"))
    engine.process_idx_dev = _put(engine.process_idx_dev, mesh, P("dp"))
    engine.output_index_dev = _put(engine.output_index_dev, mesh, P("dp"))
    return engine
