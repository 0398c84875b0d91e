"""Batched multi-stream streaming engine — S concurrent sessions, one chip.

The reference serves one live stream per preloaded model replica (one per
CPU core; speechcatcher_server.py:331-357). Here S streams share ONE weight
copy and advance in lockstep ticks: every device kernel is batched over the
stream axis with fixed capacity shapes and per-stream length/validity masks,
so one jit-compiled program per tick serves all sessions.

Architecture:
- All length bookkeeping (buffer fills, block counts, beam step counters) is
  host-side numpy — lengths are data-independent functions of per-stream
  chunk counts, so nothing about control flow requires device readback
  except the per-step EOS/BBD flags (one small transfer per beam step for
  the WHOLE batch).
- Device state is capacity-padded: waveform ring, pre/post-subsample feature
  buffers, encoder-output ring, CTC log-prob ring + forward variables, beam
  arrays, decoder KV caches.
- Per-stream divergence (different ages, different beam progress) is handled
  by masked lockstep: beam_step computes all streams, jnp.where selects
  which advance; BBD rollback and block-end rewind restore per-stream
  snapshots (free: immutable arrays).
- Finals are rare (once per utterance), so a stream's final chunk is decoded
  by extracting its slot into the parity-tested single-stream path
  (decode/beam_search.py) and resetting the slot.

Streaming (non-final) blocks are always full (block_size frames), which the
tick kernels exploit; partial-block handling lives only in the final path.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.decode.beam_search import (
    BeamArrays,
    BlockDecodeState,
    BlockwiseSynchronousBeamSearch,
    decode_block_device,
    init_beam_arrays,
)
from speechcatcher_tpu.decode.ctc_prefix import CTCScorerState, ctc_extend
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.models.ctc import ctc_log_softmax
from speechcatcher_tpu.models.decoder import (
    DecoderCache,
    init_decoder_cache,
)
from speechcatcher_tpu.models.encoder import (
    EncoderState,
    apply_layers_infer,
    block_attention_mask,
    conv2d_subsample,
)
from speechcatcher_tpu.ops.layers import layer_norm, onehot_contract
from speechcatcher_tpu.ops.frontend import frame_signal
from speechcatcher_tpu.serve.wire import mulaw_decode as _mulaw_decode

logger = logging.getLogger(__name__)

# uint8 wire expansion table: one row per mu-law code, computed by the
# SAME host function tests/clients use, so device ingest == host decode
# bit-for-bit (see _fused_encode).
_MULAW_TABLE = _mulaw_decode(np.arange(256, dtype=np.uint8))


class EngineBuffers(NamedTuple):
    """Device-resident per-stream buffers (fixed capacities)."""

    wave: jnp.ndarray        # (S, WCAP) waveform carry
    raw: jnp.ndarray         # (S, RCAP, n_mels) pre-subsample feature carry
    post: jnp.ndarray        # (S, PCAP, d) post-subsample frame carry
    prev_addin: jnp.ndarray  # (S, 1, d)
    past_ctx: jnp.ndarray    # (S, L, d)
    enc_out: jnp.ndarray     # (S, ECAP, d) emitted encoder frames


def _roll_left(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Per-stream circular left roll along axis 1. shift: (S,) int32.

    Implemented as a vmapped dynamic_slice over a doubled buffer: one
    contiguous per-stream row DMA. The index-arithmetic take_along_axis
    formulation lowers to an element gather, which costs ~70 ms per ~3M
    elements on TPU — the rolls were the dominant cost of the whole encode
    program (~350 ms/tick at S=176)."""
    n = x.shape[1]
    shift = jnp.mod(shift, n).astype(jnp.int32)
    xx = jnp.concatenate([x, x], axis=1)
    return jax.vmap(
        lambda xi, s: jax.lax.dynamic_slice_in_dim(xi, s, n, axis=0)
    )(xx, shift)


def _scatter_append(
    buf: jnp.ndarray,      # (S, CAP, D)
    new: jnp.ndarray,      # (S, N, D)
    offset: jnp.ndarray,   # (S,)
    n_valid: jnp.ndarray,  # (S,)
) -> jnp.ndarray:
    """Append new[:, :n_valid] at per-stream offsets (masked one-hot scatter)."""
    cap = buf.shape[1]
    n = new.shape[1]
    from speechcatcher_tpu.ops.pallas.ring_append import (
        ring_append_enabled,
        ring_append_interpret,
        ring_append_rows,
    )

    if ring_append_enabled() and cap % 64 == 0:
        # In-place windowed append: only the touched 64-row windows move
        # instead of the full ring (see ops/pallas/ring_append.py). The
        # big ring this hits is enc_out (S, ECAP_PAD, d) — ECAP_PAD is
        # rounded to a 64 multiple at allocation; the small frontend
        # carries keep the one-hot path (their capacities are odd and
        # their cost is noise).
        return ring_append_rows(
            buf[None], new[None].astype(buf.dtype),
            offset.astype(jnp.int32), n_valid.astype(jnp.int32),
            interpret=ring_append_interpret(),
        )[0]
    pos = offset[:, None] + jnp.arange(n)[None, :]
    pos = jnp.clip(pos, 0, cap - 1)
    onehot = jax.nn.one_hot(pos, cap, dtype=buf.dtype)         # (S, N, CAP)
    onehot = onehot * (jnp.arange(n)[None, :] < n_valid[:, None])[..., None]
    written = jnp.clip(onehot.sum(axis=1), 0.0, 1.0)            # (S, CAP)
    # onehot_contract: the scatter writes values bit-exactly without
    # Precision.HIGHEST (whose 6-pass decomposition of this outer-product-
    # shaped contraction is pathologically slow on TPU — see ops/layers.py).
    return (
        buf * (1.0 - written[:, :, None])
        + onehot_contract("snd,snc->scd", new, onehot).astype(buf.dtype)
    )


def _sel0(m: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """where over leading stream axis."""
    return jnp.where(m.reshape((m.shape[0],) + (1,) * (x.ndim - 1)), x, y)


def _select_buffers(mask: np.ndarray, a: EngineBuffers,
                    b: EngineBuffers) -> EngineBuffers:
    """Reset the small frontend carries; the (S, ECAP_PAD, d) enc_out ring
    is excluded — its only readers (_gather_new_frames feeding ctc_extend,
    bounded by n_ext; the enc_len-masked cross-attention rematerialization;
    and the drain loop bounded by buf_len) never reach rows a fresh
    session hasn't rewritten, and
    buf_len is host state reset on acquire. The caller passes an empty
    enc_out placeholder so the untouched ring never crosses the program
    boundary (a pass-through output would cost a full-ring copy)."""
    m = jnp.asarray(mask)
    sel = {f: _sel0(m, getattr(a, f), getattr(b, f))
           for f in a._fields if f != "enc_out"}
    return b._replace(**sel)


def _select_arrays(mask: np.ndarray, a: BeamArrays, b: BeamArrays) -> BeamArrays:
    """Per-stream select over every BeamArrays field (all lead with S; the
    decoder KV cache is lane-resident and never selected — fresh sessions
    overwrite rows before reading them). Mixed live/snapshot CTC rings
    select to the empty snapshot ring (see beam_search.select_arrays).

    The CTC log-prob ring is NOT reset either: every read is bounded by
    ctc.enc_len (candidate gathers, the survivor recursion, _fill_blank's
    cumulative sums all stop at the valid frame count, and enc_len itself
    IS reset here), a fresh session's appends overwrite [0, enc_len)
    before any read, and ctc_extend sanitizes appended values to finite
    LOGZERO — so stale rows are unreachable. Zeroing it was a full
    (S, V, Tcap) rewrite per reset (~3.5 ms/tick at S=288)."""
    m = jnp.asarray(mask)
    if a.ctc.logp.shape == b.ctc.logp.shape:
        logp = b.ctc.logp
    else:
        logp = a.ctc.logp if a.ctc.logp.size == 0 else b.ctc.logp
    return BeamArrays(
        yseq=_sel0(m, a.yseq, b.yseq),
        xpos=_sel0(m, a.xpos, b.xpos),
        lane=_sel0(m, a.lane, b.lane),
        ylen=_sel0(m, a.ylen, b.ylen),
        score=_sel0(m, a.score, b.score),
        score_dec=_sel0(m, a.score_dec, b.score_dec),
        score_ctc=_sel0(m, a.score_ctc, b.score_ctc),
        ctc=CTCScorerState(
            logp=logp,
            enc_len=_sel0(m, a.ctc.enc_len, b.ctc.enc_len),
            r=_sel0(m, a.ctc.r, b.ctc.r),
            s=_sel0(m, a.ctc.s, b.ctc.s),
        ),
    )


# ---------------------------------------------------------------------------
# Tick kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def _tick_frontend(
    wave: jnp.ndarray,        # (S, WCAP)
    audio: jnp.ndarray,       # (S, A)
    wave_len: jnp.ndarray,    # (S,)
    trim_start: jnp.ndarray,  # (S,) 0 (first chunk) or trim
    keep_from: jnp.ndarray,   # (S,) combined index where the new buffer starts
    keep_len: jnp.ndarray,    # (S,) carry length to store
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    n_fft: int,
    hop: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform-carry concat + log-mel + per-stream trim alignment.

    Returns (feats (S, FCAP, n_mels) valid from index 0, new wave (S, WCAP)).
    """
    s, wcap = wave.shape
    a = audio.shape[1]
    combined = jnp.concatenate([wave, audio], axis=1)           # (S, WCAP+A)
    combined = _roll_left(combined, wcap - wave_len)            # data at 0

    frames = frame_signal(combined, n_fft, hop) * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.einsum("stf,fm->stm", power, mel_fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    feats = (jnp.log(jnp.clip(mel, min=1e-10)) - mean) * inv_std

    feats = _roll_left(feats, trim_start)                       # valid at 0
    # Store the carry RIGHT-aligned so next tick's (wcap - wave_len) roll
    # lands the data at position 0 of the combined window.
    shift = keep_from + keep_len - wcap
    new_wave = _roll_left(combined, shift)[:, :wcap]
    return feats, new_wave


@functools.partial(jax.jit, static_argnames=("cfg",))
def _tick_subsample(
    p_embed,
    raw: jnp.ndarray,         # (S, RCAP, n_mels)
    feats: jnp.ndarray,       # (S, FCAP, n_mels)
    raw_len: jnp.ndarray,     # (S,)
    n_feats: jnp.ndarray,     # (S,) valid new frames
    consumed: jnp.ndarray,    # (S,) raw frames consumed by the conv
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append feats to the raw carry, run conv subsampling over capacity.

    Returns (sub (S, SUBCAP, d) valid per host-computed n_sub, new raw).
    The conv is translation-invariant with VALID padding, so running it over
    the padded capacity yields exactly the frames the reference gets from
    slicing first (subsampling.py:71-106).
    """
    raw = _scatter_append(raw, feats, raw_len, n_feats)
    sub = conv2d_subsample(p_embed, raw, cfg.input_layer)       # (S, RCAP', d)
    new_raw = _roll_left(raw, consumed)
    return sub, new_raw


@jax.jit
def _append_post(post, sub, post_len, n_sub):
    return _scatter_append(post, sub, post_len, n_sub)


@functools.partial(jax.jit, static_argnames=("cfg", "maxb"))
def _tick_blocks(
    params,
    pe: jnp.ndarray,
    post: jnp.ndarray,        # (S, PCAP, d) — new frames already appended
    bn: jnp.ndarray,          # (S,) blocks to process this tick
    npb: jnp.ndarray,         # (S,)
    has_prev: jnp.ndarray,    # (S,) bool
    has_past: jnp.ndarray,    # (S,) bool
    prev_addin: jnp.ndarray,  # (S, 1, d)
    past_ctx: jnp.ndarray,    # (S, L, d)
    enc_out: jnp.ndarray,     # (S, ECAP, d)
    buf_len: jnp.ndarray,     # (S,)
    cfg: ModelConfig,
    maxb: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble + run up to `maxb` FULL blocks per stream (streaming path).

    Returns (new post, new prev_addin, new past_ctx, new enc_out). Length
    bookkeeping (post_len/npb/buf_len updates) happens on the host.
    """
    s = post.shape[0]
    d = cfg.encoder_dim
    bs, hop, la = cfg.block_size, cfg.hop_size, cfg.look_ahead
    offset = bs - la - hop

    # Assemble blocks i = 0..maxb-1 from static offsets i*hop (full blocks).
    chunks = []
    addins = []
    for i in range(maxb):
        blk = jax.lax.dynamic_slice_in_dim(post, i * hop, bs, axis=1)
        if cfg.init_average:
            addin = jnp.mean(blk, axis=1, keepdims=True)
        else:
            addin = jnp.max(blk, axis=1, keepdims=True)
        if cfg.ctx_pos_enc:
            pe_a = pe[jnp.clip(npb + i, 0, pe.shape[0] - 1)]
            addin = addin * math.sqrt(d) + pe_a[:, None, :]
        addins.append(addin)
        # Chunk positions: offset = i*hop + hop*npb per stream. Contiguous
        # PE window per stream → vmapped dynamic_slice, not a gather.
        start = jnp.clip(i * hop + hop * npb, 0, pe.shape[0] - bs)
        pe_c = jax.vmap(
            lambda s0: jax.lax.dynamic_slice_in_dim(pe, s0, bs, axis=0)
        )(start.astype(jnp.int32))                              # (S, bs, d)
        chunks.append(blk * math.sqrt(d) + pe_c)

    first_prev = jnp.where(has_prev[:, None, None], prev_addin, addins[0])
    prev_list = [first_prev] + addins[:-1]
    xs_chunk = jnp.stack(
        [
            jnp.concatenate([prev_list[i], chunks[i], addins[i]], axis=1)
            for i in range(maxb)
        ],
        axis=1,
    )  # (S, maxb, bs+2, d)

    any_blocks = bn > 0
    last_idx = jnp.clip(bn - 1, 0, maxb - 1)
    mask = jnp.asarray(block_attention_mask(bs))
    ys_chunk, next_ctx_all = apply_layers_infer(
        params["encoder"], xs_chunk, mask, past_ctx, has_past,
        cfg.encoder_heads, last_block=last_idx.astype(jnp.int32),
        layer_kind=cfg.encoder_type, pos_emb=pe[None, : bs + 2, :],
    )
    ys_chunk = ys_chunk[:, :, 1 : bs + 1, :]                    # (S,maxb,bs,d)

    # Per-stream context/addin updates use the LAST VALID block (bn-1);
    # streams with bn == 0 keep their previous state.
    new_prev_addin = jnp.where(
        any_blocks[:, None, None],
        jnp.take_along_axis(
            jnp.concatenate([a[:, None] for a in addins], axis=1),
            last_idx[:, None, None, None].repeat(d, 3),
            axis=1,
        )[:, 0],
        prev_addin,
    )
    new_past_ctx = jnp.where(
        any_blocks[:, None, None], next_ctx_all, past_ctx
    )

    # Emission staging: first-chunk layout keeps the leading `offset` frames
    # of block 0 (reference encoder :507-513).
    emitcap = offset + maxb * hop
    lead = ys_chunk[:, 0, 0:offset, :]                          # (S,offset,d)
    body = jnp.concatenate(
        [ys_chunk[:, i, offset : offset + hop, :] for i in range(maxb)],
        axis=1,
    )                                                            # (S,maxb*hop,d)
    first = npb == 0
    stage_first = jnp.concatenate([lead, body], axis=1)
    stage_later = jnp.concatenate(
        [body, jnp.zeros((s, offset, d), post.dtype)], axis=1
    )
    staging = jnp.where(first[:, None, None], stage_first, stage_later)
    if cfg.normalize_before:
        staging = layer_norm(params["encoder"]["after_norm"], staging)

    emitted = jnp.where(
        any_blocks, bn * hop + jnp.where(first, offset, 0), 0
    )
    new_enc_out = _scatter_append(enc_out, staging, buf_len, emitted)

    new_post = _roll_left(post, bn * hop)
    return new_post, new_prev_addin, new_past_ctx, new_enc_out


def _final_frontend(
    wave: jnp.ndarray,        # (S, WCAP)
    audio: jnp.ndarray,       # (S, A) zero-padded final chunks
    wave_len: jnp.ndarray,    # (S,)
    total_p: jnp.ndarray,     # (S,) max(wave_len+alen, win_length)
    trim_start: jnp.ndarray,  # (S,)
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    n_fft: int,
    hop: int,
    fcap: int,
) -> jnp.ndarray:
    """Exact-length final frontend, batched over capacity buffers.

    The final chunk runs the exact-length STFT (reference apply_frontend
    final: speech2text_streaming.py:297-339): center=True reflect padding at
    the TRUE end of the audio, zero-pad to win_length for short tails, no
    trailing trim. Per-stream reflection inside the fixed-capacity buffer is
    a computed gather: sample j of frame t reads index
    reflect(t*hop - pad + j, total_p)."""
    s, wcap = wave.shape
    combined = jnp.concatenate([wave, audio], axis=1)   # (S, WCAP+A)
    combined = _roll_left(combined, wcap - wave_len)    # data at 0
    n = combined.shape[1]
    # Zero beyond the valid samples: emulates the zero-pad-to-win_length of
    # short finals and keeps the reflection region clean.
    combined = jnp.where(
        jnp.arange(n)[None, :] < total_p[:, None], combined, 0.0
    )
    pad = n_fft // 2
    # Reflection via data movement, not a computed gather (the per-sample
    # reflect-index gather profiled at ~20 ms per flush): the right
    # reflection only needs the reversed pre-end tail written AT each
    # stream's end position — a contiguous vmapped slice+update — and the
    # left reflection is static (data starts at index 0 for every stream).
    combined = jnp.concatenate(
        [combined, jnp.zeros((s, pad), combined.dtype)], axis=1
    )                                                    # (S, n+pad)
    # Slice start total_p-1-pad is nonnegative for every reachable input:
    # total_p = max(wave_len + alen, win_length) ≥ win_length > pad
    # (win_length > n_fft//2 is asserted at engine init), so the clamp
    # below never engages and the written tail is exactly the reversed
    # pre-end reflection x[tp-2], x[tp-3], …
    tail = jax.vmap(
        lambda c, st: jax.lax.dynamic_slice_in_dim(c, st, pad, 0)
    )(combined, jnp.maximum(total_p - 1 - pad, 0))       # (S, pad)
    tail = tail[:, ::-1]                                 # x[tp-2], x[tp-3]...
    combined = jax.vmap(
        lambda c, t_, st: jax.lax.dynamic_update_slice_in_dim(c, t_, st, 0)
    )(combined, tail, total_p)
    left = combined[:, 1 : pad + 1][:, ::-1]             # x[-i] = x[i]
    padded = jnp.concatenate([left, combined], axis=1)   # (S, pad+n+pad)
    frames = jnp.stack(
        [padded[:, t * hop : t * hop + n_fft] for t in range(fcap)], axis=1
    )                                                    # (S, fcap, n_fft)
    frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.einsum("stf,fm->stm", power, mel_fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    feats = (jnp.log(jnp.clip(mel, min=1e-10)) - mean) * inv_std
    return _roll_left(feats, trim_start)                # valid at 0


def _final_blocks(
    params,
    pe: jnp.ndarray,
    post: jnp.ndarray,        # (S, PCAP, d) — final frames already appended
    bn: jnp.ndarray,          # (S,) final block count (0 = no encoder step)
    npb: jnp.ndarray,         # (S,)
    has_prev: jnp.ndarray,
    has_past: jnp.ndarray,
    prev_addin: jnp.ndarray,  # (S, 1, d)
    past_ctx: jnp.ndarray,    # (S, L, d)
    enc_out: jnp.ndarray,     # (S, ECAP, d)
    buf_len: jnp.ndarray,     # (S,)
    post_total: jnp.ndarray,  # (S,) frames available at final
    first: jnp.ndarray,       # (S,) bool: npb == 0
    y_emit: jnp.ndarray,      # (S,) frames to emit (host-computed y_length)
    cfg: ModelConfig,
    maxb: int,
) -> jnp.ndarray:
    """Final-block encoder step, batched (single-stream semantics:
    models/encoder.py::step is_final=True — short last block masked in the
    add-in mean and zero-padded after PE, per-block emission with the last
    block emitting the remainder). Returns the new enc_out."""
    s = post.shape[0]
    d = cfg.encoder_dim
    bs, hop, la = cfg.block_size, cfg.hop_size, cfg.look_ahead
    offset = bs - la - hop

    chunks = []
    addins = []
    for i in range(maxb):
        blk = jax.lax.dynamic_slice_in_dim(post, i * hop, bs, axis=1)
        cl = jnp.clip(post_total - i * hop, 1, bs)      # (S,) valid frames
        fmask = (jnp.arange(bs)[None, :] < cl[:, None])[:, :, None]
        blk = jnp.where(fmask, blk, 0.0)
        if cfg.init_average:
            addin = blk.sum(axis=1, keepdims=True) / cl[:, None, None]
        else:
            addin = jnp.where(fmask, blk, -jnp.inf).max(axis=1, keepdims=True)
        if cfg.ctx_pos_enc:
            pe_a = pe[jnp.clip(npb + i, 0, pe.shape[0] - 1)]
            addin = addin * math.sqrt(d) + pe_a[:, None, :]
        addins.append(addin)
        start = jnp.clip(i * hop + hop * npb, 0, pe.shape[0] - bs)
        pe_c = jax.vmap(
            lambda s0: jax.lax.dynamic_slice_in_dim(pe, s0, bs, axis=0)
        )(start.astype(jnp.int32))
        # PE applies to the valid frames; padding stays exactly zero
        # (reference _build_blocks pads AFTER the PE addition).
        chunks.append(jnp.where(fmask, blk * math.sqrt(d) + pe_c, 0.0))

    first_prev = jnp.where(has_prev[:, None, None], prev_addin, addins[0])
    prev_list = [first_prev] + addins[:-1]
    xs_chunk = jnp.stack(
        [
            jnp.concatenate([prev_list[i], chunks[i], addins[i]], axis=1)
            for i in range(maxb)
        ],
        axis=1,
    )  # (S, maxb, bs+2, d)

    last_idx = jnp.clip(bn - 1, 0, maxb - 1)
    mask = jnp.asarray(block_attention_mask(bs))
    ys_chunk, _ = apply_layers_infer(
        params["encoder"], xs_chunk, mask, past_ctx, has_past,
        cfg.encoder_heads, last_block=last_idx.astype(jnp.int32),
        layer_kind=cfg.encoder_type, pos_emb=pe[None, : bs + 2, :],
    )
    ys_chunk = ys_chunk[:, :, 1 : bs + 1, :]            # (S, maxb, bs, d)

    # Emission gather: lead `offset` frames of block 0 for first-chunk
    # streams, then hop frames per block, the LAST block emitting the
    # remainder (up to hop+la frames) — variable per stream, so emitted
    # positions map back to (block, in-block index) with a computed gather.
    stcap = offset + (maxb - 1) * hop + hop + la
    p = jnp.arange(stcap)[None, :]                      # (1, stcap)
    lead_n = jnp.where(first, offset, 0)[:, None]       # (S, 1)
    q = p - lead_n
    blk = jnp.clip(q // hop, 0, last_idx[:, None])
    idx_in = jnp.where(q < 0, p, offset + q - blk * hop)
    flat = jnp.clip(blk * bs + idx_in, 0, maxb * bs - 1)  # (S, stcap)
    ys_flat = ys_chunk.reshape(s, maxb * bs, d)
    staging = jnp.take_along_axis(
        ys_flat, flat[:, :, None].repeat(d, 2), axis=1
    )                                                    # (S, stcap, d)
    if cfg.normalize_before:
        staging = layer_norm(params["encoder"]["after_norm"], staging)
    return _scatter_append(enc_out, staging, buf_len, y_emit)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "maxb", "n_fft", "hop", "fcap", "subcap"),
)
def _fused_final_encode(
    params,
    pe: jnp.ndarray,
    buffers: EngineBuffers,
    audio: jnp.ndarray,   # (S, A) zero-padded final chunks
    ints: jnp.ndarray,    # (15, S) int32: wave_len, total_p, trim_start,
                          # raw_len, valid_feats, post_len, n_sub_out, bn,
                          # npb, post_total, y_emit, has_prev, has_past,
                          # first, buf_len — ONE packed transfer (each
                          # extra H2D argument pays a relay round trip)
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    cfg: ModelConfig,
    maxb: int,
    n_fft: int,
    hop: int,
    fcap: int,
    subcap: int,
) -> jnp.ndarray:
    """Batched final encode: exact-length frontend tail → consume-all
    subsample → final blocks → append to enc_out. One program for ALL
    concurrently finalizing streams (the per-slot single-stream finalizer
    runs ~10 variable-shape programs per final). Returns new enc_out only;
    the slots reset right after, so carries are dead."""
    (wave_len, total_p, trim_start, raw_len, valid_feats, post_len,
     n_sub_out, bn, npb, post_total, y_emit) = [ints[i] for i in range(11)]
    has_prev, has_past, first = (
        ints[11].astype(bool), ints[12].astype(bool), ints[13].astype(bool)
    )
    buf_len = ints[14]

    feats = _final_frontend(
        buffers.wave, audio, wave_len, total_p, trim_start, window, mel_fb,
        mean, inv_std, n_fft, hop, fcap,
    )
    raw = _scatter_append(buffers.raw, feats, raw_len, valid_feats)
    sub = conv2d_subsample(params["encoder"]["embed"], raw, cfg.input_layer)
    post = _scatter_append(
        buffers.post, sub[:, :subcap, :], post_len, n_sub_out
    )
    return _final_blocks(
        params, pe, post, bn, npb, has_prev, has_past, buffers.prev_addin,
        buffers.past_ctx, buffers.enc_out, buf_len, post_total, first,
        y_emit, cfg, maxb,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "extcap"))
def _gather_new_frames(
    enc_out: jnp.ndarray,   # (S, ECAP, d)
    vis_len: jnp.ndarray,   # (S,)
    cfg: ModelConfig,
    extcap: int,
) -> jnp.ndarray:
    """enc_out[vis : vis+extcap] per stream (garbage past the valid range).

    vmapped dynamic_slice = per-stream contiguous row DMA (a take_along_axis
    here lowers to a 2.6M-element gather and costs ~70ms at S=128).

    The enc_out ring is ALLOCATED with extcap rows of tail padding
    (StreamingEngine.__init__) so the slice start never clips: with a
    clipped start (vis > ECAP-extcap) the gathered rows no longer begin at
    frame `vis`, and ctc_extend — which scatters new_frames[t] at position
    vis+t — would write the WRONG frames for the
    last ~extcap frames of a near-capacity ring (~29 s utterances at the
    flagship serving config). Padding at allocation instead of per call
    keeps a (S, ECAP, d) concat-copy out of the per-round hot path."""
    ecap_padded = enc_out.shape[1]
    start = jnp.clip(vis_len, 0, ecap_padded - extcap)
    return jax.vmap(
        lambda buf, off: jax.lax.dynamic_slice_in_dim(buf, off, extcap, 0)
    )(enc_out, start)


# ---------------------------------------------------------------------------
# Fused tick programs
#
# Each device program dispatch through the TPU service costs ~10-30 ms of
# latency; a tick composed of ~10 small programs spends more time idle than
# computing. These wrappers fuse the whole encode path (frontend →
# subsample → append → blocks) and the whole decode round (gather → CTC
# extend → cross-KV extend → beam loop) into one program each, with the
# host-side per-slot integer vectors packed into a single (K, S) transfer.
# ---------------------------------------------------------------------------

def _encode_impl(
    params,
    pe: jnp.ndarray,
    buffers: EngineBuffers,
    audio: jnp.ndarray,   # (S, A)
    ints: jnp.ndarray,    # (14, S) int32: wave_len, trim_start, keep_from,
                          # keep_len, raw_len, valid_feats, consumed,
                          # post_len, n_sub_out, bn, has_prev, has_past,
                          # buf_len, npb — ONE packed array: every extra
                          # host→device argument pays a relay round trip,
                          # so all per-tick scalars ride one transfer
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    cfg: ModelConfig,
    maxb: int,
    n_fft: int,
    hop: int,
    subcap: int,
) -> EngineBuffers:
    (wave_len, trim_start, keep_from, keep_len, raw_len, valid_feats,
     consumed, post_len, n_sub_out, bn) = [ints[i] for i in range(10)]
    has_prev, has_past = ints[10].astype(bool), ints[11].astype(bool)
    buf_len, npb = ints[12], ints[13]

    if audio.dtype == jnp.int16:
        # int16 PCM ingest: half the host→device bytes (the TPU-relay
        # upload is the tick's dominant wall-clock cost); the exact
        # ÷32767 normalization happens on device.
        audio = audio.astype(jnp.float32) / 32767.0
    elif audio.dtype == jnp.uint8:
        # mu-law wire (serve/wire.py): QUARTER the float32 bytes. Expand
        # through a 256-entry table computed by wire.mulaw_decode itself,
        # so the uint8 wire is BIT-identical to host-decoded float input
        # (the closed-form expm1 differs from numpy by 1 ulp on ~18% of
        # codes — enough to flake token-parity contracts).
        audio = jnp.asarray(_MULAW_TABLE)[audio.astype(jnp.int32)]
    feats, new_wave = _tick_frontend(
        buffers.wave, audio, wave_len, trim_start, keep_from, keep_len,
        window, mel_fb, mean, inv_std, n_fft, hop,
    )
    sub_frames, new_raw = _tick_subsample(
        params["encoder"]["embed"], buffers.raw, feats, raw_len, valid_feats,
        consumed, cfg,
    )
    new_post = _scatter_append(
        buffers.post, sub_frames[:, :subcap, :], post_len, n_sub_out
    )
    buffers = buffers._replace(wave=new_wave, raw=new_raw, post=new_post)
    if maxb == 0:
        return buffers
    new_post, new_prev, new_past, new_enc = _tick_blocks(
        params, pe, buffers.post, bn, npb, has_prev, has_past,
        buffers.prev_addin, buffers.past_ctx, buffers.enc_out, buf_len,
        cfg, maxb,
    )
    return buffers._replace(
        post=new_post, prev_addin=new_prev, past_ctx=new_past,
        enc_out=new_enc,
    )


# One-program-per-tick encode (used when no beam round runs this tick;
# rounds-carrying ticks go through _fused_tick below instead).
_fused_encode = functools.partial(
    jax.jit, static_argnames=("cfg", "maxb", "n_fft", "hop", "subcap"),
    # The caller replaces self.buffers with the return value immediately;
    # donation lets the enc_out ring append run in place (without it XLA
    # inserts a defensive full-ring copy ahead of the Pallas kernel).
    donate_argnames=("buffers",),
)(_encode_impl)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam", "pre_beam", "ctc_weight", "use_bbd",
                     "max_length", "l_bound", "t_bound", "extcap", "penalty",
                     "eos_commit"),
    # Donate the beam/scorer state: the caller replaces the reference
    # right after the call, and in-place updates halve the transient HBM
    # peak of the per-block rebuild.
    donate_argnames=("state",),
)
def _fused_round(
    params,
    dec_pe: jnp.ndarray,
    enc_out: jnp.ndarray,
    state: BlockDecodeState,
    ints3: jnp.ndarray,     # (3, S) int32: vis_len (BEFORE extension),
                            # n_ext (new frames to make visible), stepping
                            # — ONE packed transfer; every extra H2D arg
                            # pays a relay round trip
    cfg: ModelConfig,
    beam: int,
    pre_beam: int,
    ctc_weight: float,
    use_bbd: bool,
    max_length: int,
    l_bound: int,
    t_bound: int,
    extcap: int,
    penalty: float = 0.0,
    eos_commit: str = "native",
):
    """Extend scorers + run the block beam loop, all in one program.

    Returns (new state, packed (S, 1+Lmax) readback of [ylen, best yseq]).
    Cross-attention memory is the enc_out ring itself — the decoder
    rematerializes K/V from it each beam step (models/decoder.py), so
    there is no per-layer KV ring to extend."""
    vis_len, n_ext = ints3[0], ints3[1]
    state = state._replace(stepping=ints3[2].astype(bool))
    # The tick path never finalizes a block inside this program (the
    # drain program owns final blocks) — a constant inside the jit.
    block_final = jnp.zeros(ints3.shape[1], dtype=bool)
    new_frames = _gather_new_frames(enc_out, vis_len, cfg, extcap)
    new_logp = ctc_log_softmax(params["ctc"], new_frames)
    state = state._replace(
        arrays=state.arrays._replace(
            ctc=ctc_extend(state.arrays.ctc, new_logp, n_ext)
        )
    )
    new_vis = vis_len + n_ext
    out = decode_block_device(
        params, dec_pe, enc_out, state, new_vis, block_final, cfg, beam,
        pre_beam, ctc_weight, use_bbd, max_length, l_bound=l_bound,
        t_bound=t_bound, penalty=penalty, eos_commit=eos_commit,
    )
    packed = jnp.concatenate(
        [out.arrays.ylen[:, None], out.arrays.yseq[:, 0, :]], axis=1
    )
    if cfg.vocab_size < 2**15 and cfg.max_tokens < 2**15:
        # Token ids and prefix lengths both fit int16: halve the per-tick
        # partials D2H (193 columns × S — ~222 KB int32 at S=288 on a
        # ~11 MB/s relay link is ~10 ms of pure readback saved).
        packed = packed.astype(jnp.int16)
    return out, packed


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "maxb", "n_fft", "hop", "subcap", "beam",
                     "pre_beam", "ctc_weight", "use_bbd", "max_length",
                     "l_bound", "t_bound", "extcap", "penalty",
                     "eos_commit"),
    # Both big carries are replaced by the caller right after the call:
    # donation lets the enc_out ring append and the beam-state rebuild run
    # in place (one transient copy each otherwise).
    donate_argnames=("buffers", "state"),
)
def _fused_tick(
    params,
    pe: jnp.ndarray,
    dec_pe: jnp.ndarray,
    buffers: EngineBuffers,
    audio: jnp.ndarray,     # (S, A) float32 / int16 / uint8 mu-law
    state: BlockDecodeState,
    ints: jnp.ndarray,      # (18, S) int32: rows 0-13 = _encode_impl's
                            # packed scalars, 14 = do (streams consuming
                            # audio this tick), 15 = buf (emitted encoder
                            # frames AFTER this tick's encode), 16 = vis0
                            # (visible frames at entry), 17 = pb0
                            # (processed-block counters) — ONE packed
                            # transfer; every extra H2D argument pays a
                            # relay round trip
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    cfg: ModelConfig,
    maxb: int,
    n_fft: int,
    hop: int,
    subcap: int,
    beam: int,
    pre_beam: int,
    ctc_weight: float,
    use_bbd: bool,
    max_length: int,
    l_bound: int,
    t_bound: int,
    extcap: int,
    penalty: float = 0.0,
    eos_commit: str = "native",
):
    """The WHOLE tick — encode + every beam round — as ONE device program.

    The split tick (one _fused_encode + one _fused_round per ready block)
    paid a program dispatch per round on the relay-attached TPU (~20-30 ms
    of pure launch latency each; the S=128 latency rung spent more time
    dispatching than computing). Here the round loop is an outer
    lax.while_loop — pure index arithmetic, the exact shape _fused_drain
    already runs — so one dispatch covers the tick regardless of how many
    blocks became ready. Streams progress independently: each loop
    iteration steps exactly the streams whose next block boundary
    (reference beam_search.py:590-634) lies inside the emitted-frame
    count, replicating the host-driven round sequence.

    Returns (new buffers, new decode state, packed (S, 1+Lmax) readback of
    [ylen | best yseq] from the last round).
    """
    do = ints[14].astype(bool)
    buf, vis0, pb0 = ints[15], ints[16], ints[17]
    # Swap the caller's cached stepping placeholder (_false_dev, a REUSED
    # device constant) for a derived zero BEFORE the loop consumes the
    # carry: a donated leaf that feeds an output would invalidate the
    # shared constant for every later call.
    state = state._replace(stepping=jnp.zeros_like(do))

    buffers = _encode_impl(
        params, pe, buffers, audio, ints[:14], window, mel_fb, mean,
        inv_std, cfg, maxb, n_fft, hop, subcap,
    )
    enc_out = buffers.enc_out
    bs, la, hop_b = cfg.block_size, cfg.look_ahead, cfg.hop_size
    block_final = jnp.zeros_like(do)  # tick path never finalizes a block

    def cond(c):
        _st, _vis, pb = c
        return jnp.any(do & (bs - la + hop_b * pb < buf))

    def body(c):
        st, vis, pb = c
        cur_end = bs - la + hop_b * pb
        ready = do & (cur_end < buf)
        new_vis = jnp.where(ready, jnp.minimum(cur_end, buf), vis)
        n_ext = jnp.clip(new_vis - vis, 0, extcap)
        new_frames = _gather_new_frames(enc_out, vis, cfg, extcap)
        new_logp = ctc_log_softmax(params["ctc"], new_frames)
        st = st._replace(
            arrays=st.arrays._replace(
                ctc=ctc_extend(st.arrays.ctc, new_logp, n_ext)
            ),
            stepping=ready,
        )
        out = decode_block_device(
            params, dec_pe, enc_out, st, new_vis, block_final, cfg, beam,
            pre_beam, ctc_weight, use_bbd, max_length, l_bound=l_bound,
            t_bound=t_bound, penalty=penalty, eos_commit=eos_commit,
        )
        return (out, new_vis, jnp.where(ready, pb + 1, pb))

    st, _vis, _pb = jax.lax.while_loop(cond, body, (state, vis0, pb0))
    packed = jnp.concatenate(
        [st.arrays.ylen[:, None], st.arrays.yseq[:, 0, :]], axis=1
    )
    if cfg.vocab_size < 2**15 and cfg.max_tokens < 2**15:
        # int16 halves the per-tick partials D2H (see _fused_round).
        packed = packed.astype(jnp.int16)
    return buffers, st, packed


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam", "pre_beam", "ctc_weight", "use_bbd",
                     "max_length", "l_bound", "t_bound", "extcap", "penalty",
                     "eos_commit"),
    donate_argnames=("state",),
)
def _fused_drain(
    params,
    dec_pe: jnp.ndarray,
    enc_out: jnp.ndarray,
    state: BlockDecodeState,
    ints4: jnp.ndarray,     # (4, F) int32: vis0 (visible frames at entry),
                            # buf (total emitted encoder frames), pb0
                            # (processed-block counters), do (finalizing
                            # streams) — ONE packed transfer; every extra
                            # H2D argument pays a relay round trip
    cfg: ModelConfig,
    beam: int,
    pre_beam: int,
    ctc_weight: float,
    use_bbd: bool,
    max_length: int,
    l_bound: int,
    t_bound: int,
    extcap: int,
    penalty: float = 0.0,
    eos_commit: str = "native",
):
    """Finalization drain as ONE program: an outer while_loop runs the
    remaining full blocks (streaming semantics) and then each stream's
    final block (block_final set, vis extends to the whole ring) — the
    host-driven version paid one program launch + host sync per round
    (~40-80 ms each on the relay) for a loop that is pure index
    arithmetic. Streams progress independently: a stream enters its final
    round as soon as it has no full block pending, exactly the per-stream
    round sequence of the unfused loop."""
    bs, la, hop = cfg.block_size, cfg.look_ahead, cfg.hop_size
    vis0, buf, pb0 = ints4[0], ints4[1], ints4[2]
    do = ints4[3].astype(bool)

    def cond(c):
        _st, vis, pb, fdone = c
        cur_end = bs - la + hop * pb
        return jnp.any((do & (cur_end < buf)) | (do & ~fdone & (buf > 0)))

    def body(c):
        st, vis, pb, fdone = c
        cur_end = bs - la + hop * pb
        ready = do & (cur_end < buf)
        fin = do & ~ready & ~fdone & (buf > 0)
        new_vis = jnp.where(ready, jnp.minimum(cur_end, buf),
                            jnp.where(fin, buf, vis))
        n_ext = jnp.clip(new_vis - vis, 0, extcap)
        new_frames = _gather_new_frames(enc_out, vis, cfg, extcap)
        new_logp = ctc_log_softmax(params["ctc"], new_frames)
        st = st._replace(
            arrays=st.arrays._replace(
                ctc=ctc_extend(st.arrays.ctc, new_logp, n_ext)
            ),
            stepping=ready | fin,
        )
        out = decode_block_device(
            params, dec_pe, enc_out, st, jnp.where(ready | fin, new_vis, vis),
            fin, cfg, beam, pre_beam, ctc_weight, use_bbd, max_length,
            l_bound=l_bound, t_bound=t_bound, penalty=penalty,
            eos_commit=eos_commit,
        )
        return (out, jnp.where(ready | fin, new_vis, vis),
                jnp.where(ready, pb + 1, pb), fdone | fin)

    carry = (state, vis0, pb0, jnp.zeros_like(do))
    st, _vis, _pb, _f = jax.lax.while_loop(cond, body, carry)
    return st


@functools.partial(jax.jit, static_argnames=("cfg", "beam"))
def _reset_program(
    mask: jnp.ndarray,
    arrays: BeamArrays,
    prev_arrays: BeamArrays,
    buffers: EngineBuffers,  # enc_out replaced by an empty placeholder
    prev_valid: jnp.ndarray,
    process_idx: jnp.ndarray,
    output_index: jnp.ndarray,
    cfg: ModelConfig,
    beam: int,
):
    """Reset the masked slots to fresh-session state in ONE device program
    (the eager select-per-field version dispatches ~25 programs per reset —
    pure launch latency on the TPU relay)."""
    s = mask.shape[0]
    fresh_arrays = init_beam_arrays(cfg, s, beam)
    zero_buf = jax.tree.map(jnp.zeros_like, buffers)
    # NB: three large per-stream buffers need no reset and pass through
    # untouched (zeroing them was ~24 ms/tick of full-ring rewrites at
    # S=288):
    # - the decoder KV cache: rows are lane-resident and a fresh session
    #   writes position p's rows before any step reads them;
    # - cross-attention memory K/V: REMATERIALIZED each step from enc_out
    #   (models/decoder.py::decoder_step) with finite-sanitization, and
    #   every read is masked by enc_len (_attend_cross_blocked zeroes
    #   masked weights) — there is no cross-KV state to reset at all;
    # - the emitted-encoder ring enc_out (see _select_buffers).
    return (
        _select_arrays(mask, fresh_arrays, arrays),
        _select_arrays(mask, fresh_arrays, prev_arrays),
        _select_buffers(mask, zero_buf, buffers),
        jnp.where(mask, False, prev_valid),
        jnp.where(mask, 0, process_idx),
        jnp.where(mask, 0, output_index),
    )


@jax.jit
def _gather_final_rows(arrays: BeamArrays, rows: jnp.ndarray):
    """Best-hypothesis readback for the finalizing rows, packed into ONE
    f32 array [ylen | yseq | xpos | score] per row: a single D2H transfer
    (each separate np.asarray paid a relay round trip, and the previous
    ylen pre-read added a second sync just to pick a width bucket — at
    full token capacity the whole readback is ~50 KB, cheaper than the
    round trip it saves). Token ids and frame positions are < 2^24, so
    the f32 packing is exact."""
    return jnp.concatenate(
        [
            arrays.ylen[rows, None].astype(jnp.float32),
            arrays.yseq[rows, 0].astype(jnp.float32),
            arrays.xpos[rows, 0].astype(jnp.float32),
            arrays.score[rows, 0][:, None],
        ],
        axis=1,
    )


def _rows_arrays(a: BeamArrays, rows: jnp.ndarray) -> BeamArrays:
    """Gather per-stream rows out of BeamArrays (all lead with S)."""
    return BeamArrays(
        yseq=a.yseq[rows], xpos=a.xpos[rows], lane=a.lane[rows],
        ylen=a.ylen[rows],
        score=a.score[rows], score_dec=a.score_dec[rows],
        score_ctc=a.score_ctc[rows],
        ctc=CTCScorerState(
            logp=a.ctc.logp[rows], enc_len=a.ctc.enc_len[rows],
            r=a.ctc.r[rows], s=a.ctc.s[rows],
        ),
    )


def _rows_cache(c: DecoderCache, rows: jnp.ndarray, beam: int) -> DecoderCache:
    """Gather whole B-sized row groups out of the (L, S·B, Lmax, d) cache."""
    def sb(x):
        l, s_b, lmax, d = x.shape
        g = x.reshape(l, s_b // beam, beam, lmax, d)[:, rows]
        return g.reshape(l, rows.shape[0] * beam, lmax, d)

    return DecoderCache(h=sb(c.h))


@functools.partial(jax.jit, static_argnames=("beam",))
def _extract_rows(
    buffers: EngineBuffers,
    arrays: BeamArrays,
    prev_arrays: BeamArrays,
    dec_cache: DecoderCache,
    prev_valid: jnp.ndarray,
    process_idx: jnp.ndarray,
    output_index: jnp.ndarray,
    rows: jnp.ndarray,   # (F,) int32 slot indices
    beam: int,
):
    """Copy the state of F slots into a compact F-wide working set.

    Finalization then runs its encode/drain/final programs at width F
    (a handful) instead of the engine's full S: the final block can burst
    to max_length beam steps (BBD off), and each step's state traffic
    scales with the batch width — extracting first makes that burst cost
    ~F/S of the naive masked-lockstep version. One gather program."""
    return (
        jax.tree.map(lambda x: x[rows], buffers),
        _rows_arrays(arrays, rows),
        _rows_arrays(prev_arrays, rows),
        _rows_cache(dec_cache, rows, beam),
        prev_valid[rows],
        process_idx[rows],
        output_index[rows],
    )


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SlotCounters:
    """Host-side per-slot bookkeeping (numpy, one entry per stream slot)."""

    active: np.ndarray
    first_wave: np.ndarray
    wave_len: np.ndarray
    raw_len: np.ndarray
    post_len: np.ndarray
    npb: np.ndarray
    has_prev: np.ndarray
    has_past: np.ndarray
    buf_len: np.ndarray
    vis_len: np.ndarray
    processed_block: np.ndarray

    @classmethod
    def zeros(cls, s: int) -> "SlotCounters":
        return cls(
            active=np.zeros(s, bool),
            first_wave=np.ones(s, bool),
            wave_len=np.zeros(s, np.int64),
            raw_len=np.zeros(s, np.int64),
            post_len=np.zeros(s, np.int64),
            npb=np.zeros(s, np.int64),
            has_prev=np.zeros(s, bool),
            has_past=np.zeros(s, bool),
            buf_len=np.zeros(s, np.int64),
            vis_len=np.zeros(s, np.int64),
            processed_block=np.zeros(s, np.int64),
        )

    def reset_slot(self, s: int):
        self.active[s] = False
        self.first_wave[s] = True
        for a in (self.wave_len, self.raw_len, self.post_len, self.npb,
                  self.buf_len, self.vis_len, self.processed_block):
            a[s] = 0
        self.has_prev[s] = self.has_past[s] = False


class StreamingEngine:
    """S-slot batched streaming decoder (one model copy, one chip)."""

    def __init__(
        self,
        model: ASRModel,
        n_slots: int = 8,
        beam_size: int = 5,
        ctc_weight: float = 0.3,
        use_bbd: bool = True,
        chunk_samples: int = 8192,
        pre_beam_size: Optional[int] = None,
        penalty: float = 0.0,
        max_length: Optional[int] = None,
        eos_commit: str = "native",
    ):
        self.model = model
        cfg = model.cfg
        self.cfg = cfg
        self.S = n_slots
        self.beam = beam_size
        self.ctc_weight = ctc_weight
        self.use_bbd = use_bbd
        self.pre_beam = min(pre_beam_size or cfg.pre_beam_size, cfg.vocab_size)
        self.penalty = penalty
        # EOS-step commit semantics ("native"/"espnet", docs/ESPNET_PARITY.md)
        self.eos_commit = eos_commit
        self.A = chunk_samples
        # Per-utterance beam-step budget. Each step pays an O(visible
        # frames) CTC prefix recursion, so serving deployments can cap it
        # below the token capacity to bound worst-case finalization cost.
        self.max_length = min(max_length or cfg.max_tokens - 1,
                              cfg.max_tokens - 1)

        # Capacities.
        # _final_frontend's slice-based right reflection needs the
        # reflection start total_p-1-pad ≥ 0, i.e. win_length > n_fft//2
        # (total_p is floored at win_length). Every librosa-style frontend
        # satisfies this (win_length defaults to n_fft); fail loudly for
        # exotic configs rather than silently mis-reflecting short finals.
        assert cfg.win_length > cfg.n_fft // 2, (
            "win_length must exceed n_fft//2 for the final-frontend "
            f"reflection (got win_length={cfg.win_length}, "
            f"n_fft={cfg.n_fft})"
        )
        self.WCAP = cfg.win_length  # carry ≤ win_length always
        ccap = self.WCAP + self.A
        self.FCAP = 1 + ccap // cfg.hop_length
        sub = cfg.subsample
        from speechcatcher_tpu.models.encoder import subsampled_len

        self.RCAP = self.FCAP + 3 * sub + 4
        self.SUBCAP = subsampled_len(self.RCAP, cfg.input_layer)
        # Blocks per tick: carry < block_size plus ≤ SUBCAP new frames.
        self.MAXB = max(
            1, -(-self.SUBCAP // cfg.hop_size) + 1
        )
        self.PCAP = max(
            (self.MAXB - 1) * cfg.hop_size + cfg.block_size + cfg.hop_size,
            cfg.block_size + self.SUBCAP,
        )
        self.ECAP = cfg.max_enc_frames
        self.EXTCAP = cfg.block_size  # max frames made visible per round
        # enc_out carries EXTCAP rows of tail padding so the new-frames
        # gather never clips its slice start (see _gather_new_frames);
        # writes are bounded to ECAP by the stall/overflow guards.
        # Rounded to a 64 multiple so _scatter_append's windowed Pallas
        # kernel is eligible for the enc_out ring (the padding rows are
        # dead weight: ~0.1 MB/stream).
        self.ECAP_PAD = -(-(self.ECAP + self.EXTCAP) // 64) * 64

        d = cfg.encoder_dim
        self.buffers = EngineBuffers(
            wave=jnp.zeros((self.S, self.WCAP)),
            raw=jnp.zeros((self.S, self.RCAP, cfg.n_mels)),
            post=jnp.zeros((self.S, self.PCAP, d)),
            prev_addin=jnp.zeros((self.S, 1, d)),
            past_ctx=jnp.zeros((self.S, cfg.encoder_layers, d)),
            enc_out=jnp.zeros((self.S, self.ECAP_PAD, d),
                              dtype=cfg.enc_ring_jnp_dtype),
        )
        self.arrays = init_beam_arrays(cfg, self.S, beam_size)
        # Distinct buffers: arrays and prev_arrays are donated by the same
        # program — aliased buffers would be a double donation. The
        # snapshot carries an EMPTY CTC log-prob ring (append-only, always
        # read from the live arrays).
        self.prev_arrays = init_beam_arrays(cfg, self.S, beam_size,
                                            snapshot=True)
        # ONE lane-resident KV cache for all hypotheses (no rewind copy:
        # rows are append-only; rollback restores the lane map instead).
        self.dec_cache = init_decoder_cache(cfg, self.S * beam_size)
        self.prev_valid_dev = jnp.zeros((self.S,), bool)
        self.process_idx_dev = jnp.zeros((self.S,), jnp.int32)
        self.output_index_dev = jnp.zeros((self.S,), jnp.int32)
        # No cross-attention KV cache: the decoder rematerializes memory
        # K/V from the enc_out ring every beam step (models/decoder.py) —
        # 9.4 MB/stream of state and a per-tick extend program gone.
        self.c = SlotCounters.zeros(self.S)
        self._slot_clean = np.ones(self.S, bool)  # fresh-state slots

        self.trim = math.ceil(math.ceil(cfg.win_length / cfg.hop_length) / 2)
        # Host upper bound on any stream's prefix length (refreshed from the
        # per-tick bulk readback) — drives the l_bound bucket so the decode
        # loop touches only the live region of the KV caches.
        self.ylen_upper = 1
        self._last_packed: Optional[np.ndarray] = None
        # Largest new-frames gather start of the last compact drain
        # (diagnostics; -1 until a finalize_batch ran the compact path).
        self._last_drain_max_start = -1
        self._pending_packed = None  # device array awaiting host copy
        # Which rows of _pending_packed were computed AFTER the slot's
        # latest reset. A slot reset between a tick and the deferred
        # materialization of its packed readback must not resurface the
        # previous utterance's tokens for the session that reuses the
        # slot — _reset_slots patches _last_packed, flags the slot stale
        # here, and marks its pending row not-fresh; tick() re-applies
        # the stale mask after every materialization until a row computed
        # post-reset (fresh) arrives.
        self._pending_fresh: Optional[np.ndarray] = None
        self._stale_partial = np.zeros(self.S, bool)
        # Cached device constant: structural placeholder for per-call bool
        # masks whose real values ride a packed int32 transfer (a fresh
        # jnp.asarray per call would cost one relay round trip each).
        self._false_dev = jnp.zeros(self.S, dtype=bool)
        # One-program tick (encode + all beam rounds fused; default ON).
        # SC_TPU_UNFUSED_TICK=1 restores the split per-round programs for
        # A/B — each extra dispatch costs ~20-30 ms on a relay-attached
        # TPU, the fixed overhead that capped the p50<100 ms stream count.
        self._use_fused_tick = not os.environ.get("SC_TPU_UNFUSED_TICK")

        # Single-stream finalizer (shares weights; used per final chunk).
        self._finalizer = BlockwiseSynchronousBeamSearch(
            model, beam_size=beam_size, ctc_weight=ctc_weight,
            use_bbd=use_bbd, penalty=penalty, max_length=self.max_length,
            eos_commit=eos_commit,
        )

    # ------------------------------------------------------------------
    # Memory accounting
    # ------------------------------------------------------------------
    def hbm_bytes_per_stream(self) -> Dict[str, int]:
        """Bytes of device state per stream slot, by component.

        The per-stream footprint bounds S as much as compute does (SURVEY
        §5.7: every capacity is a compile-time shape). Weights are excluded
        (one copy, amortized over S)."""
        def tree_bytes(t) -> int:
            return sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(t)
                if hasattr(x, "dtype")
            )

        per = {
            "frontend_buffers": tree_bytes(self.buffers),
            "beam_arrays": tree_bytes(self.arrays),
            "rewind_snapshot": tree_bytes(self.prev_arrays),
            "decoder_cache": tree_bytes(self.dec_cache),
            # cross-attention K/V: rematerialized from enc_out per step —
            # no stored state (see models/decoder.py::decoder_step)
        }
        return {k: v // self.S for k, v in per.items()} | {
            "total": sum(per.values()) // self.S
        }

    # ------------------------------------------------------------------
    # Slot management
    # ------------------------------------------------------------------
    def acquire_slot(self) -> Optional[int]:
        free = np.flatnonzero(~self.c.active)
        if len(free) == 0:
            return None
        # Prefer slots already reset (finalize_batch leaves them clean) —
        # skips the reset program entirely on the re-arm path.
        clean = free[self._slot_clean[free]]
        s = int(clean[0]) if len(clean) else int(free[0])
        if not self._slot_clean[s]:
            self._reset_slot(s)
        self.c.reset_slot(s)
        self._slot_clean[s] = False
        self.c.active[s] = True
        return s

    def release_slot(self, s: int):
        self._reset_slot(s)

    def slot_would_stall(self, s: int) -> bool:
        """True when one more chunk could overflow the encoder ring — the
        SAME guard tick() applies before consuming a slot's audio. Callers
        that stage audio themselves should check this BEFORE destructively
        dequeuing a chunk: tick() silently skips stalled slots, so a chunk
        passed anyway is dropped on the floor."""
        cfg = self.cfg
        offset = cfg.block_size - cfg.look_ahead - cfg.hop_size
        emit_max = self.MAXB * cfg.hop_size + offset
        return bool(self.c.buf_len[s] + emit_max > self.ECAP)

    def _reset_slot(self, s: int):
        self._reset_slots([s])

    def _reset_slots(self, slots: List[int]):
        """Reset several slots with ONE device program."""
        mask = np.zeros(self.S, bool)
        for s in slots:
            self.c.reset_slot(s)
            mask[s] = True
        # The cross-KV cache, the enc_out ring, AND the CTC log-prob ring
        # stay out of the program: all three are append-overwritten and
        # read under enc_len/buf_len masks (see _reset_program/
        # _select_buffers docs), and routing any of them through as a
        # pass-through output costs a full-ring copy (the CTC ring alone
        # is (S, V, Tcap) bf16 ≈ 450 MB at S=288 — a measured 27.7 ms
        # copy per reset in the xplane profile).
        enc_keep = self.buffers.enc_out
        small = self.buffers._replace(enc_out=enc_keep[:, :0])
        ring_keep = self.arrays.ctc.logp
        arr_small = self.arrays._replace(
            ctc=self.arrays.ctc._replace(logp=ring_keep[:, :0, :0])
        )
        (arr_small, self.prev_arrays, buf_small,
         self.prev_valid_dev, self.process_idx_dev,
         self.output_index_dev) = _reset_program(
            jnp.asarray(mask), arr_small, self.prev_arrays,
            small, self.prev_valid_dev, self.process_idx_dev,
            self.output_index_dev, self.cfg, self.beam,
        )
        self.arrays = arr_small._replace(
            ctc=arr_small.ctc._replace(logp=ring_keep)
        )
        self.buffers = buf_small._replace(enc_out=enc_keep)
        self._slot_clean[slots] = True
        if self._last_packed is not None:
            for s in slots:
                self._last_packed[s, 0] = 1  # stale partials cleared
        # The deferred readback may still hold pre-reset rows for these
        # slots; keep masking them until a post-reset row lands.
        self._stale_partial[slots] = True
        if self._pending_fresh is not None:
            self._pending_fresh[slots] = False

    # ------------------------------------------------------------------
    # Tick
    # ------------------------------------------------------------------
    def tick(self, audio: Dict[int, np.ndarray]) -> Dict[int, List[int]]:
        """Advance all streams by one chunk.

        audio: slot → exactly `chunk_samples` samples: float32 in [-1, 1],
        or int16 PCM (preferred — halves the host→device transfer, the
        tick's dominant wall-clock cost on a relay-attached TPU; the exact
        ÷32767 normalization runs on device). Returns slot → committed
        token ids of the best hypothesis (partial output).
        """
        c = self.c
        cfg = self.cfg
        slots = sorted(k for k in audio if c.active[k])
        if not slots:
            return {}
        do = np.zeros(self.S, bool)
        dtypes = {np.asarray(audio[s]).dtype for s in slots}
        if dtypes == {np.dtype(np.uint8)}:
            # mu-law wire (serve/wire.py): 1 byte/sample on the link —
            # the cheapest format on a relay-attached TPU. Fill value 128
            # is the mu-law zero code (inactive rows are never appended,
            # see the capacity-stall note below, but keep them ~silence).
            wire_dtype: np.dtype = np.dtype(np.uint8)
            audio_batch = np.full((self.S, self.A), 128, np.uint8)
        else:
            wire_dtype = (
                np.dtype(np.int16)
                if dtypes == {np.dtype(np.int16)}
                else np.dtype(np.float32)
            )
            audio_batch = np.zeros((self.S, self.A), wire_dtype)
        offset = cfg.block_size - cfg.look_ahead - cfg.hop_size
        emit_max = self.MAXB * cfg.hop_size + offset
        for s in slots:
            chunk = audio[s]
            assert len(chunk) == self.A, "tick requires fixed-size chunks"
            # Capacity stall: a stream whose encoder ring would overflow
            # stops consuming audio; its partials freeze, which trips the
            # caller's plateau endpointing → finalize. Silent wraparound
            # corruption is never possible. (slot_would_stall is this same
            # predicate — callers can probe it before dequeuing audio.)
            if c.buf_len[s] + emit_max > self.ECAP:
                continue
            chunk = np.asarray(chunk)
            if chunk.dtype != wire_dtype:
                # Mixed-format tick: normalize stragglers to the batch
                # dtype on host (the all-one-format fast paths above keep
                # the narrow bytes on the wire).
                if chunk.dtype == np.uint8:
                    chunk = _mulaw_decode(chunk)
                elif chunk.dtype == np.int16:
                    chunk = chunk.astype(np.float32) / 32767.0
                chunk = chunk.astype(wire_dtype)
            audio_batch[s] = chunk
            do[s] = True
        if not do.any():
            return {s: self.partial_tokens(s) for s in slots}

        # Start this tick's audio H2D FIRST: device_put is async, so the
        # chunk batch (the tick's largest relay transfer, ~4.7 MB at
        # S=288 int16) rides the link while the host still waits on the
        # previous tick's readback / the device drains its queue. Ordering
        # it after the blocking readback serialized transfer behind
        # compute on the relay.
        audio_dev = jax.device_put(audio_batch)

        # Materialize the PREVIOUS tick's packed [ylen | best yseq] readback
        # next: its D2H copy was started asynchronously at the end of that
        # tick, so this host copy is cheap, and this tick's device work
        # overlaps the next tick's host prep. Partial outputs therefore lag
        # one tick (~one chunk), which is immaterial for display/
        # endpointing; finals read synchronously.
        if self._pending_packed is not None:
            self._last_packed = np.array(self._pending_packed)
            self._pending_packed = None
            if self._pending_fresh is not None:
                # Rows computed after the slot's reset clear its staleness;
                # rows computed before it stay masked.
                self._stale_partial &= ~self._pending_fresh
                self._pending_fresh = None
            self._last_packed[self._stale_partial, 0] = 1

        packed_dev = self._tick_device(audio_dev, do)
        if packed_dev is not None:
            # Kick off the D2H copy now; it overlaps the next tick's host
            # prep + H2D instead of blocking inside next tick's np.array.
            try:
                packed_dev.copy_to_host_async()
            except AttributeError:  # older jax Array without the method
                pass
            self._pending_packed = packed_dev
            # Every row of this readback reflects post-(any prior)reset
            # state; _reset_slots un-marks rows if a reset lands later.
            self._pending_fresh = np.ones(self.S, bool)

        out: Dict[int, List[int]] = {}
        drop = {self.cfg.blank_id, self.cfg.eos_id}
        if self._last_packed is None:
            return {s: [] for s in slots}
        ylen = self._last_packed[:, 0]
        self.ylen_upper = max(int(ylen.max()), 1)
        best = self._last_packed[:, 1:]
        for s in slots:
            n = int(ylen[s])
            out[s] = (
                [int(t) for t in best[s, 1 : n - 1] if int(t) not in drop]
                if n > 2
                else []
            )
        return out

    def _tick_device(self, audio_dev, do: np.ndarray):
        """Device portion of one tick (encode + beam rounds): audio already
        device-resident. Returns the packed [ylen | best yseq] device array
        of the last round (None if no round ran). Default path = ONE fused
        program; SC_TPU_UNFUSED_TICK=1 restores the split per-round
        programs for A/B."""
        bk = self._encode_bookkeeping(do)
        vis_f, pb_f, n_rounds = self._round_schedule(do, bk["buf_new"])
        if n_rounds > 0 and self._use_fused_tick:
            return self._tick_fused(audio_dev, bk, do, vis_f, pb_f)
        self._dispatch_encode(audio_dev, bk)
        self._apply_encode_counters(bk)
        return self._run_rounds(do) if n_rounds > 0 else None

    # -- frontend + encoder -------------------------------------------------
    def _encode_bookkeeping(self, do: np.ndarray) -> dict:
        """All host-side length arithmetic for one tick's encode — pure
        (no counter mutation), so the fused tick can compute the round
        schedule from `buf_new` BEFORE anything is dispatched."""
        c = self.c
        cfg = self.cfg
        win, hop = cfg.win_length, cfg.hop_length
        sub = cfg.subsample

        total = np.where(do, c.wave_len + self.A, c.wave_len)
        can = do & (total > win)
        n_frames = np.where(can, (total - (win - hop)) // hop, 0)
        n_res = np.where(can, (total - (win - hop)) % hop, 0)
        keep_len = np.where(can, (win - hop) + n_res, total)
        stft_frames = n_frames + 2  # 1 + proc_len//hop with proc=240+n*hop
        trim_start = np.where(c.first_wave, 0, self.trim)
        valid_feats = np.where(
            can,
            np.maximum(
                stft_frames - trim_start - self.trim, 0
            ),
            0,
        )
        keep_from = np.where(can, total - keep_len, 0)

        # Subsampling bookkeeping (host).
        raw_total = c.raw_len + valid_feats
        n_samples = raw_total // sub - 1
        can_sub = can & (n_samples >= 2)
        n_sub_in = np.where(can_sub, n_samples * sub, 0)  # frames consumed
        # conv output count for n_samples*sub input frames — vectorized
        # (a per-slot Python loop here ran every tick over all S slots).
        outs = n_sub_in.astype(np.int64)
        if cfg.input_layer != "linear":  # linear keeps length (subsample=1)
            from speechcatcher_tpu.models.encoder import _CONV_SPECS

            kernels, strides = _CONV_SPECS[cfg.input_layer]
            for k, st in zip(kernels, strides):
                outs = (outs - k) // st + 1
        n_sub_out = np.where(can_sub, outs, 0)
        n_res_raw = np.where(can_sub, raw_total % sub + sub * 2, raw_total)
        consumed = np.where(can_sub, raw_total - n_res_raw, 0)

        # Block bookkeeping (host).
        post_total = c.post_len + n_sub_out
        overlap = cfg.block_size - cfg.hop_size
        bn = np.where(
            post_total > cfg.block_size,
            np.maximum(0, post_total - overlap) // cfg.hop_size,
            0,
        )
        bn = np.minimum(bn, self.MAXB)
        maxb_tick = int(bn.max())

        # ONE packed int32 transfer for every per-tick scalar array: each
        # separate jnp.asarray was a distinct H2D over the relay (a round
        # trip each, ~5-30 ms on the tunnel).
        ints = np.stack(
            [c.wave_len, trim_start, keep_from, keep_len, c.raw_len,
             valid_feats, consumed, c.post_len, n_sub_out, bn,
             c.has_prev, c.has_past, c.buf_len, c.npb]
        ).astype(np.int32)

        offset = cfg.block_size - cfg.look_ahead - cfg.hop_size
        emitted = (
            np.where(bn > 0,
                     bn * cfg.hop_size + np.where(c.npb == 0, offset, 0), 0)
            if maxb_tick > 0 else np.zeros(self.S, dtype=c.buf_len.dtype)
        )
        return {
            "ints": ints, "maxb": maxb_tick, "can": can,
            "keep_len": keep_len, "n_res_raw": n_res_raw,
            "post_total": post_total, "bn": bn, "emitted": emitted,
            "buf_new": c.buf_len + emitted,
        }

    def _dispatch_encode(self, audio_dev, bk: dict):
        """Encode-only tick program (no beam round ready this tick)."""
        cfg = self.cfg
        self.buffers = _fused_encode(
            self.model.params,
            self.model.enc_pe,
            self.buffers,
            audio_dev,
            jnp.asarray(bk["ints"]),
            self.model.frontend.window,
            self.model.frontend.mel_fb,
            self.model.frontend.mean,
            self.model.frontend.inv_std,
            cfg,
            bk["maxb"],
            cfg.n_fft,
            cfg.hop_length,
            self.SUBCAP,
        )

    def _apply_encode_counters(self, bk: dict):
        """Host counter updates for a dispatched encode (bookkeeping from
        _encode_bookkeeping; must run exactly once per dispatch)."""
        c = self.c
        cfg = self.cfg
        c.wave_len = bk["keep_len"]
        c.first_wave = np.where(bk["can"], False, c.first_wave)
        c.raw_len = bk["n_res_raw"]
        if bk["maxb"] == 0:
            c.post_len = bk["post_total"]
            return
        bn = bk["bn"]
        c.buf_len = c.buf_len + bk["emitted"]
        c.post_len = bk["post_total"] - bn * cfg.hop_size
        c.has_prev = c.has_prev | (bn > 0)
        c.has_past = c.has_past | (bn > 0)
        c.npb = c.npb + bn

    # -- beam rounds ---------------------------------------------------------
    def _round_schedule(self, do: np.ndarray, buf_new: np.ndarray):
        """Replay of the device round loop's index arithmetic on host:
        (final vis_len, final processed_block, round count). The fused
        tick's lax.while_loop and this loop compute the SAME sequence —
        lengths are data-independent functions of chunk counts, so the
        host knows the schedule without any device readback."""
        c = self.c
        cfg = self.cfg
        vis = c.vis_len.copy()
        pb = c.processed_block.copy()
        n_rounds = 0
        while True:
            cur_end = (cfg.block_size - cfg.look_ahead
                       + cfg.hop_size * pb)
            ready = do & c.active & (cur_end < buf_new)
            if not ready.any():
                break
            new_vis = np.where(ready, cur_end, vis)
            assert (new_vis - vis <= self.EXTCAP).all(), \
                (new_vis - vis, self.EXTCAP)
            vis = new_vis
            pb = np.where(ready, pb + 1, pb)
            n_rounds += 1
        return vis, pb, n_rounds

    def _tick_fused(self, audio_dev, bk: dict, do: np.ndarray,
                    vis_final: np.ndarray, pb_final: np.ndarray):
        """Whole tick (encode + all rounds) as ONE device program."""
        c = self.c
        cfg = self.cfg
        if os.environ.get("SC_TPU_LBOUND_BUCKET"):
            l_bound = self._bucket(self.ylen_upper + 64, cfg.max_tokens)
        else:
            l_bound = cfg.max_tokens
        t_bound = self._bucket(int(vis_final.max()) + 1, self.ECAP,
                               floor=128)
        ints = np.concatenate(
            [bk["ints"],
             np.stack([do, bk["buf_new"], c.vis_len, c.processed_block])
             .astype(np.int32)],
            axis=0,
        )
        dev_state = BlockDecodeState(
            arrays=self.arrays,
            prev_arrays=self.prev_arrays,
            dec_cache=self.dec_cache,
            prev_valid=self.prev_valid_dev,
            process_idx=self.process_idx_dev,
            output_index=self.output_index_dev,
            # Placeholder (cached device constant, no transfer): the round
            # loop installs the real per-round stepping mask internally.
            stepping=self._false_dev,
        )
        self.buffers, out, packed = _fused_tick(
            self.model.params,
            self.model.enc_pe,
            self.model.dec_pe,
            self.buffers,
            audio_dev,
            dev_state,
            jnp.asarray(ints),
            self.model.frontend.window,
            self.model.frontend.mel_fb,
            self.model.frontend.mean,
            self.model.frontend.inv_std,
            cfg,
            bk["maxb"],
            cfg.n_fft,
            cfg.hop_length,
            self.SUBCAP,
            self.beam,
            self.pre_beam,
            self.ctc_weight,
            self.use_bbd,
            self.max_length,
            l_bound,
            t_bound,
            self.EXTCAP,
            self.penalty,
            self.eos_commit,
        )
        self.arrays = out.arrays
        self.prev_arrays = out.prev_arrays
        self.dec_cache = out.dec_cache
        self.prev_valid_dev = out.prev_valid
        self.process_idx_dev = out.process_idx
        self.output_index_dev = out.output_index
        self._apply_encode_counters(bk)
        c.vis_len = vis_final
        c.processed_block = pb_final
        return packed

    @staticmethod
    def _bucket(n: int, cap: int, floor: int = 64) -> int:
        b = floor
        while b < n:
            b *= 2
        return min(b, cap)

    def _run_rounds(self, do: np.ndarray):
        """Each round makes one block visible per ready stream and runs the
        fused extend+decode program. Returns the last round's packed
        [ylen | best yseq] device array (None if no round ran)."""
        c = self.c
        cfg = self.cfg
        packed = None
        while True:
            cur_end = (
                cfg.block_size - cfg.look_ahead
                + cfg.hop_size * c.processed_block
            )
            ready = do & c.active & (cur_end < c.buf_len)
            if not ready.any():
                break
            new_vis = np.where(ready, cur_end, c.vis_len)
            n_ext = np.where(ready, new_vis - c.vis_len, 0)
            assert (n_ext <= self.EXTCAP).all(), (n_ext, self.EXTCAP)

            # A/B (chip-measured): the l_bound bucket slices the decoder
            # KV cache to the live-prefix width before the loop and writes
            # it back after — ~20 ms/tick of slice+writeback+carry copies
            # at S=288 in the xplane profile — to save ~34% of the
            # per-step attention reads. Tick blocks run only ~2 beam
            # steps, so full capacity (no slice; the donated carry can
            # alias in place) is expected to win; SC_TPU_LBOUND_BUCKET=1
            # restores the bucketed behavior.
            if os.environ.get("SC_TPU_LBOUND_BUCKET"):
                l_bound = self._bucket(self.ylen_upper + 64, cfg.max_tokens)
            else:
                l_bound = cfg.max_tokens
            t_bound = self._bucket(int(new_vis.max()) + 1, self.ECAP,
                                   floor=128)
            dev_state = BlockDecodeState(
                arrays=self.arrays,
                prev_arrays=self.prev_arrays,
                dec_cache=self.dec_cache,
                prev_valid=self.prev_valid_dev,
                process_idx=self.process_idx_dev,
                output_index=self.output_index_dev,
                # Placeholder (cached device constant, no transfer): the
                # real stepping mask rides the packed ints3 row and is
                # installed inside _fused_round.
                stepping=self._false_dev,
            )
            out, packed = _fused_round(
                self.model.params,
                self.model.dec_pe,
                self.buffers.enc_out,
                dev_state,
                jnp.asarray(np.stack(
                    [c.vis_len, n_ext, ready]
                ).astype(np.int32)),
                cfg,
                self.beam,
                self.pre_beam,
                self.ctc_weight,
                self.use_bbd,
                self.max_length,
                l_bound,
                t_bound,
                self.EXTCAP,
                self.penalty,
                self.eos_commit,
            )
            self.arrays = out.arrays
            self.prev_arrays = out.prev_arrays
            self.dec_cache = out.dec_cache
            self.prev_valid_dev = out.prev_valid
            self.process_idx_dev = out.process_idx
            self.output_index_dev = out.output_index

            c.vis_len = new_vis
            c.processed_block = np.where(
                ready, c.processed_block + 1, c.processed_block
            )
        return packed

    # ------------------------------------------------------------------
    # Output + finalize
    # ------------------------------------------------------------------
    def partial_tokens(self, s: int) -> List[int]:
        """Committed tokens of the best hypothesis (yseq[1:-1], non-blank)."""
        ylen = int(self.arrays.ylen[s])
        if ylen <= 2:
            return []
        yseq = np.asarray(self.arrays.yseq[s, 0, :ylen])
        drop = {self.cfg.blank_id, self.cfg.eos_id}
        return [int(t) for t in yseq[1:-1] if int(t) not in drop]

    def partial_result(self, s: int):
        ylen = int(self.arrays.ylen[s])
        yseq = np.asarray(self.arrays.yseq[s, 0, :ylen])
        xpos = np.asarray(self.arrays.xpos[s, 0, :ylen])
        return yseq, xpos

    def finalize(self, s: int, last_audio: Optional[np.ndarray] = None):
        """Final chunk for slot s: extract the slot into the single-stream
        path, decode to completion, reset the slot, return results.

        Returns (yseq, xpos, score) of the best final hypothesis.
        """
        if last_audio is not None and np.asarray(last_audio).dtype == np.int16:
            # Same exact normalization as tick()/finalize_batch() — int16
            # PCM is the advertised preferred input everywhere.
            last_audio = np.asarray(last_audio, np.float32) / 32767.0
        elif (last_audio is not None
              and np.asarray(last_audio).dtype == np.uint8):
            last_audio = _mulaw_decode(np.asarray(last_audio))
        c = self.c
        cfg = self.cfg
        fin = self._finalizer
        fin.reset()
        st = fin.state

        # Encoder state extraction (capacity buffers → exact-length views).
        raw = (
            self.buffers.raw[s : s + 1, : int(c.raw_len[s]), :]
            if c.raw_len[s] > 0
            else None
        )
        post = (
            self.buffers.post[s : s + 1, : int(c.post_len[s]), :]
            if c.post_len[s] > 0
            else None
        )
        if c.npb[s] > 0 or c.has_prev[s] or raw is not None or post is not None:
            st.enc_state = EncoderState(
                prev_addin=(
                    self.buffers.prev_addin[s : s + 1]
                    if c.has_prev[s]
                    else None
                ),
                buf_before=raw,
                buf_after=post,
                n_processed_blocks=int(c.npb[s]),
                past_ctx=(
                    self.buffers.past_ctx[s : s + 1] if c.has_past[s] else None
                ),
            )
        if c.buf_len[s] > 0:
            st.enc_buf = self.buffers.enc_out[s : s + 1, : int(c.buf_len[s]), :]
        st.vis_len = int(c.vis_len[s])
        st.processed_block = int(c.processed_block[s])
        st.process_idx = int(self.process_idx_dev[s])
        st.output_index = int(self.output_index_dev[s])

        # Beam arrays slice (S=1).
        b = self.beam
        a = self.arrays
        st.arrays = BeamArrays(
            yseq=a.yseq[s : s + 1],
            xpos=a.xpos[s : s + 1],
            lane=a.lane[s : s + 1],
            ylen=a.ylen[s : s + 1],
            score=a.score[s : s + 1],
            score_dec=a.score_dec[s : s + 1],
            score_ctc=a.score_ctc[s : s + 1],
            ctc=CTCScorerState(
                logp=a.ctc.logp[s : s + 1],
                enc_len=a.ctc.enc_len[s : s + 1],
                r=a.ctc.r[s : s + 1],
                s=a.ctc.s[s : s + 1],
            ),
        )
        st.dec_cache = DecoderCache(
            h=self.dec_cache.h[:, s * b : (s + 1) * b],
        )
        if bool(self.prev_valid_dev[s]):
            p = self.prev_arrays
            st.prev_arrays = BeamArrays(
                yseq=p.yseq[s : s + 1],
                xpos=p.xpos[s : s + 1],
                lane=p.lane[s : s + 1],
                ylen=p.ylen[s : s + 1],
                score=p.score[s : s + 1],
                score_dec=p.score_dec[s : s + 1],
                score_ctc=p.score_ctc[s : s + 1],
                ctc=CTCScorerState(
                    logp=p.ctc.logp[s : s + 1],
                    enc_len=p.ctc.enc_len[s : s + 1],
                    r=p.ctc.r[s : s + 1],
                    s=p.ctc.s[s : s + 1],
                ),
            )
        # Memory ring for the finalizer: the engine's enc_out ring rows for
        # this slot (the finalizer's decode rematerializes cross K/V from
        # them, exactly like the engine's own programs).
        st.memory = self.buffers.enc_out[s : s + 1, : self.cfg.max_enc_frames]
        fin.state = st

        # Frontend final: wave buffer (stored right-aligned) + last audio
        # through the exact-length path (reference apply_frontend final).
        wl = int(c.wave_len[s])
        wave = np.asarray(
            self.buffers.wave[s, self.WCAP - wl :] if wl else
            np.zeros(0, np.float32)
        )
        audio = (
            np.concatenate([wave, np.asarray(last_audio, np.float32)])
            if last_audio is not None and len(last_audio)
            else wave
        )
        if len(audio) <= cfg.win_length:
            # Pad to exactly win_length (reference apply_frontend :308-315).
            audio = np.concatenate(
                [audio, np.zeros(cfg.win_length - len(audio), np.float32)]
            )
        feats = self.model.frontend(jnp.asarray(audio))
        if not c.first_wave[s] and feats.shape[1] > self.trim:
            feats = feats[:, self.trim :, :]

        fin.process_block(feats, is_final=True)
        yseq, xpos, score = fin.best_hypothesis()
        self._reset_slot(s)
        self.c.active[s] = False
        return yseq, xpos, score

    def finalize_batch(
        self, finals: Dict[int, Optional[np.ndarray]]
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray, float]]:
        """Finalize several slots with a CONSTANT number of device programs.

        The per-slot `finalize` runs ~10 variable-shape programs per final
        (state extraction slices, exact-length frontend, per-block decode);
        at high stream counts with utterance churn that serializes on the
        program-dispatch latency. Here ALL concurrently finalizing streams
        share one batched final-encode (`_fused_final_encode`), the common
        drain/final `_fused_round`s (the `block_final` mask that
        decode_block_device already carries), one row-gather readback, and
        one batched slot reset.

        Slots that need the reference's short-segment encoder path
        (npb==0 and ≤1 block of frames: models/encoder.py:553-554) or an
        oversize (>1 chunk) tail fall back to the parity-tested
        single-stream finalizer; a slot AT ring capacity is clamped to a
        decode-only drain instead (see below). A fallback slot whose
        finalize raises is quarantined (reset, absent from the result)
        rather than poisoning the already-finalized batch.

        Returns slot → (yseq, xpos, score), token-exact vs `finalize`
        (except the capacity-clamp case, where `finalize` raises).
        """
        c = self.c
        cfg = self.cfg
        from speechcatcher_tpu.models.encoder import subsampled_len

        items: Dict[int, np.ndarray] = {}
        oversize: List[int] = []
        for s, a in finals.items():
            if not c.active[s]:
                continue
            a = (np.zeros(0, np.float32) if a is None
                 else np.asarray(a).reshape(-1))
            if a.dtype == np.int16:
                a = a.astype(np.float32) / 32767.0
            elif a.dtype == np.uint8:
                # mu-law wire: finals carry <= one chunk each, so decode
                # on host (exactly wire.mulaw_decode == the device ingest).
                a = _mulaw_decode(a)
            else:
                a = a.astype(np.float32)
            if len(a) > self.A:
                # Staging backlog: the tail exceeds one tick's chunk. The
                # single-stream finalizer handles arbitrary lengths (and
                # raises loudly past ring capacity).
                oversize.append(s)
            items[s] = a
        if not items:
            return {}

        bs, hop_b, la = cfg.block_size, cfg.hop_size, cfg.look_ahead
        offset = bs - la - hop_b
        win, hop = cfg.win_length, cfg.hop_length

        batch: List[int] = []
        fallback: List[int] = list(oversize)
        oversize_set = set(oversize)
        meta: Dict[int, Tuple[int, ...]] = {}
        for s, a in items.items():
            if s in oversize_set:
                continue
            total = int(c.wave_len[s]) + len(a)
            total_p = max(total, win)
            if total_p <= cfg.n_fft // 2 + 1:
                # _final_frontend's slice-based right reflection assumes
                # total_p > pad (true whenever win_length > n_fft/2, as in
                # the whole zoo); exotic short-window configs route through
                # the exact single-stream finalizer instead.
                fallback.append(s)
                continue
            nf = 1 + total_p // hop
            trim_start = 0 if c.first_wave[s] else self.trim
            # Consume-all on final: even a 1-2 frame tail flows through
            # (matches process_block's unconditional final encoder step).
            valid_feats = max(0, nf - trim_start)
            # A dropped tiny tail (valid_feats == 0) still flushes the
            # carried raw/post frames on final — the conv consumes the
            # whole raw carry and the leftover post frames form the final
            # block(s), exactly like the single-stream final step
            # (models/encoder.py::step is_final consume-all; the
            # process_block flush-only branch).
            raw_total = int(c.raw_len[s]) + valid_feats
            n_sub = (max(0, subsampled_len(raw_total, cfg.input_layer))
                     if raw_total > 0 else 0)
            post_total = int(c.post_len[s]) + n_sub
            npb = int(c.npb[s])
            if npb == 0 and 0 < post_total <= bs:
                fallback.append(s)  # short-segment path (_infer_short)
                continue
            if post_total > 0:
                # Final block count + emission length (encoder step
                # is_final semantics: models/encoder.py:535-565).
                bn = max(1, -(-(post_total - offset - la) // hop_b))
                y_emit = post_total if npb == 0 else post_total - offset
            else:
                bn, y_emit = 0, 0  # nothing carried: decode-only drain
            if y_emit < 0:
                fallback.append(s)  # degenerate geometry: exact slow path
                continue
            if int(c.buf_len[s]) + y_emit > self.ECAP:
                # Ring full (capacity stall): clamp to a decode-only drain
                # of the already-ringed frames. The carried sub-block tail
                # (< block_size frames ≈ 0.6 s) is dropped — vastly better
                # than failing the whole ~ring-length utterance (the
                # single-stream finalizer would raise here; serving must
                # degrade gracefully instead, SURVEY §5.3/§5.7).
                logger.warning(
                    "slot %d finalized at ring capacity: dropping %d "
                    "carried frames (decode-only drain)", s, y_emit,
                )
                bn, y_emit = 0, 0
            meta[s] = (total_p, trim_start, valid_feats, n_sub, post_total,
                       bn, y_emit)
            batch.append(s)

        out: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        if batch:
            out.update(self._finalize_compact(batch, items, meta))

        for s in fallback:
            # Per-slot isolation: by the time a fallback slot fails, the
            # compact batch may already have finalized AND reset its own
            # slots — raising here would discard those computed results
            # and tempt the caller into re-finalizing reset slots.
            # Quarantine the failing slot instead; it is simply absent
            # from the returned dict (SURVEY §5.3 isolation).
            try:
                out[s] = self.finalize(s, items[s])
            except Exception:
                logger.exception("finalize failed for slot %d; "
                                 "quarantining", s)
                try:
                    self._reset_slot(s)
                finally:
                    self.c.active[s] = False
        return out

    def _finalize_compact(
        self,
        batch: List[int],
        items: Dict[int, np.ndarray],
        meta: Dict[int, Tuple[int, ...]],
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray, float]]:
        """Run the batched finalization at compact width F (padded to a
        power-of-two bucket): extract the F slots' state in one gather
        program, final-encode + drain + final beam rounds on the F-wide
        copies, one readback, one batched reset of the big state. Beam-step
        HBM traffic scales with F, not the engine's S — essential because
        the final block may burst to max_length steps (BBD disabled, like
        the reference's final block)."""
        c = self.c
        cfg = self.cfg
        bs, hop_b, la = cfg.block_size, cfg.hop_size, cfg.look_ahead

        f_real = len(batch)
        f_pad = 4
        while f_pad < f_real:
            f_pad *= 2
        # Pad with repeats of the first row; padded rows never step.
        rows_list = batch + [batch[0]] * (f_pad - f_real)
        rows = jnp.asarray(np.array(rows_list, np.int32))

        (cb, carr, cprev, ccache, cpv, cpi, coi) = _extract_rows(
            self.buffers, self.arrays, self.prev_arrays, self.dec_cache,
            self.prev_valid_dev, self.process_idx_dev,
            self.output_index_dev, rows, self.beam,
        )

        # Compact host counters.
        do_f = np.zeros(f_pad, bool)
        do_f[:f_real] = True
        buf_f = c.buf_len[rows_list].astype(np.int64).copy()
        vis_f = c.vis_len[rows_list].astype(np.int64).copy()
        pb_f = c.processed_block[rows_list].astype(np.int64).copy()

        maxb = max(meta[s][5] for s in batch)
        if maxb > 0:
            audio = np.zeros((f_pad, self.A), np.float32)
            ints = np.zeros((15, f_pad), np.int32)
            for i, s in enumerate(batch):
                (total_p, trim_start, valid_feats, n_sub, post_total,
                 bn, y_emit) = meta[s]
                audio[i, : len(items[s])] = items[s]
                ints[:, i] = (c.wave_len[s], total_p, trim_start,
                              c.raw_len[s], valid_feats, c.post_len[s],
                              n_sub, bn, c.npb[s], post_total, y_emit,
                              c.has_prev[s], c.has_past[s], c.npb[s] == 0,
                              buf_f[i])
            new_enc = _fused_final_encode(
                self.model.params, self.model.enc_pe, cb,
                jnp.asarray(audio), jnp.asarray(ints),
                self.model.frontend.window, self.model.frontend.mel_fb,
                self.model.frontend.mean, self.model.frontend.inv_std,
                cfg, maxb,
                cfg.n_fft, cfg.hop_length, self.FCAP, self.SUBCAP,
            )
            cb = cb._replace(enc_out=new_enc)
            for i, s in enumerate(batch):
                buf_f[i] += meta[s][6]

        # A single l/t bound for every compact round: full token capacity
        # (the final block may emit up to max_length tokens — a bucketed
        # l_bound would pause mid-block and silently truncate; at width F
        # the extra per-step traffic is negligible).
        l_bound = min(self.max_length + 2, cfg.max_tokens)
        t_bound = self._bucket(int(buf_f.max()) + 1, self.ECAP, floor=128)

        # Host-side dry simulation of the drain schedule: asserts every
        # round's extension fits EXTCAP (the device loop clips silently).
        # Also records the largest gather start (visible in
        # _last_drain_max_start) so tests can prove the near-capacity
        # clip-regression zone (start > ECAP-EXTCAP) was actually entered.
        vis_sim, pb_sim = vis_f.copy(), pb_f.copy()
        max_start = -1
        while True:
            cur_end = bs - la + hop_b * pb_sim
            ready = do_f & (cur_end < buf_f)
            if not ready.any():
                break
            ext = np.where(ready, np.minimum(cur_end, buf_f) - vis_sim, 0)
            assert ext.max() <= self.EXTCAP, (ext.max(), self.EXTCAP)
            max_start = max(max_start, int(vis_sim[ready].max()))
            vis_sim = np.where(ready, cur_end, vis_sim)
            pb_sim = pb_sim + ready
        fin = do_f & (buf_f > 0)
        ext = np.where(fin, buf_f - vis_sim, 0)
        assert ext.max() <= self.EXTCAP, (ext.max(), self.EXTCAP)
        if fin.any():
            max_start = max(max_start, int(vis_sim[fin].max()))
        self._last_drain_max_start = max_start

        # Drain remaining full blocks + each stream's final block in ONE
        # device program (outer while_loop; see _fused_drain).
        dev_state = BlockDecodeState(
            arrays=carr, prev_arrays=cprev, dec_cache=ccache,
            prev_valid=cpv, process_idx=cpi, output_index=coi,
            # Placeholder only — _fused_drain installs the real stepping
            # mask per round from the packed ints4.
            stepping=jnp.zeros(f_pad, dtype=bool),
        )
        res = _fused_drain(
            self.model.params, self.model.dec_pe, cb.enc_out,
            dev_state,
            jnp.asarray(np.stack(
                [vis_f, buf_f, pb_f, do_f]
            ).astype(np.int32)),
            cfg, self.beam, self.pre_beam,
            self.ctc_weight, self.use_bbd, self.max_length,
            l_bound, t_bound, self.EXTCAP, self.penalty,
            self.eos_commit,
        )
        carr = res.arrays

        # Readback: one packed [ylen | yseq | xpos | score] D2H (one relay
        # round trip; rows padded to the F bucket so the gather program
        # has ONE shape per f_pad).
        packed_h = np.asarray(_gather_final_rows(
            carr, jnp.arange(f_pad, dtype=jnp.int32)
        ))
        lcap = carr.yseq.shape[2]
        out = {}
        for i, s in enumerate(batch):
            n = int(packed_h[i, 0])
            yseq_h = packed_h[i, 1 : 1 + n].astype(np.int64)
            xpos_h = packed_h[i, 1 + lcap : 1 + lcap + n].astype(np.int64)
            out[s] = (yseq_h, xpos_h, float(packed_h[i, -1]))
        self._reset_slots(batch)
        for s in batch:
            c.active[s] = False
        return out
