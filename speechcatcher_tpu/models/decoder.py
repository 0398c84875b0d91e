"""Transformer decoder — full forward (training) + incremental beam-step.

Replicates /root/reference/speechcatcher/model/decoder/transformer_decoder.py
and decoder_layer.py with a TPU-native incremental design:

The reference caches each layer's *output prefix* and recomputes K/V
projections over the whole prefix every step (decoder_layer.py:85-95). Here
each layer's post-norm1 ACTIVATIONS are cached in ONE fixed-capacity (Lmax)
buffer — numerically identical (prefix layer inputs never change between
steps), static shapes, and half the bytes of a K+V cache: the K/V
projections commute to the query/output side of the attention
(_attend_cached_lane), so the per-step projection cost is independent of
the prefix length. The cache is LAZILY REORDERED: beam pruning permutes a
small per-position lane map instead of the buffers, so rows are
append-only — no per-step cache gather, and rollback/rewind need no cache
snapshot at all.

Cross-attention K/V over the growing encoder buffer are NOT cached: each
beam step rematerializes them from the raw encoder frames (shared by all
hypotheses of a stream) — see the NOTE above decoder_step.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.ops.layers import (
    MASK_MIN,
    Params,
    feed_forward,
    onehot_contract,
    init_ffn,
    init_layer_norm,
    init_linear,
    init_mha,
    layer_norm,
    linear,
    multi_head_attention,
    sinusoidal_pe_table,
)


def init_decoder_params(key: jax.Array, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 8)
    d = cfg.decoder_dim

    embed = {
        "weight": jax.random.normal(keys[0], (cfg.vocab_size, d)) * 1.0
    }

    def one_layer(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "self_attn": init_mha(k1, d),
            "src_attn": init_mha(k2, d),
            "feed_forward": init_ffn(k3, d, cfg.decoder_linear_units),
            "norm1": init_layer_norm(d),
            "norm2": init_layer_norm(d),
            "norm3": init_layer_norm(d),
        }

    lkeys = jax.random.split(keys[1], cfg.decoder_layers)
    layers = [one_layer(k) for k in lkeys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": embed,
        "layers": stacked,
        "after_norm": init_layer_norm(d),
        "output_layer": init_linear(keys[2], d, cfg.vocab_size),
    }


def decoder_pe_table(cfg: ModelConfig) -> jnp.ndarray:
    return jnp.asarray(sinusoidal_pe_table(cfg.decoder_dim, cfg.pos_enc_max_len))


# ---------------------------------------------------------------------------
# Full-sequence forward (training / teacher forcing)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def decoder_forward_train(
    params: Params,
    memory: jnp.ndarray,        # (B, Tm, d)
    memory_lens: jnp.ndarray,   # (B,)
    ys_in: jnp.ndarray,         # (B, L) token ids
    ys_in_lens: jnp.ndarray,    # (B,)
    cfg: ModelConfig,
    pe: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, L, vocab) logits (reference transformer_decoder.py:154-208)."""
    if pe is None:
        pe = decoder_pe_table(cfg)
    b, l = ys_in.shape
    d = cfg.decoder_dim

    x = params["embed"]["weight"][ys_in] * math.sqrt(d) + pe[None, :l, :]

    causal = jnp.tril(jnp.ones((l, l), dtype=bool))
    pad = jnp.arange(l)[None, :] < ys_in_lens[:, None]
    tgt_mask = (pad[:, None, :] & causal[None, :, :]).astype(jnp.float32)
    mem_mask = (
        jnp.arange(memory.shape[1])[None, :] < memory_lens[:, None]
    ).astype(jnp.float32)[:, None, :]

    def body(h, p_layer):
        residual = h
        hn = layer_norm(p_layer["norm1"], h)
        h = residual + multi_head_attention(
            p_layer["self_attn"], hn, hn, hn, tgt_mask, cfg.decoder_heads
        )
        residual = h
        hn = layer_norm(p_layer["norm2"], h)
        h = residual + multi_head_attention(
            p_layer["src_attn"], hn, memory, memory, mem_mask, cfg.decoder_heads
        )
        residual = h
        hn = layer_norm(p_layer["norm3"], h)
        h = residual + feed_forward(p_layer["feed_forward"], hn)
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x)
    return linear(params["output_layer"], x)


# ---------------------------------------------------------------------------
# Incremental decoding with fixed-capacity KV caches
# ---------------------------------------------------------------------------

class DecoderCache(NamedTuple):
    """Per-hypothesis self-attention activation cache (capacity Lmax).

    Stores each layer's post-norm1 hidden state hn(t) — ONE
    (L, N, Lmax, d) ring instead of separate K and V rings. K and V are
    linear maps of hn, so the attention commutes around the cache:
    scores  q·(W_k h) = (W_kᵀ q)·h   and   values  Σ_t w_t (W_v h_t)
    = W_v (Σ_t w_t h_t) — the projections move to the (N, d)-sized query/
    output side, whose cost is independent of the prefix length. Halves
    the dominant per-stream HBM buffer AND each step's cache reads and
    append scatters; the K bias cancels in the softmax and the V bias
    folds to a single +b_v (softmax weights sum to 1). See
    _attend_cached_lane."""

    h: jnp.ndarray  # (L, N, Lmax, d)


def init_decoder_cache(cfg: ModelConfig, n_hyps: int) -> DecoderCache:
    shape = (cfg.decoder_layers, n_hyps, cfg.max_tokens, cfg.decoder_dim)
    return DecoderCache(h=jnp.zeros(shape, cfg.cache_jnp_dtype))


# NOTE on cross-attention memory: there is deliberately NO cross-KV cache.
# decoder_step REMATERIALIZES each layer's memory K/V from the raw encoder
# frames inside the step program. Caching K/V across steps — the
# reference's design (/root/reference/speechcatcher/model/decoder/
# transformer_decoder.py forward_one_step precomputes memory projections) —
# costs L×2 capacity-shaped (S, Tmax, d) buffers per stream (9.4 MB/stream
# at the flagship serving shape, 38% of the per-stream HBM budget) AND
# 6× the per-step HBM reads of the raw frames. The projection LOOKS like
# per-step work, but the memory is loop-invariant across a block's beam
# steps, so XLA hoists it out of the `lax.while_loop` — per-ROUND cost on
# big MXU-friendly GEMMs. An alternative that folds the projections onto
# the query/output side (_attend_cross_commuted, SC_TPU_CROSS=commuted)
# eliminates those GEMMs entirely but pays d-contraction (not
# dk-contraction) score/value einsums on EVERY step: measured slower at
# scale (S=640: 528 vs 387 ms mean tick) — see _CROSS_IMPL.


# Cross-attention implementation switch, read once at import: "remat"
# (default: per-layer K/V projection from the raw ring) or "commuted"
# (_attend_cross_commuted). Measured head-to-head on the chip at S=640
# with churn (round 4): remat mean tick 387 ms vs commuted 528 ms. The
# memory is LOOP-INVARIANT across a block's beam steps, so XLA hoists the
# remat projection out of the step loop (per-round cost), while the
# commute pays d-contraction score/value einsums (n_head× the FLOPs of
# dk-contraction attention, ADVICE r03) on EVERY step. The commuted form
# wins only where the operand grows per step — which is exactly the
# self-attention activation cache (_attend_cached_lane), where it stays.
_CROSS_IMPL = os.environ.get("SC_TPU_CROSS", "remat")


def _dense_weight(p: Params) -> jnp.ndarray:
    """Torch-layout (out, in) weight as a dense float array (dequantizing
    the opt-in int8 storage — a (d, d) dequant is step noise)."""
    w = p["weight"]
    if w.dtype == jnp.int8:
        return w.astype(jnp.float32) * p["weight_scale"][:, None]
    return w


def _attend_cached_lane(
    q: jnp.ndarray,         # (N, d) single query per hyp, laid out (S, B)
    hh: jnp.ndarray,        # (N, T, d) append-only lane-resident hn rows
    hn_self: jnp.ndarray,   # (N, d) this step's post-norm1 hidden
    p_attn: Params,         # this layer's self_attn params
    lane_onehot: jnp.ndarray,  # (S, B, B, T) one-hot of the lane map
    hist_valid: jnp.ndarray,   # (N, T) bool — t < pos (history positions)
    beam: int,
    n_head: int,
) -> jnp.ndarray:
    """Self-attention over a lazily-reordered ACTIVATION cache.

    Cache rows are never permuted after beam pruning; instead the lane map
    records which physical lane (0..B-1, within the stream's B-row group)
    holds position t's row of each hypothesis's lineage. Attention runs
    ALL-PAIRS against the B resident lanes and contracts with the one-hot
    lane map (reading each cache slice exactly once, contiguously; terms
    with weight 0 are exactly 0 — see onehot_contract).

    The cache stores hn(t), not K/V: the projections commute to the
    query/output side —
      score_h(q, t) = q_h · (W_k hn_t)_h = (W_k[h]ᵀ q_h) · hn_t
      out_h         = Σ_t w_t (W_v hn_t + b_v)_h
                    = W_v[h] (Σ_t w_t hn_t) + b_v[h]      (Σ w = 1)
    so per-step projection cost is two (N, d)×(d, d) contractions
    (independent of the prefix length T), cache bytes/reads/writes halve,
    and the K bias drops out of the softmax entirely (a per-row constant
    added to every score). The current token's row never round-trips
    through the cache — it joins the score matrix directly, so masked
    (non-stepping) streams read no just-written rows."""
    n, t, d = hh.shape
    s = n // beam
    dk = d // n_head
    # bf16 inputs take the fast MXU path on TPU; CPU's DotThunk rejects
    # BF16×BF16=F32 dots, so non-TPU backends contract in f32 (see the
    # same split in ops/layers.py::onehot_contract).
    dot_dt = hh.dtype if jax.default_backend() == "tpu" else jnp.float32
    wk = _dense_weight(p_attn["linear_k"]).reshape(n_head, dk, d)
    wv = _dense_weight(p_attn["linear_v"]).reshape(n_head, dk, d)
    qh = q.reshape(n, n_head, dk)
    # q' = W_k[h]ᵀ q_h — the K projection folded into the query.
    qk = jnp.einsum("nhk,hkd->nhd", qh.astype(dot_dt), wk.astype(dot_dt),
                    preferred_element_type=jnp.float32)
    qk = qk.reshape(s, beam, n_head, d).astype(dot_dt)
    hhl = hh.reshape(s, beam, t, d).astype(dot_dt)
    # scores_all[s,b,c,h,t] = q' of hyp b · hn row of lane c at position t.
    scores_all = jnp.einsum(
        "sbhd,sctd->sbcht", qk, hhl, preferred_element_type=jnp.float32
    ) / math.sqrt(dk)
    oh = lane_onehot.astype(jnp.float32)
    # onehot_contract keeps the lane selection of the f32 scores exact
    # without Precision.HIGHEST (see ops/layers.py).
    scores = onehot_contract("sbcht,sbct->sbht", scores_all, oh)
    scores = scores.reshape(n, n_head, t)
    scores = jnp.where(hist_valid[:, None, :], scores, MASK_MIN)
    self_score = jnp.einsum(
        "nhd,nd->nh", qk.reshape(n, n_head, d),
        hn_self.astype(dot_dt), preferred_element_type=jnp.float32,
    ) / math.sqrt(dk)
    scores = jnp.concatenate([scores, self_score[:, :, None]], axis=2)
    attn = jax.nn.softmax(scores, axis=-1)
    hist_attn = jnp.where(hist_valid[:, None, :], attn[:, :, :t], 0.0)
    # u[b] = Σ_t w[b,t]·hn[lane[b,t],t] = Σ_c Σ_t (w[b,t]·oh[b,c,t])·hn[c,t]
    w_lane = hist_attn.reshape(s, beam, n_head, t)[:, :, None] * (
        oh[:, :, :, None, :]
    )                                                  # (S, B, C, H, T)
    u = jnp.einsum("sbcht,sctd->sbhd", w_lane.astype(dot_dt), hhl,
                   preferred_element_type=jnp.float32)
    u = u.reshape(n, n_head, d)
    u = u + attn[:, :, t][:, :, None] * hn_self.astype(jnp.float32)[:, None]
    # Deferred V projection on the weighted sum; softmax weights sum to 1,
    # so the V bias contributes exactly b_v once.
    out = jnp.einsum("nhd,hkd->nhk", u.astype(dot_dt), wv.astype(dot_dt),
                     preferred_element_type=jnp.float32)
    bias = p_attn["linear_v"].get("bias")
    if bias is not None:
        out = out + bias.astype(jnp.float32).reshape(n_head, dk)
    return out.reshape(n, d)


def _attend_cross_commuted(
    q: jnp.ndarray,      # (N, d) queries, hyps laid out as (S, B) blocks
    mem: jnp.ndarray,    # (S, T, d) raw encoder frames (sanitized)
    p_attn: Params,      # this layer's src_attn params
    valid: jnp.ndarray,  # (S, T) bool
    n_head: int,
) -> jnp.ndarray:
    """Cross-attention DIRECTLY on the raw encoder frames: the K/V
    projections commute around the memory exactly like the self-attention
    activation cache (_attend_cached_lane) —
      score_h(q, t) = q_h · (W_k m_t + b_k)_h
                    = (W_k[h]ᵀ q_h) · m_t  + const(t)   (b_k cancels in
                                                         the softmax)
      out_h         = Σ_t w_t (W_v m_t + b_v)_h
                    = W_v[h] (Σ_t w_t m_t) + b_v[h]     (Σ_t w_t = 1)
    so the per-step memory projections (2 T×d² MACs per layer — the
    dominant FLOPs of the finalization drain, whose final block bursts to
    tens of beam steps over the full ring) collapse to two d×d query/
    output folds, T-independent. The frames are read exactly twice per
    layer (score + weighted-sum contractions) instead of projected,
    written, and re-read. ~d/(B·H) ≈ 13× fewer FLOPs per step at the
    serving shape; identical math modulo float reassociation (the same
    trade _attend_cached_lane already makes vs the reference's cached
    K/V — reference transformer_decoder.py precomputes memory K/V
    per-utterance, which costs L×2 capacity-shaped rings per stream)."""
    s, t, d = mem.shape
    n = q.shape[0]
    b = n // s
    dk = d // n_head
    # bf16 contractions take the fast MXU path on TPU; CPU's DotThunk
    # rejects BF16×BF16=F32 dots, so non-TPU backends contract in f32.
    dot_dt = mem.dtype if jax.default_backend() == "tpu" else jnp.float32
    wk = _dense_weight(p_attn["linear_k"]).reshape(n_head, dk, d)
    wv = _dense_weight(p_attn["linear_v"]).reshape(n_head, dk, d)
    qh = q.reshape(s, b, n_head, dk)
    # q' = W_k[h]ᵀ q_h — the K projection folded into the query (d² MACs).
    qk = jnp.einsum("sbhk,hkd->sbhd", qh.astype(dot_dt), wk.astype(dot_dt),
                    preferred_element_type=jnp.float32).astype(dot_dt)
    memd = mem.astype(dot_dt)
    scores = jnp.einsum("sbhd,std->sbht", qk, memd,
                        preferred_element_type=jnp.float32) / math.sqrt(dk)
    scores = jnp.where(valid[:, None, None, :], scores, MASK_MIN)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(valid[:, None, None, :], attn, 0.0)
    # u_h = Σ_t w_t m_t, then ONE deferred V projection on the weighted
    # sum; the softmax weights sum to 1 so b_v contributes exactly once.
    u = jnp.einsum("sbht,std->sbhd", attn.astype(dot_dt), memd,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("sbhd,hkd->sbhk", u.astype(dot_dt), wv.astype(dot_dt),
                     preferred_element_type=jnp.float32)
    bias = p_attn["linear_v"].get("bias")
    if bias is not None:
        # Σw = 1 only when the stream HAS visible frames; on an
        # all-invalid row (a padded/just-reset lane in the fixed-shape
        # batch) the weights were zeroed above, so the deferred b_v must
        # be suppressed to keep the equivalence with
        # _attend_cross_blocked (which returns exactly 0 there).
        has_mem = valid.any(axis=-1)[:, None, None, None]  # (S,1,1,1)
        out = out + jnp.where(
            has_mem, bias.astype(jnp.float32).reshape(n_head, dk), 0.0)
    return out.reshape(n, d)


# NB: no buffer donation — beam-search rewind/rollback keeps references to
# previous cache snapshots (free under JAX immutability).
def _attend_cross_blocked(
    q: jnp.ndarray,      # (N, d) queries, hyps laid out as (S, B) blocks
    mk: jnp.ndarray,     # (S, T, d) per-stream memory keys
    mv: jnp.ndarray,     # (S, T, d)
    valid: jnp.ndarray,  # (S, T) bool
    n_head: int,
) -> jnp.ndarray:
    """Cross-attention over explicitly projected K/V (the textbook
    formulation). This IS the hot path under the default
    SC_TPU_CROSS=remat: decoder_step projects each layer's K/V from the
    raw encoder ring and calls this (XLA hoists the loop-invariant
    projection out of the beam-step loop — see _CROSS_IMPL). It doubles
    as the independent baseline the commuted A/B form is verified
    against (tests/test_decoder.py). All B beam hypotheses of a stream
    share its memory K/V."""
    s, t, d = mk.shape
    n = q.shape[0]
    b = n // s
    dk = d // n_head
    qh = q.reshape(s, b, n_head, dk).astype(mk.dtype)
    kh = mk.reshape(s, t, n_head, dk)
    vh = mv.reshape(s, t, n_head, dk)
    scores = jnp.einsum("sbhd,sthd->sbht", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(dk)
    scores = jnp.where(valid[:, None, None, :], scores, MASK_MIN)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(valid[:, None, None, :], attn, 0.0)
    out = jnp.einsum("sbht,sthd->sbhd", attn.astype(mv.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, d)


@functools.partial(jax.jit, static_argnames=("cfg", "beam"))
def decoder_step(
    params: Params,
    pe: jnp.ndarray,
    cache: DecoderCache,
    memory: jnp.ndarray,       # (S, Tmax, d) raw encoder frames (padded)
    tokens: jnp.ndarray,       # (N,) last token; hyps laid out as (S, B)
    pos: jnp.ndarray,          # (N,) position index of that token (= len-1)
    enc_len: jnp.ndarray,      # (S,) valid encoder frames per stream
    lane: jnp.ndarray,         # (S, B, Lmax) int32 lane map (history rows)
    write: jnp.ndarray,        # (N,) bool — write this step's rows
    cfg: ModelConfig,
    beam: int,
) -> Tuple[jnp.ndarray, DecoderCache]:
    """Score the next token for N = S·B hypotheses.

    Returns (log-probs (N, vocab), cache with this step's rows appended).
    Numerically equivalent to reference forward_one_step
    (transformer_decoder.py:210-251).

    The KV cache is LAZILY REORDERED: rows stay where they were written
    (hyp b's step-p row lives at lane b, position p, forever); beam pruning
    permutes only the small `lane` index map, not the (L, N, Lmax, d)
    buffers. This removes the full-cache gather per beam step and lets the
    rewind/rollback snapshot drop the cache entirely (rows are append-only;
    a rolled-back step's rows are simply never referenced again). `write`
    masks the scatter for frozen streams, whose stale rows must survive
    (their cached layer inputs were computed under an older encoder
    context, exactly like the reference's cached layer outputs).

    Cross-attention memory K/V are REMATERIALIZED per layer from `memory`
    (the raw encoder-output ring the caller already keeps) instead of
    stored in L×2 capacity-shaped per-stream rings (the reference's
    design): the projection is loop-invariant across a block's beam steps
    and hoists out of the step loop, so it costs per-ROUND MXU GEMMs, not
    per-step HBM rings (see the module NOTE and _CROSS_IMPL for the
    measured A/B vs the commuted alternative). The frames are
    finite-sanitized ONCE before the layer scan (stale/NaN rows past
    enc_len must stay finite or 0·NaN would leak through the masked value
    contraction)."""
    n = tokens.shape[0]
    d = cfg.decoder_dim
    lmax = cache.h.shape[2]   # capacity comes from the (possibly sliced) cache
    tmax = memory.shape[1]
    cache_dt = cache.h.dtype

    x = params["embed"]["weight"][tokens] * math.sqrt(d) + pe[pos]  # (N, d)

    hist_valid = jnp.arange(lmax)[None, :] < pos[:, None]           # (N, Lmax)
    mem_valid = jnp.arange(tmax)[None, :] < enc_len[:, None]        # (S, Tmax)
    # One-hot lane map (layer-invariant — built once, used by every
    # layer's all-pairs attention contraction).
    lane_onehot = jnp.moveaxis(
        jax.nn.one_hot(lane, beam, dtype=jnp.float32), 3, 2
    )                                                   # (S, B, C, Lmax)
    # Frozen streams must not overwrite rows: out-of-range scatter indices
    # are dropped (mode="drop").
    pos_w = jnp.where(write, pos, lmax)
    rows = jnp.arange(n)
    # Finite-sanitize the shared memory once (layer-invariant); the cast
    # mirrors the retired per-layer K/V cast so bf16 rings read bf16.
    mem_s = jnp.where(jnp.isfinite(memory), memory, 0.0).astype(cache_dt)

    def body(carry, layer_in):
        h = carry  # (N, d)
        p_layer, h_l = layer_in
        # Self-attention with the lane-mapped activation cache.
        residual = h
        hn = layer_norm(p_layer["norm1"], h)
        h_l = h_l.at[rows, pos_w].set(hn.astype(h_l.dtype), mode="drop")
        q = linear(p_layer["self_attn"]["linear_q"], hn)
        att = _attend_cached_lane(
            q, h_l, hn, p_layer["self_attn"], lane_onehot, hist_valid,
            beam, cfg.decoder_heads,
        )
        h = residual + linear(p_layer["self_attn"]["linear_out"], att)
        # Cross-attention on the shared raw encoder frames. Default
        # (_CROSS_IMPL="remat"): rematerialize this layer's K/V from the
        # ring — loop-invariant, so XLA hoists the projections out of the
        # beam-step while_loop (measured faster at scale than the
        # commuted form; see _CROSS_IMPL).
        residual = h
        hn = layer_norm(p_layer["norm2"], h)
        q = linear(p_layer["src_attn"]["linear_q"], hn)
        if _CROSS_IMPL == "remat":
            mk_l = linear(p_layer["src_attn"]["linear_k"],
                          mem_s).astype(cache_dt)
            mv_l = linear(p_layer["src_attn"]["linear_v"],
                          mem_s).astype(cache_dt)
            att = _attend_cross_blocked(q, mk_l, mv_l, mem_valid,
                                        cfg.decoder_heads)
        else:
            # A/B control (SC_TPU_CROSS=commuted): K/V folded onto the
            # query/output side — no hoisted GEMMs, but d-contraction
            # einsums on every step.
            att = _attend_cross_commuted(q, mem_s, p_layer["src_attn"],
                                         mem_valid, cfg.decoder_heads)
        h = residual + linear(p_layer["src_attn"]["linear_out"], att)
        # FFN.
        residual = h
        hn = layer_norm(p_layer["norm3"], h)
        h = residual + feed_forward(p_layer["feed_forward"], hn)
        return h, h_l

    h, new_h = jax.lax.scan(body, x, (params["layers"], cache.h))
    if cfg.normalize_before:
        h = layer_norm(params["after_norm"], h)
    logits = linear(params["output_layer"], h)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return logp, DecoderCache(h=new_h)


