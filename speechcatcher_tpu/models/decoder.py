"""Transformer decoder — full forward (training) + incremental beam-step.

Replicates /root/reference/speechcatcher/model/decoder/transformer_decoder.py
and decoder_layer.py with a TPU-native incremental design:

The reference caches each layer's *output prefix* and recomputes K/V
projections over the whole prefix every step (decoder_layer.py:85-95). Here
the K/V projections themselves are cached in fixed-capacity (Lmax) buffers —
numerically identical (prefix layer inputs never change between steps, so
their K/V are constants) but O(1) projection work per step and static shapes.
The cache is LAZILY REORDERED: beam pruning permutes a small per-position
lane map instead of the buffers, so rows are append-only — no per-step cache
gather, and rollback/rewind need no cache snapshot at all.

Cross-attention K/V over the growing encoder buffer are NOT cached: each
beam step rematerializes them from the raw encoder frames (shared by all
hypotheses of a stream) — see the NOTE above decoder_step.
"""

from __future__ import annotations

import functools
import math
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
    """Per-hypothesis self-attention KV cache (fixed capacity Lmax)."""

    k: jnp.ndarray  # (L, N, Lmax, d)
    v: jnp.ndarray  # (L, N, Lmax, d)


def init_decoder_cache(cfg: ModelConfig, n_hyps: int) -> DecoderCache:
    shape = (cfg.decoder_layers, n_hyps, cfg.max_tokens, cfg.decoder_dim)
    dt = cfg.cache_jnp_dtype
    return DecoderCache(k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt))


# NOTE on cross-attention memory: there is deliberately NO cross-KV cache.
# decoder_step REMATERIALIZES each layer's memory K/V from the raw encoder
# frames on every beam step (see the docstring there). Caching them — the
# reference's design (/root/reference/speechcatcher/model/decoder/
# transformer_decoder.py forward_one_step precomputes memory projections) —
# costs L×2 capacity-shaped (S, Tmax, d) buffers per stream (9.4 MB/stream
# at the flagship serving shape, 38% of the per-stream HBM budget) AND
# 6× the per-step HBM reads of the raw frames; on TPU the recompute is two
# (S·T, d)×(d, d) MXU matmuls per layer that hide under the link-bound
# serving tick.


def _attend_cached_lane(
    q: jnp.ndarray,        # (N, d) single query per hyp, laid out (S, B)
    k: jnp.ndarray,        # (N, T, d) append-only lane-resident rows
    v: jnp.ndarray,        # (N, T, d)
    k_self: jnp.ndarray,   # (N, d) this step's key (query token's row)
    v_self: jnp.ndarray,   # (N, d)
    lane_onehot: jnp.ndarray,  # (S, B, B, T) one-hot of the lane map
    hist_valid: jnp.ndarray,   # (N, T) bool — t < pos (history positions)
    beam: int,
    n_head: int,
) -> jnp.ndarray:
    """Self-attention over a lazily-reordered KV cache.

    Cache rows are never permuted after beam pruning; instead the lane map
    records which physical lane (0..B-1, within the stream's B-row group)
    holds position t's row of each hypothesis's lineage. Rather than
    materializing lane-gathered copies of K and V (a profile showed the
    two row gathers plus their layout/convert copies cost ~5 ms per layer
    per beam step at S=176 — the dominant decode cost), attention runs
    ALL-PAIRS against the B resident lanes and contracts with the one-hot
    lane map: an extra S·B²·T·d matmul (~0.6 GFLOP, MXU noise) in exchange
    for reading each cache slice exactly once, contiguously. Exactness:
    the one-hot contraction selects the same rows the gather would (terms
    with weight 0 are exactly 0).

    The current token's K/V never round-trips through the cache — it joins
    the score matrix directly, so masked (non-stepping) streams read no
    just-written rows."""
    n, t, d = k.shape
    s = n // beam
    dk = d // n_head
    qh = q.reshape(s, beam, n_head, dk).astype(k.dtype)
    kh = k.reshape(s, beam, t, n_head, dk)
    vh = v.reshape(s, beam, t, n_head, dk)
    # scores_all[s,b,c,h,t] = q of hyp b · K row of lane c at position t.
    scores_all = jnp.einsum(
        "sbhd,scthd->sbcht", qh, kh, preferred_element_type=jnp.float32
    ) / math.sqrt(dk)
    oh = lane_onehot.astype(jnp.float32)
    # onehot_contract keeps the lane selection of the f32 scores exact
    # without Precision.HIGHEST (see ops/layers.py).
    scores = onehot_contract("sbcht,sbct->sbht", scores_all, oh)
    scores = scores.reshape(n, n_head, t)
    scores = jnp.where(hist_valid[:, None, :], scores, MASK_MIN)
    self_score = jnp.einsum(
        "nhd,nhd->nh", q.reshape(n, n_head, dk).astype(k.dtype),
        k_self.reshape(n, n_head, dk).astype(k.dtype),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(dk)
    scores = jnp.concatenate([scores, self_score[:, :, None]], axis=2)
    attn = jax.nn.softmax(scores, axis=-1)
    hist_attn = jnp.where(hist_valid[:, None, :], attn[:, :, :t], 0.0)
    # out[b] = Σ_t w[b,t]·V[lane[b,t],t] = Σ_c Σ_t (w[b,t]·oh[b,c,t])·V[c,t]
    w_lane = hist_attn.reshape(s, beam, n_head, t)[:, :, None] * (
        oh[:, :, :, None, :]
    )                                                  # (S, B, C, H, T)
    out = jnp.einsum("sbcht,scthd->sbhd", w_lane.astype(v.dtype), vh,
                     preferred_element_type=jnp.float32)
    out = out.reshape(n, n_head, dk)
    v_self_h = v_self.reshape(n, n_head, dk).astype(jnp.float32)
    out = out + attn[:, :, t][:, :, None] * v_self_h
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
    """Cross-attention without duplicating K/V per hypothesis: all B beam
    hypotheses of a stream share its memory cache."""
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
    (the raw encoder-output ring the caller already keeps): two
    (S·T, d)×(d, d) MXU matmuls per layer per step instead of storing
    L×2 capacity-shaped bf16 buffers per stream AND re-reading them from
    HBM each step. Values are identical to the cached design: the same
    linear() on the same frames, cast to the same cache dtype (including
    the finite-sanitization the cached append applied — stale/NaN rows
    past enc_len must stay finite or 0·NaN would leak through the masked
    value contraction)."""
    n = tokens.shape[0]
    d = cfg.decoder_dim
    lmax = cache.k.shape[2]   # capacity comes from the (possibly sliced) cache
    tmax = memory.shape[1]
    cache_dt = cache.k.dtype

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

    def body(carry, layer_in):
        h = carry  # (N, d)
        p_layer, k_l, v_l = layer_in
        # Rematerialize this layer's memory K/V from the raw frames —
        # identical math (and cast) to the retired cached-extend path.
        mk_l = linear(p_layer["src_attn"]["linear_k"], memory)
        mv_l = linear(p_layer["src_attn"]["linear_v"], memory)
        mk_l = jnp.where(jnp.isfinite(mk_l), mk_l, 0.0).astype(cache_dt)
        mv_l = jnp.where(jnp.isfinite(mv_l), mv_l, 0.0).astype(cache_dt)
        # Self-attention with lane-mapped KV cache.
        residual = h
        hn = layer_norm(p_layer["norm1"], h)
        k_new = linear(p_layer["self_attn"]["linear_k"], hn)
        v_new = linear(p_layer["self_attn"]["linear_v"], hn)
        k_l = k_l.at[rows, pos_w].set(k_new.astype(k_l.dtype), mode="drop")
        v_l = v_l.at[rows, pos_w].set(v_new.astype(v_l.dtype), mode="drop")
        q = linear(p_layer["self_attn"]["linear_q"], hn)
        att = _attend_cached_lane(
            q, k_l, v_l, k_new, v_new, lane_onehot, hist_valid, beam,
            cfg.decoder_heads,
        )
        h = residual + linear(p_layer["self_attn"]["linear_out"], att)
        # Cross-attention over per-stream cached memory K/V.
        residual = h
        hn = layer_norm(p_layer["norm2"], h)
        q = linear(p_layer["src_attn"]["linear_q"], hn)
        att = _attend_cross_blocked(q, mk_l, mv_l, mem_valid,
                                    cfg.decoder_heads)
        h = residual + linear(p_layer["src_attn"]["linear_out"], att)
        # FFN.
        residual = h
        hn = layer_norm(p_layer["norm3"], h)
        h = residual + feed_forward(p_layer["feed_forward"], hn)
        return h, (k_l, v_l)

    (h, (new_k, new_v)) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v)
    )
    if cfg.normalize_before:
        h = layer_norm(params["after_norm"], h)
    logits = linear(params["output_layer"], h)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return logp, DecoderCache(k=new_k, v=new_v)


