"""Vectorized streaming CTC prefix scorer.

Exact reimplementation of the math in the reference CTCPrefixScoreTH
(/root/reference/speechcatcher/beam_search/ctc_prefix_score_full.py), itself
ESPnet's batch CTC prefix scorer (Watanabe et al., hybrid CTC/attention),
restructured for TPU:

1. **Scores need no recursion.** log_psi(h·c) = lse_t(phi[t-1] + x_n[t,c])
   ⊕ r_init — every term derives from the *previous* step's forward
   variables r_prev (reference :249-281). Scoring K candidates is one
   elementwise pass + masked logsumexp over frames, fully parallel on the
   VPU, instead of the reference's per-frame Python loop (:229-246).
2. **Recursion only for survivors.** The O(T) forward recursion producing
   the next-step state r runs only for the B chosen extensions per stream
   (not B·K candidates), expressed as a log-semiring matrix associative
   scan — O(log T) depth on TPU.

Memory layout is time-minor: log-probs are stored transposed as
(S, V, Tcap) so a candidate's frame row is ONE contiguous lane-aligned
vector (token gathers become row DMAs, not element scatters), and forward
variables are (S, B, 2, Tcap) so every reduction/elementwise op runs along
the 128-lane axis.

logzero = -1e10 (fp32), matching reference :54-58.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from speechcatcher_tpu.ops.layers import onehot_contract

LOGZERO = -1.0e10


def _use_pallas_recursion() -> bool:
    """Pallas kernels run on TPU; other backends use the XLA path."""
    import jax

    return jax.default_backend() == "tpu"


class CTCScorerState(NamedTuple):
    """Device-resident scorer state for a batch of streams."""

    logp: jnp.ndarray     # (S, V, Tcap) CTC log-softmax outputs, time-minor
    enc_len: jnp.ndarray  # (S,) valid frames
    r: jnp.ndarray        # (S, B, 2, Tcap) forward vars [non-blank, blank]
    s: jnp.ndarray        # (S, B) prefix scores


def init_ctc_state(
    n_streams: int, beam: int, t_cap: int, vocab: int,
    ring_dtype=jnp.float32,
) -> CTCScorerState:
    """ring_dtype: storage dtype of the log-prob ring (cfg.ctc_ring_dtype).
    Forward variables and scores are always fp32; bf16 only changes what the
    ring stores — consumers upcast at the gather."""
    return CTCScorerState(
        logp=jnp.zeros((n_streams, vocab, t_cap), dtype=ring_dtype),
        enc_len=jnp.zeros((n_streams,), jnp.int32),
        r=jnp.full((n_streams, beam, 2, t_cap), LOGZERO, dtype=jnp.float32),
        s=jnp.zeros((n_streams, beam)),
    )


# NB: no buffer donation — rewind keeps references to prior state snapshots.
@jax.jit
def ctc_extend(
    state: CTCScorerState,
    new_logp: jnp.ndarray,   # (S, Tnew, V) log-probs of NEW frames (padded)
    n_new: jnp.ndarray,      # (S,) int32 or bool — valid new frames per stream
) -> CTCScorerState:
    """extend_prob + extend_state (reference :293-368).

    Appends up to Tnew new frames per stream (n_new may differ across
    streams; bool input means all-or-none) to the log-prob ring and continues
    the cumulative-blank recursion r_b[t] = r_b[t-1] + x_blank[t] into the
    new frames for every hypothesis (r_n stays logzero there).
    """
    s_dim, vocab, t_cap = state.logp.shape
    t_new = new_logp.shape[1]
    if n_new.dtype == jnp.bool_:
        n_new = jnp.where(n_new, t_new, 0)
    n_new = n_new.astype(jnp.int32)

    old_len = state.enc_len
    ring_dtype = state.logp.dtype
    # Sanitize appended frames: the ring is never zeroed on slot reuse
    # (serve/engine.py::_select_arrays) — stale rows are unreachable only
    # while every ring value stays finite (NaN would propagate through
    # _fill_blank's full-axis cumulative sums), so a NaN stream must not
    # deposit non-finite log-probs.
    new_logp = jnp.where(jnp.isfinite(new_logp), new_logp, LOGZERO)
    from speechcatcher_tpu.ops.pallas.ring_append import (
        ring_append_cols,
        ring_append_enabled,
        ring_append_interpret,
    )

    if ring_append_enabled() and t_cap % 128 == 0:
        # In-place windowed append on the time-minor ring (the beam-state
        # pytree is donated by the fused engine programs): only the
        # touched 128-lane windows move instead of the full (S, V, Tcap)
        # ring — see ops/pallas/ring_append.py.
        logp = ring_append_cols(
            state.logp,
            jnp.swapaxes(new_logp, 1, 2).astype(ring_dtype),
            old_len, n_new,
            interpret=ring_append_interpret(),
        )
    else:
        pos = old_len[:, None] + jnp.arange(t_new)[None, :]    # (S, Tnew)
        pos = jnp.clip(pos, 0, t_cap - 1)
        onehot = jax.nn.one_hot(pos, t_cap, dtype=ring_dtype)  # (S,Tnew,Tcap)
        onehot = onehot * (
            jnp.arange(t_new)[None, :] < n_new[:, None]
        )[..., None]
        written = jnp.clip(onehot.sum(axis=1), 0.0, 1.0)         # (S, Tcap)
        # onehot_contract writes the appended log-probs exactly at ring
        # precision without Precision.HIGHEST (pathologically slow for
        # these outer-product-shaped scatters on TPU — see ops/layers.py).
        logp = state.logp * (1.0 - written[:, None, :]) + onehot_contract(
            "stv,stm->svm", new_logp.astype(ring_dtype), onehot
        ).astype(ring_dtype)

    new_len = old_len + n_new
    r = _fill_blank(logp, state.r, old_len, new_len)
    return CTCScorerState(logp=logp, enc_len=new_len, r=r, s=state.s)


def _fill_blank(logp, r, from_len, to_len):
    """Fill r columns [from_len, to_len) per stream with the cumulative-blank
    continuation r_b[t] = r_b[t-1] + x_blank[t], r_n = logzero
    (reference extend_state :350-368)."""
    t_cap = logp.shape[2]
    # Upcast once: the cumulative-blank sum runs over up to Tcap frames and
    # must accumulate fp32 even when the ring stores bf16.
    xb = logp[:, 0, :].astype(jnp.float32)                       # (S, Tcap)
    t_idx = jnp.arange(t_cap)[None, :]
    in_new = (t_idx >= from_len[:, None]) & (t_idx < to_len[:, None])
    cxb = jnp.cumsum(jnp.where(t_idx < to_len[:, None], xb, 0.0), axis=1)
    base_cxb = jnp.where(
        from_len > 0,
        jnp.take_along_axis(
            cxb, jnp.maximum(from_len - 1, 0)[:, None], axis=1
        )[:, 0],
        0.0,
    )  # (S,)
    r_base = jnp.where(
        (from_len > 0)[:, None],
        jnp.take_along_axis(
            r[:, :, 1, :],
            jnp.maximum(from_len - 1, 0)[:, None, None],
            axis=2,
        )[:, :, 0],
        0.0,
    )  # (S, B)
    new_rb = r_base[:, :, None] + (cxb[:, None, :] - base_cxb[:, None, None])
    r1 = jnp.where(in_new[:, None, :], new_rb, r[:, :, 1, :])
    r0 = jnp.where(in_new[:, None, :], LOGZERO, r[:, :, 0, :])
    return jnp.stack([r0, r1], axis=2)


@functools.partial(jax.jit, static_argnames=("blank", "eos"))
def ctc_score_candidates(
    state: CTCScorerState,
    last_ids: jnp.ndarray,   # (S, B) last token of each hypothesis
    olen: jnp.ndarray,       # (S,) output length (tokens excl. SOS)
    cand_ids: jnp.ndarray,   # (S, B, K) candidate tokens (decoder pre-beam)
    blank: int,
    eos: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate prefix scores without recursion.

    Returns (scores (S,B,V): log_psi - s_prev with logzero at non-candidates,
    log_psi (S,B,V)) — semantics of reference __call__ :249-291.
    All intermediates are (S, B, K, T): time on the minor (lane) axis.
    """
    if blank == eos:
        # The EOS score lands in its own vocab column and the blank
        # column is overwritten with LOGZERO afterwards — a shared id
        # would silently erase the EOS score and streams could never
        # terminate.
        raise ValueError(f"blank ({blank}) must differ from eos ({eos})")
    s_dim, vocab, t_cap = state.logp.shape
    beam = state.r.shape[1]
    t_idx = jnp.arange(t_cap)

    r_sum = jax.nn.logsumexp(state.r, axis=2)                   # (S, B, T)

    # phi[c, t] = r_sum[t], except c == last_id -> r_b[t] (reference :194-207)
    is_last = cand_ids == last_ids[:, :, None]                  # (S, B, K)
    phi = jnp.where(
        is_last[:, :, :, None],
        state.r[:, :, None, 1, :],
        r_sum[:, :, None, :],
    )                                                            # (S, B, K, T)

    # x_n rows for candidates: contiguous row gather from (S, V, T), upcast
    # at the gather when the ring stores bf16.
    s_idx = jnp.arange(s_dim)[:, None, None]
    xn_c = state.logp[s_idx, cand_ids, :].astype(jnp.float32)   # (S, B, K, T)

    start = jnp.minimum(jnp.maximum(olen, 1), t_cap)             # (S,)
    end = state.enc_len                                          # (S,)
    in_range = (t_idx[None, :] >= start[:, None]) & (
        t_idx[None, :] < end[:, None]
    )                                                            # (S, T)

    # phi[t-1] + xn[t] summed over t in [start, end), plus the init term
    # r[start-1, 0] = xn_c[0] iff olen == 0 (reference :186-188,254-281).
    phi_shift = jnp.concatenate(
        [jnp.full_like(phi[..., :1], LOGZERO), phi[..., :-1]], axis=-1
    )
    terms = jnp.where(
        in_range[:, None, None, :], phi_shift + xn_c, LOGZERO
    )
    init_term = jnp.where(
        (olen == 0)[:, None, None], xn_c[..., 0], LOGZERO
    )                                                            # (S, B, K)
    stacked = jnp.concatenate([terms, init_term[..., None]], axis=-1)
    log_psi_c = jax.nn.logsumexp(stacked, axis=-1)               # (S, B, K)

    # Scatter candidates into the vocab axis (non-candidates stay logzero).
    onehot = jax.nn.one_hot(cand_ids, vocab, dtype=log_psi_c.dtype)
    scattered = onehot_contract("sbk,sbkv->sbv", log_psi_c, onehot)
    is_cand = jnp.sum(onehot, axis=2) > 0                        # (S, B, V)
    log_psi = jnp.where(is_cand, scattered, LOGZERO)             # (S, B, V)

    # EOS score = r_sum at the final frame (reference :284-285).
    end_frame = jnp.maximum(end - 1, 0)
    eos_score = jnp.take_along_axis(
        r_sum, end_frame[:, None, None], axis=2
    )[:, :, 0]                                                   # (S, B)
    log_psi = log_psi.at[:, :, eos].set(eos_score)
    log_psi = log_psi.at[:, :, blank].set(LOGZERO)

    return log_psi - state.s[:, :, None], log_psi


@functools.partial(jax.jit, static_argnames=())
def ctc_advance_state(
    state: CTCScorerState,
    log_psi: jnp.ndarray,    # (S, B, V) from ctc_score_candidates
    src_idx: jnp.ndarray,    # (S, B) source hypothesis per surviving beam slot
    chosen: jnp.ndarray,     # (S, B) token chosen for each surviving slot
    cand_ids: jnp.ndarray,   # (S, B, K) the candidate set that was scored
    last_ids: jnp.ndarray,   # (S, B) last tokens BEFORE this step
    olen: jnp.ndarray,       # (S,) output length BEFORE this step
) -> CTCScorerState:
    """Forward recursion for the B survivors (reference :229-246 +
    index_select_state :370-414), as a log-semiring associative scan.

    Replicates the reference quirk: a chosen token outside the candidate set
    (possible for EOS) takes candidate slot 0's forward variables (:404-405).
    """
    s_dim, beam, _, t_cap = state.r.shape

    take = lambda a, i: jnp.take_along_axis(a, i, axis=1)
    # Beam-lineage selections via one-hot MXU contractions: the
    # index-repeat take_along_axis formulations lower to serialized
    # element gathers (~10 ns/element on TPU — the (S,B,V) psi gather
    # profiled at 14.5 ms and the (S,B,2,T) r gather at 5-9 ms PER BEAM
    # STEP at S=288). onehot_contract's bf16-limb passes are exact for
    # f32 values (3 limbs = 24 mantissa bits) and run at MXU speed.
    oh_src = jax.nn.one_hot(src_idx, beam, dtype=jnp.float32)    # (S,B,C)
    r_src = onehot_contract(
        "scxt,sbc->sbxt", state.r.astype(jnp.float32), oh_src
    )                                                            # (S,B,2,T)
    last_src = take(last_ids, src_idx)                           # (S, B)
    # 2 bf16 limbs are exact for token ids < 2^16; 3 cover ids < 2^24
    # (outsized vocabs) — same guard as beam_search.take_lineage.
    id_limbs = 2 if state.logp.shape[1] <= (1 << 16) else 3
    cand_src = onehot_contract(
        "sck,sbc->sbk", cand_ids.astype(jnp.float32), oh_src, limbs=id_limbs
    ).astype(jnp.int32)                                          # (S, B, K)

    # s_new = log_psi[src, chosen] (select_state :415).
    oh_chosen = jax.nn.one_hot(
        chosen, log_psi.shape[-1], dtype=jnp.float32
    )                                                            # (S,B,V)
    psi_src = onehot_contract("scv,sbc->sbv", log_psi, oh_src)
    s_new = onehot_contract("sbv,sbv->sb", psi_src, oh_chosen)

    # Token whose forward vars we compute: chosen if it was a candidate,
    # else candidate slot 0 (reference :399-406).
    in_cands = jnp.any(cand_src == chosen[:, :, None], axis=-1)  # (S, B)
    token_r = jnp.where(in_cands, chosen, cand_src[:, :, 0])     # (S, B)

    r_sum = jax.nn.logsumexp(r_src, axis=2)                      # (S, B, T)
    phi = jnp.where(
        (token_r == last_src)[:, :, None], r_src[:, :, 1, :], r_sum
    )                                                            # (S, B, T)

    s_idx = jnp.arange(s_dim)[:, None]
    xn = state.logp[s_idx, token_r, :].astype(jnp.float32)       # (S, B, T)
    xb = jnp.broadcast_to(
        state.logp[:, None, 0, :].astype(jnp.float32), xn.shape
    )                                                            # (S, B, T)

    start = jnp.minimum(jnp.maximum(olen, 1), t_cap)             # (S,)
    end = state.enc_len
    t_idx = jnp.arange(t_cap)
    in_rec = (t_idx[None, :] >= start[:, None]) & (
        t_idx[None, :] < end[:, None]
    )                                                            # (S, T)
    in_rec = jnp.broadcast_to(in_rec[:, None, :], xn.shape)

    # Init value at t (the "stored" value for t < start): the reference
    # reallocates r fresh each step — t < start rows are logzero except
    # r[0,0] = xn[0] when olen == 0 (reference :179-188).
    init_rn = jnp.where(
        ((olen == 0)[:, None, None]) & (t_idx[None, None, :] == 0),
        xn[:, :, 0:1],
        LOGZERO,
    )
    init_rb = jnp.full_like(init_rn, LOGZERO)

    phi_shift = jnp.concatenate(
        [jnp.full_like(phi[:, :, :1], LOGZERO), phi[:, :, :-1]], axis=2
    )

    if _use_pallas_recursion():
        # Exact sequential recursion in VMEM (Pallas kernel) — hypotheses on
        # lanes, zero HBM traffic per step.
        from speechcatcher_tpu.ops.pallas.ctc_recursion import (
            LANES,
            ctc_forward_recursion,
        )

        n = s_dim * beam
        n_pad = -(-n // LANES) * LANES

        def to_tn(a):  # (S, B, T) -> (T, N_pad)
            flat = a.reshape(n, t_cap).T
            return jnp.pad(flat, ((0, 0), (0, n_pad - n)))

        def expand(a):  # (S,) -> (N_pad,)
            return jnp.pad(jnp.repeat(a, beam), (0, n_pad - n))

        r_tn = ctc_forward_recursion(
            to_tn(xn),
            to_tn(xb),
            to_tn(phi_shift),
            expand(start),
            expand(end),
            expand((olen == 0).astype(jnp.float32)),
        )                                                        # (2, T, N)
        r_new = r_tn[:, :, :n].transpose(2, 0, 1).reshape(
            s_dim, beam, 2, t_cap
        )
    else:
        # XLA fallback: log-semiring affine recursion as 3x3 matrices over
        # state [rn, rb, 1] via associative scan (O(log T) depth):
        #   rn[t] = (rn[t-1] ⊕ phi[t-1]) + xn[t]
        #   rb[t] = (rn[t-1] ⊕ rb[t-1]) + xb[t]
        # Out-of-range steps are "reset" matrices emitting the init values.
        nz = jnp.full_like(xn, LOGZERO)
        z = jnp.zeros_like(xn)
        rec_mat = jnp.stack(
            [
                jnp.stack([xn, nz, xn + phi_shift], axis=2),
                jnp.stack([xb, xb, nz], axis=2),
                jnp.stack([nz, nz, z], axis=2),
            ],
            axis=2,
        )                                                        # (S,B,3,3,T)
        reset_mat = jnp.stack(
            [
                jnp.stack([nz, nz, init_rn], axis=2),
                jnp.stack([nz, nz, init_rb], axis=2),
                jnp.stack([nz, nz, z], axis=2),
            ],
            axis=2,
        )
        mats = jnp.where(in_rec[:, :, None, None, :], rec_mat, reset_mat)

        def log_matmul(a, b):
            # fn(acc_left, elem_right) = elem_right · acc_left in the
            # (lse, +) semiring: out[i, j] = lse_k(b[i, k] + a[k, j]).
            return jax.nn.logsumexp(
                b[..., :, :, None, :] + a[..., None, :, :, :], axis=-3
            )

        prefix = jax.lax.associative_scan(log_matmul, mats, axis=4)
        # Apply to v_init = [logzero, logzero, 0]: r = prefix[..., :, 2, t].
        rn_traj = prefix[..., 0, 2, :]
        rb_traj = prefix[..., 1, 2, :]
        r_new = jnp.stack([rn_traj, rb_traj], axis=2)            # (S,B,2,T)
    # Keep anything at/after end untouched from the source hyp (those frames
    # hold extend-filled cumulative blanks for FUTURE frames — none yet).
    valid = (t_idx[None, :] < end[:, None])[:, None, None, :]
    r_new = jnp.where(valid, r_new, r_src)

    return CTCScorerState(
        logp=state.logp, enc_len=state.enc_len, r=r_new, s=s_new
    )
