"""Blockwise Synchronous Beam Search (BSBS) — device-resident beam state.

Replicates the decode semantics of the reference
(/root/reference/speechcatcher/beam_search/beam_search.py:254-941): encoder-
output buffering with cumulative block extraction, two-pass joint scoring
(decoder full vocab → pre-beam top-K → CTC partial), per-block synchronous
beam stepping with EOS / BBD stopping, one-step rollback, and the block-end
rewind — redesigned as fixed-shape batched arrays:

- Hypotheses are SoA tensors (yseq/xpos (S,B,Lmax) int32, scores (S,B)) in
  HBM; the Python Hypothesis objects and per-token .item() calls of the
  reference (:742-743) are gone.
- One jitted `beam_step` performs decoder forward + pre-beam + CTC scoring
  + combine + expand/prune in a single XLA program; the host reads back two
  booleans per step (EOS-in-beam, BBD repetition).
- Rewind/rollback snapshots are free: JAX arrays are immutable, so saving
  the previous step's state is a reference copy (the reference deep-copies
  every scorer state per step, :358-401).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.decode.ctc_prefix import (
    CTCScorerState,
    ctc_advance_state,
    ctc_extend,
    ctc_score_candidates,
    init_ctc_state,
)
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.models.ctc import ctc_log_softmax
from speechcatcher_tpu.models.decoder import (
    DecoderCache,
    decoder_step,
    init_decoder_cache,
)
from speechcatcher_tpu.models.encoder import EncoderState, StreamingEncoder

NEG_INF = -1.0e30


class BeamArrays(NamedTuple):
    """Structure-of-arrays beam state for S streams × B hypotheses.

    The decoder KV cache is NOT part of the beam state: its rows are
    append-only and lane-resident (lazy reorder — see models/decoder.py::
    decoder_step), so pruning, rollback and rewind all act on the small
    `lane` index map while the (L, S·B, Lmax, d) buffers are carried
    separately and never copied per step."""

    yseq: jnp.ndarray       # (S, B, Lmax) int32, [0] = SOS
    xpos: jnp.ndarray       # (S, B, Lmax) int32 encoder positions per token
    lane: jnp.ndarray       # (S, B, Lmax) int32 cache lane of position p's row
    ylen: jnp.ndarray       # (S,) int32 current prefix length (incl. SOS)
    score: jnp.ndarray      # (S, B) total score
    score_dec: jnp.ndarray  # (S, B) accumulated decoder score
    score_ctc: jnp.ndarray  # (S, B) accumulated CTC score
    ctc: CTCScorerState


class StepFlags(NamedTuple):
    eos_in_beam: jnp.ndarray   # (S,) any hypothesis just ended with EOS
    best_is_eos: jnp.ndarray   # (S,) best hypothesis ends with EOS
    all_eos: jnp.ndarray       # (S,)
    repetition: jnp.ndarray    # (S,) BBD repetition detected


def init_beam_arrays(cfg: ModelConfig, n_streams: int, beam: int,
                     snapshot: bool = False) -> BeamArrays:
    """Fresh beam state. snapshot=True allocates the rewind-snapshot
    variant: its CTC log-prob ring is EMPTY (S, 0, 0) — the ring is
    append-only and always read from the live arrays (the block-loop
    rewind rebuilds the restored CTC state around the live ring), so a second
    (S, V, Tcap) float32 copy (~3.2 MB/stream at the flagship config)
    would never be read."""
    lmax = cfg.max_tokens
    yseq = jnp.zeros((n_streams, beam, lmax), jnp.int32)
    yseq = yseq.at[:, :, 0].set(cfg.sos_id)
    # NB: explicit dtypes — weak-typed leaves would change avals after the
    # first step and trigger a silent recompile of the decode program.
    score = jnp.full((n_streams, beam), NEG_INF, dtype=jnp.float32)
    score = score.at[:, 0].set(0.0)  # single live hypothesis at start
    ctc = init_ctc_state(n_streams, beam, cfg.max_enc_frames, cfg.vocab_size,
                         ring_dtype=cfg.ctc_ring_jnp_dtype)
    if snapshot:
        ctc = ctc._replace(
            logp=jnp.zeros((n_streams, 0, 0), dtype=cfg.ctc_ring_jnp_dtype)
        )
    return BeamArrays(
        yseq=yseq,
        xpos=jnp.zeros((n_streams, beam, lmax), jnp.int32),
        lane=jnp.zeros((n_streams, beam, lmax), jnp.int32),
        ylen=jnp.ones((n_streams,), jnp.int32),
        score=score,
        score_dec=jnp.zeros((n_streams, beam)),
        score_ctc=jnp.zeros((n_streams, beam)),
        ctc=ctc,
    )


def _beam_step_core(
    params,
    dec_pe: jnp.ndarray,
    memory: jnp.ndarray,    # (S, T, d) raw encoder frames (padded ring)
    dec_cache: DecoderCache,
    arrays: BeamArrays,
    vis_len: jnp.ndarray,   # (S,) visible encoder frames
    stepping: jnp.ndarray,  # (S,) bool — streams advancing this step
    cfg: ModelConfig,
    beam: int,
    pre_beam: int,
    ctc_weight: float,
    use_bbd: bool,
    penalty: float = 0.0,
) -> Tuple[BeamArrays, DecoderCache, StepFlags]:
    """One synchronous beam step for all streams (reference :701-821)."""
    s_dim = arrays.yseq.shape[0]
    n = s_dim * beam
    vocab = cfg.vocab_size
    decoder_weight = 1.0 - ctc_weight

    last_tok = jnp.take_along_axis(
        arrays.yseq, (arrays.ylen - 1)[:, None, None].repeat(beam, 1), axis=2
    )[:, :, 0]                                                   # (S, B)

    # --- Pass 1: decoder scores full vocab (reference :121-146).
    dec_logp, new_cache = decoder_step.__wrapped__(
        params["decoder"],
        dec_pe,
        dec_cache,
        memory,
        last_tok.reshape(n),
        jnp.repeat(arrays.ylen - 1, beam),
        vis_len,
        arrays.lane,
        jnp.repeat(stepping, beam),
        cfg,
        beam,
    )
    dec_logp = dec_logp.reshape(s_dim, beam, vocab)

    # --- Pre-beam: top-K by (weighted) decoder score (reference :148-154).
    k = min(pre_beam, vocab)
    # approx_max_k at recall 1.0 is EXACT and uses the TPU PartialReduce
    # path; lax.top_k lowers to a full variadic sort of the vocab axis
    # that profiled at ~13 ms per beam step at S=256.
    _, cand_ids = jax.lax.approx_max_k(
        dec_logp, k, recall_target=1.0
    )                                                            # (S, B, K)
    cand_ids = cand_ids.astype(jnp.int32)

    # --- Pass 2: CTC partial scoring of the K candidates (reference :156-184).
    olen = arrays.ylen - 1
    ctc_scores, log_psi = ctc_score_candidates(
        arrays.ctc, last_tok, olen, cand_ids,
        blank=cfg.blank_id, eos=cfg.eos_id,
    )
    # Length bonus (insertion penalty): uniform +penalty per emitted token,
    # the reference's LengthBonus scorer (weights["length_bonus"]=penalty).
    combined = (
        decoder_weight * dec_logp + ctc_weight * ctc_scores + penalty
    )

    # --- Expand: per-hyp top-B, then global top-B of the B·B candidates
    # (reference :721-758 expands per-hyp beams then prunes by total score).
    top_scores, top_tokens = jax.lax.approx_max_k(
        combined, beam, recall_target=1.0
    )                                                            # (S, B, B)
    total = arrays.score[:, :, None] + top_scores                # (S, B, B)
    flat_total = total.reshape(s_dim, beam * beam)
    best_total, best_flat = jax.lax.top_k(flat_total, beam)      # (S, B)
    src = (best_flat // beam).astype(jnp.int32)                  # (S, B)
    chosen = jnp.take_along_axis(
        top_tokens.reshape(s_dim, beam * beam), best_flat, axis=1
    ).astype(jnp.int32)                                          # (S, B)

    take2 = lambda a: jnp.take_along_axis(a, src, axis=1)
    # Per-parent one-hot (S, B, Bsrc): all lineage/score selections below
    # contract with it instead of take_along_axis — the index-repeat
    # gathers lower to element gathers that profiled at 3.5-9 ms each per
    # beam step. Exactness matters (the TPU default matmul precision is
    # bf16, which corrupts integers above 256 — 257→256 — and rounds
    # scores), so every selection goes through onehot_contract's bf16-limb
    # decomposition: exact AND default-precision fast (Precision.HIGHEST
    # is also exact but pathologically slow here — see ops/layers.py).
    from speechcatcher_tpu.ops.layers import onehot_contract

    oh_src = jax.nn.one_hot(src, beam, dtype=jnp.float32)        # (S, B, C)
    oh_chosen = jax.nn.one_hot(chosen, vocab, dtype=jnp.float32)  # (S, B, V)

    def gather_tok(a):
        """a[s, src[s,b], chosen[s,b]] via one-hot contraction."""
        row = onehot_contract("scv,sbc->sbv", a, oh_src)
        return onehot_contract("sbv,sbv->sb", row, oh_chosen)

    def take_lineage(a):
        """a[s, src[s,b], :] for int (S, B, L) arrays: two bf16 limbs
        reconstruct values < 2^16 exactly; three cover the full f32
        mantissa (values up to 2^24) for outsized configs. The selected
        arrays carry token ids (< vocab) AND encoder positions
        (< cfg.max_enc_frames), so the guard bounds BOTH."""
        n_limbs = 2 if max(vocab, cfg.max_enc_frames) <= (1 << 16) else 3
        return onehot_contract(
            "scl,sbc->sbl", a.astype(jnp.float32), oh_src, limbs=n_limbs
        ).astype(jnp.int32)

    new_yseq = take_lineage(arrays.yseq)
    pos_onehot = jax.nn.one_hot(
        arrays.ylen[:, None].repeat(beam, 1), arrays.yseq.shape[2],
        dtype=jnp.int32,
    )
    new_yseq = new_yseq * (1 - pos_onehot) + pos_onehot * chosen[:, :, None]
    new_xpos = take_lineage(arrays.xpos)
    cur_pos = jnp.maximum(vis_len - 1, 0)                        # (S,)
    new_xpos = (
        new_xpos * (1 - pos_onehot)
        + pos_onehot * cur_pos[:, None, None].astype(jnp.int32)
    )
    # Lane map: inherit the parent's lineage; this step's rows (the
    # parents' last-token K/V, position ylen-1) were written at the
    # PARENT's physical lane.
    new_lane = take_lineage(arrays.lane)
    prev_onehot = jax.nn.one_hot(
        (arrays.ylen - 1)[:, None].repeat(beam, 1), arrays.lane.shape[2],
        dtype=jnp.int32,
    )
    new_lane = new_lane * (1 - prev_onehot) + prev_onehot * src[:, :, None]

    new_score = best_total
    new_score_dec = take2(arrays.score_dec) + gather_tok(dec_logp)
    new_score_ctc = take2(arrays.score_ctc) + gather_tok(ctc_scores)

    # CTC survivor states (select_state semantics).
    new_ctc = ctc_advance_state(
        arrays.ctc, log_psi, src, chosen, cand_ids, last_tok, olen
    )

    new_arrays = BeamArrays(
        yseq=new_yseq,
        xpos=new_xpos,
        lane=new_lane,
        ylen=arrays.ylen + 1,
        score=new_score,
        score_dec=new_score_dec,
        score_ctc=new_score_ctc,
        ctc=new_ctc,
    )

    # --- Stop-condition flags (reference :763-809).
    eos = cfg.eos_id
    last_is_eos = chosen == eos                                  # (S, B)
    eos_in_beam = jnp.any(last_is_eos, axis=1)
    best_is_eos = last_is_eos[:, 0]
    all_eos = jnp.all(last_is_eos, axis=1)

    if use_bbd:
        # Repetition: last token appears in yseq[1:len-1] (reference :466-505)
        lmax = new_yseq.shape[2]
        t_idx = jnp.arange(lmax)
        middle = (t_idx[None, None, :] >= 1) & (
            t_idx[None, None, :] < (arrays.ylen + 1 - 1)[:, None, None]
        )
        rep = jnp.any(
            middle & (new_yseq == chosen[:, :, None]), axis=2
        )                                                        # (S, B)
        not_special = (chosen != cfg.sos_id) & (chosen != eos)
        repetition = jnp.any(rep & not_special, axis=1)
    else:
        repetition = jnp.zeros((s_dim,), bool)

    return new_arrays, new_cache, StepFlags(
        eos_in_beam=eos_in_beam,
        best_is_eos=best_is_eos,
        all_eos=all_eos,
        repetition=repetition,
    )


beam_step = functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam", "pre_beam", "ctc_weight", "use_bbd",
                     "penalty"),
)(_beam_step_core)


# ---------------------------------------------------------------------------
# Per-stream state selection helpers (used on host and inside device loops)
# ---------------------------------------------------------------------------

def _sel0(m: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(m.reshape((m.shape[0],) + (1,) * (x.ndim - 1)), x, y)


def select_arrays(mask: jnp.ndarray, a: BeamArrays, b: BeamArrays) -> BeamArrays:
    """Per-stream select over every BeamArrays field (all lead with S).

    The CTC log-prob ring is special-cased: the rewind snapshot carries an
    EMPTY (S, 0, 0) ring (init_beam_arrays snapshot=True). Selecting
    between a live and an empty ring yields the empty one — every consumer
    of a snapshot-role result rebuilds its CTC state around the live ring
    (the block-loop restore / _merge_arrays use the full arrays' ring), so the
    ring content of a mixed select is never read."""
    m = jnp.asarray(mask)
    if a.ctc.logp.shape == b.ctc.logp.shape:
        logp = _sel0(m, a.ctc.logp, b.ctc.logp)
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


class BlockDecodeState(NamedTuple):
    """Carry of the on-device block-decode loop. The decoder KV cache rides
    along mutably (append-only rows) but is never selected or snapshotted —
    rollback/rewind restore the `lane` map inside arrays instead."""

    arrays: BeamArrays
    prev_arrays: BeamArrays
    dec_cache: DecoderCache   # (L, S·B, Lmax, d) lane-resident rows
    prev_valid: jnp.ndarray   # (S,) bool — rewind snapshot exists
    process_idx: jnp.ndarray  # (S,) int32
    output_index: jnp.ndarray  # (S,) int32
    stepping: jnp.ndarray     # (S,) bool


def _slice_arrays(a: BeamArrays, l_bound: int, t_bound: int) -> BeamArrays:
    """Working view bounded to the live prefix/frames: the decode loop then
    reads/copies only the active region of every capacity-padded buffer."""
    return BeamArrays(
        yseq=a.yseq[:, :, :l_bound],
        xpos=a.xpos[:, :, :l_bound],
        lane=a.lane[:, :, :l_bound],
        ylen=a.ylen,
        score=a.score,
        score_dec=a.score_dec,
        score_ctc=a.score_ctc,
        ctc=CTCScorerState(
            logp=a.ctc.logp[:, :, :t_bound],
            enc_len=a.ctc.enc_len,
            r=a.ctc.r[:, :, :, :t_bound],
            s=a.ctc.s,
        ),
    )


def _merge_arrays(full: BeamArrays, view: BeamArrays, l_bound: int,
                  t_bound: int) -> BeamArrays:
    """Write a bounded working view back into the full-capacity arrays."""
    return BeamArrays(
        yseq=full.yseq.at[:, :, :l_bound].set(view.yseq),
        xpos=full.xpos.at[:, :, :l_bound].set(view.xpos),
        lane=full.lane.at[:, :, :l_bound].set(view.lane),
        ylen=view.ylen,
        score=view.score,
        score_dec=view.score_dec,
        score_ctc=view.score_ctc,
        ctc=CTCScorerState(
            logp=full.ctc.logp,  # append-only ring, unchanged by the loop
            enc_len=view.ctc.enc_len,
            r=full.ctc.r.at[:, :, :, :t_bound].set(view.ctc.r),
            s=view.ctc.s,
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam", "pre_beam", "ctc_weight", "use_bbd",
                     "max_length", "l_bound", "t_bound", "penalty",
                     "eos_commit"),
)
def decode_block_device(
    params,
    dec_pe: jnp.ndarray,
    memory: jnp.ndarray,       # (S, Tcap, d) raw encoder frames (padded)
    state: BlockDecodeState,
    vis_len: jnp.ndarray,      # (S,)
    block_final: jnp.ndarray,  # (S,) bool
    cfg: ModelConfig,
    beam: int,
    pre_beam: int,
    ctc_weight: float,
    use_bbd: bool,
    max_length: int,
    l_bound: Optional[int] = None,
    t_bound: Optional[int] = None,
    penalty: float = 0.0,
    eos_commit: str = "native",
) -> BlockDecodeState:
    """The whole per-block beam loop as ONE device program.

    Replicates the host control flow of the reference _decode_one_block
    (beam_search.py:655-838) — per-stream EOS stop, BBD one-step rollback,
    rewind snapshot bookkeeping, and the block-end rewind — inside a
    lax.while_loop, eliminating the per-step host round trip.

    l_bound/t_bound (static) bound the live token prefix / encoder frames:
    the loop operates on sliced views of the capacity-padded buffers and the
    result merges back once per block — per-step HBM traffic scales with
    the LIVE lengths, not the capacities. A stream whose prefix would
    outgrow l_bound pauses (the caller re-enters with a larger bucket).
    """
    lmax_full = state.arrays.yseq.shape[2]
    tmax_full = state.arrays.ctc.logp.shape[2]
    l_bound = lmax_full if l_bound is None else min(l_bound, lmax_full)
    t_bound = tmax_full if t_bound is None else min(t_bound, tmax_full)

    full_arrays = state.arrays
    full_prev = state.prev_arrays
    full_cache = state.dec_cache
    mem_view = memory[:, :t_bound]
    state = state._replace(
        arrays=_slice_arrays(full_arrays, l_bound, t_bound),
        prev_arrays=_slice_arrays(full_prev, l_bound, t_bound),
        dec_cache=DecoderCache(h=full_cache.h[:, :, :l_bound]),
    )
    stepping0 = state.stepping

    def cond(st: BlockDecodeState):
        return jnp.any(st.stepping)

    def body(st: BlockDecodeState) -> BlockDecodeState:
        stepping = (
            st.stepping
            & (st.process_idx < max_length)
            & (st.arrays.ylen + 1 < l_bound)
        )
        old = st.arrays
        new, dec_cache, flags = _beam_step_core(
            params, dec_pe, mem_view, st.dec_cache, old, vis_len, stepping,
            cfg, beam, pre_beam, ctc_weight, use_bbd, penalty,
        )
        output_index = jnp.where(stepping, st.output_index + 1,
                                 st.output_index)
        # BBD rollback: keep old arrays for those streams (reference :780-800)
        bbd = stepping & use_bbd & ~block_final & flags.repetition & (
            ~flags.eos_in_beam
        )
        stop_eos = stepping & flags.eos_in_beam & ~block_final
        if eos_commit == "espnet":
            # ESPnet-path D1 semantics (docs/ESPNET_PARITY.md): the step
            # that finds EOS in the beam is DISCARDED — BatchBeamSearchOnline
            # breaks before post_process commits it (reference
            # docs/architecture/global-state-architecture.md:40-47) — where
            # the native path commits it (beam_search.py:760-773).
            discard = bbd | stop_eos
        else:
            discard = bbd
        advanced = stepping & ~discard
        arrays = select_arrays(advanced, new, old)
        output_index = jnp.where(discard, output_index - 1, output_index)

        # Stop conditions (reference :760-809).
        stop_eos_final = stepping & block_final & flags.best_is_eos
        cont = advanced & ~stop_eos & ~stop_eos_final

        # Save rewind snapshot for continuing streams (reference :811-816).
        # Native saves the COMMITTED step (prev == state k); the espnet
        # path saves running_hyps BEFORE post_process (prev == state k-1,
        # global-state-architecture.md:48-57), so its block-end rewind
        # lands one step earlier. Final blocks keep the native snapshot in
        # both modes: without espnet's ended-hypothesis pool (documented
        # divergence D3) a lagged snapshot would cut the final EOS step.
        if eos_commit == "espnet":
            prev_src = select_arrays(block_final, arrays, old)
        else:
            prev_src = arrays
        prev_arrays = select_arrays(cont, prev_src, st.prev_arrays)
        prev_valid = st.prev_valid | cont
        process_idx = jnp.where(cont, st.process_idx + 1, st.process_idx)
        stepping = cont & (process_idx < max_length) & (arrays.ylen + 1 < l_bound)
        # The CTC log-prob ring and the frame counters never change inside a
        # block — restore the originals so XLA drops the dead where-copies.
        arrays = arrays._replace(
            ctc=arrays.ctc._replace(logp=old.ctc.logp)
        )
        prev_arrays = prev_arrays._replace(
            ctc=prev_arrays.ctc._replace(logp=st.prev_arrays.ctc.logp)
        )
        return BlockDecodeState(
            arrays=arrays,
            prev_arrays=prev_arrays,
            dec_cache=dec_cache,
            prev_valid=prev_valid,
            process_idx=process_idx,
            output_index=output_index,
            stepping=stepping,
        )

    st = jax.lax.while_loop(cond, body, state)

    # Block-end rewind (reference :824-837); hypothesis state restores from
    # the snapshot, the CTC log-prob ring is append-only, forward variables
    # are lazily re-extended over frames added after the snapshot.
    rewind = stepping0 & (st.process_idx > 1) & st.prev_valid
    restored = select_arrays(rewind, st.prev_arrays, st.arrays)
    from speechcatcher_tpu.decode.ctc_prefix import _fill_blank

    from_len = jnp.where(rewind, st.prev_arrays.ctc.enc_len,
                         st.arrays.ctc.enc_len)
    r = _fill_blank(
        st.arrays.ctc.logp, restored.ctc.r, from_len.astype(jnp.int32),
        st.arrays.ctc.enc_len,
    )
    ctc = CTCScorerState(
        logp=st.arrays.ctc.logp,
        enc_len=st.arrays.ctc.enc_len,
        r=r,
        s=restored.ctc.s,
    )
    arrays = restored._replace(ctc=ctc)
    return BlockDecodeState(
        arrays=_merge_arrays(full_arrays, arrays, l_bound, t_bound),
        prev_arrays=_merge_arrays(full_prev, st.prev_arrays, l_bound, t_bound),
        dec_cache=DecoderCache(
            h=full_cache.h.at[:, :, :l_bound].set(st.dec_cache.h),
        ),
        prev_valid=jnp.where(rewind, False, st.prev_valid),
        process_idx=jnp.where(rewind, st.process_idx - 1, st.process_idx),
        output_index=st.output_index,
        stepping=jnp.zeros_like(st.stepping),
    )


@dataclasses.dataclass
class BSBSState:
    """Host-side handles for one decoding session (single stream, S=1)."""

    enc_state: Optional[EncoderState]
    enc_buf: Optional[jnp.ndarray]       # (1, L, d) accumulated encoder out
    vis_len: int                         # frames made visible to scorers
    arrays: BeamArrays
    memory: jnp.ndarray                  # (1, Tcap, d) raw encoder ring
    dec_cache: DecoderCache              # lane-resident self-attn KV rows
    prev_arrays: Optional[BeamArrays]    # rewind snapshot (reference prev_hyps)
    process_idx: int
    processed_block: int
    output_index: int                    # committed-token pointer


class BlockwiseSynchronousBeamSearch:
    """Streaming BSBS driver for one session (reference :254-838)."""

    def __init__(
        self,
        model: ASRModel,
        beam_size: int = 5,
        ctc_weight: float = 0.3,
        use_bbd: bool = True,
        pre_beam_size: Optional[int] = None,
        max_length: Optional[int] = None,
        penalty: float = 0.0,
        coverage_weight: float = 0.0,
        eos_commit: str = "native",
    ):
        self.model = model
        self.cfg = model.cfg
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.use_bbd = use_bbd
        # "native" (default, golden-pinned) or "espnet" — the EOS-step
        # commit semantics of the two reference backends; see
        # docs/ESPNET_PARITY.md (D1).
        self.eos_commit = eos_commit
        self.penalty = penalty
        self.coverage_weight = coverage_weight
        self.pre_beam = pre_beam_size or self.cfg.pre_beam_size
        self.max_length = max_length or self.cfg.max_tokens - 1
        self.encoder = StreamingEncoder(
            model.params["encoder"], self.cfg, model.enc_pe
        )
        self.state = self._fresh_state()

    def _fresh_state(self) -> BSBSState:
        return BSBSState(
            enc_state=self.encoder.init_state(),
            enc_buf=None,
            vis_len=0,
            arrays=init_beam_arrays(self.cfg, 1, self.beam_size),
            memory=jnp.zeros(
                (1, self.cfg.max_enc_frames, self.cfg.encoder_dim)
            ),
            dec_cache=init_decoder_cache(self.cfg, self.beam_size),
            prev_arrays=None,
            process_idx=0,
            processed_block=0,
            output_index=0,
        )

    def reset(self):
        """Reset streaming state between utterances (reference :343-356)."""
        self.state = self._fresh_state()

    def process_block(
        self, feats: jnp.ndarray, is_final: bool = False
    ) -> BeamArrays:
        """Feed a feature chunk; run encoder + all ready beam blocks
        (reference :507-653)."""
        st = self.state
        cfg = self.cfg

        # Tiny non-final chunks (<3 frames) are buffered by the encoder
        # anyway; but a FINAL chunk must ALWAYS run the encoder step —
        # consume-all semantics flush the carried look-ahead/subsample
        # buffers (up to a block of frames) and the tiny tail itself, or
        # the transcript end silently truncates. Matches the reference,
        # which feeds the final features through unconditionally
        # (speech2text_streaming.py:386 only warns; the encoder consumes
        # everything at is_final, contextual_block_…_encoder.py:284-305).
        if feats.shape[1] >= 3 or is_final:
            enc_out, st.enc_state = self.encoder.step(
                feats, st.enc_state, is_final
            )
            if enc_out.shape[1] > 0:
                st.enc_buf = (
                    enc_out
                    if st.enc_buf is None
                    else jnp.concatenate([st.enc_buf, enc_out], axis=1)
                )

        while True:
            cur_end = (
                cfg.block_size - cfg.look_ahead
                + cfg.hop_size * st.processed_block
            )
            buf_len = 0 if st.enc_buf is None else st.enc_buf.shape[1]
            if st.enc_buf is not None and cur_end < buf_len:
                self._decode_one_block(cur_end, block_is_final=False)
                st.processed_block += 1
            elif is_final and st.enc_buf is not None and buf_len > 0:
                self._decode_one_block(buf_len, block_is_final=True)
                break
            else:
                break
        return st.arrays

    def _extend_scorers(self, cur_end: int):
        """Make frames [vis_len, cur_end) visible to CTC + decoder caches
        (reference extend_scorers :403-464)."""
        st = self.state
        if cur_end <= st.vis_len:
            return
        if cur_end > self.cfg.max_enc_frames:
            # The CTC forward variables and cross-attention KV cache have
            # max_enc_frames capacity; writing past it would silently
            # overwrite the last column and corrupt every later score.
            # Callers must segment long audio (recognize() splits energy
            # segments below this bound; the batched engine stalls+
            # finalizes instead).
            frame_sec = (self.cfg.hop_length * self.cfg.subsample
                         / self.cfg.sample_rate)
            raise RuntimeError(
                f"utterance too long for decode state: {cur_end} encoder "
                f"frames > capacity {self.cfg.max_enc_frames} "
                f"(~{self.cfg.max_enc_frames * frame_sec:.0f} s). Split the "
                "audio into shorter segments or raise cfg.max_enc_frames."
            )
        new_frames = st.enc_buf[:, st.vis_len : cur_end, :]
        new_logp = ctc_log_softmax(self.model.params["ctc"], new_frames)
        arrays = st.arrays
        st.arrays = arrays._replace(
            ctc=ctc_extend(arrays.ctc, new_logp, jnp.array([True]))
        )
        # Append the raw frames to the fixed-capacity memory ring (the
        # decoder rematerializes cross K/V from it each beam step; no
        # per-layer KV cache to extend).
        st.memory = jax.lax.dynamic_update_slice(
            st.memory,
            new_frames.astype(st.memory.dtype),
            (0, jnp.asarray(st.vis_len, jnp.int32), 0),
        )
        st.vis_len = cur_end

    def _decode_one_block(self, cur_end: int, block_is_final: bool):
        """Beam-step loop for one block, executed as ONE device program
        (reference _decode_one_block :655-838)."""
        st = self.state
        self._extend_scorers(cur_end)
        if st.vis_len == 0:
            return

        if st.prev_arrays is not None:
            prev = st.prev_arrays
        else:
            # First-block placeholder with the snapshot-role EMPTY CTC
            # ring, so every call compiles the same (empty-prev) variant.
            prev = st.arrays._replace(
                ctc=st.arrays.ctc._replace(
                    logp=jnp.zeros((1, 0, 0), dtype=st.arrays.ctc.logp.dtype)
                )
            )
        dev_state = BlockDecodeState(
            arrays=st.arrays,
            prev_arrays=prev,
            dec_cache=st.dec_cache,
            prev_valid=jnp.array([st.prev_arrays is not None]),
            process_idx=jnp.array([st.process_idx], jnp.int32),
            output_index=jnp.array([st.output_index], jnp.int32),
            stepping=jnp.array([True]),
        )
        out = decode_block_device(
            self.model.params,
            self.model.dec_pe,
            st.memory,
            dev_state,
            jnp.array([st.vis_len], jnp.int32),
            jnp.array([block_is_final]),
            self.cfg,
            self.beam_size,
            self.pre_beam,
            self.ctc_weight,
            self.use_bbd,
            self.max_length,
            penalty=self.penalty,
            eos_commit=self.eos_commit,
        )
        st.arrays = out.arrays
        st.dec_cache = out.dec_cache
        st.prev_arrays = out.prev_arrays if bool(out.prev_valid[0]) else None
        st.process_idx = int(out.process_idx[0])
        st.output_index = int(out.output_index[0])

    # ------------------------------------------------------------------
    # Output assembly
    # ------------------------------------------------------------------

    def best_hypothesis(self) -> Tuple[np.ndarray, np.ndarray, float]:
        """(token_ids, xpos, score) of the current best hypothesis.

        With coverage_weight set, the beam is re-ranked by score +
        CoverageScorer (reference scorers.py:497-526 — optional there too)."""
        arrays = self.state.arrays
        # ONE host copy per array: per-beam float()/np.asarray() slices
        # each pay a device->host round trip (~tens of ms on a
        # relay-attached TPU), and this runs once per finalized utterance.
        ylen = int(arrays.ylen[0])
        yseq_h = np.asarray(arrays.yseq[0, :, :ylen])
        xpos_h = np.asarray(arrays.xpos[0, :, :ylen])
        score_h = np.asarray(arrays.score[0])
        best = 0
        if self.coverage_weight:
            from speechcatcher_tpu.decode.scorers import CoverageScorer

            cov = CoverageScorer(self.coverage_weight)
            scores = [
                float(score_h[b]) + cov.score(yseq_h[b, 1:])
                for b in range(self.beam_size)
            ]
            best = int(np.argmax(scores))
        return yseq_h[best], xpos_h[best], float(score_h[best])

    def nbest_hypotheses(self) -> List[Tuple[np.ndarray, np.ndarray, float]]:
        arrays = self.state.arrays
        ylen = int(arrays.ylen[0])
        yseq_h = np.asarray(arrays.yseq[0, :, :ylen])
        xpos_h = np.asarray(arrays.xpos[0, :, :ylen])
        score_h = np.asarray(arrays.score[0])
        return [
            (yseq_h[b], xpos_h[b], float(score_h[b]))
            for b in range(self.beam_size)
        ]
