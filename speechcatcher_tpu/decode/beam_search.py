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
    ctc_refill_blank,
    ctc_score_candidates,
    init_ctc_state,
)
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.models.ctc import ctc_log_softmax
from speechcatcher_tpu.models.decoder import (
    DecoderCache,
    MemoryCache,
    decoder_step,
    extend_memory_cache,
    init_decoder_cache,
    init_memory_cache,
    reorder_cache,
)
from speechcatcher_tpu.models.encoder import EncoderState, StreamingEncoder

NEG_INF = -1.0e30


class BeamArrays(NamedTuple):
    """Structure-of-arrays beam state for S streams × B hypotheses."""

    yseq: jnp.ndarray       # (S, B, Lmax) int32, [0] = SOS
    xpos: jnp.ndarray       # (S, B, Lmax) int32 encoder positions per token
    ylen: jnp.ndarray       # (S,) int32 current prefix length (incl. SOS)
    score: jnp.ndarray      # (S, B) total score
    score_dec: jnp.ndarray  # (S, B) accumulated decoder score
    score_ctc: jnp.ndarray  # (S, B) accumulated CTC score
    dec_cache: DecoderCache  # (L, S*B, Lmax, d)
    ctc: CTCScorerState


class StepFlags(NamedTuple):
    eos_in_beam: jnp.ndarray   # (S,) any hypothesis just ended with EOS
    best_is_eos: jnp.ndarray   # (S,) best hypothesis ends with EOS
    all_eos: jnp.ndarray       # (S,)
    repetition: jnp.ndarray    # (S,) BBD repetition detected


def restore_hypotheses(snapshot: BeamArrays, current: BeamArrays) -> BeamArrays:
    """Rollback/rewind restore: hypothesis state comes from the snapshot but
    the CTC log-prob ring is append-only and keeps the current extension
    (the reference never undoes extend_prob). Forward variables are lazily
    re-extended over frames added after the snapshot."""
    ctc = CTCScorerState(
        logp=current.ctc.logp,
        enc_len=current.ctc.enc_len,
        r=snapshot.ctc.r,
        s=snapshot.ctc.s,
    )
    ctc = ctc_refill_blank(ctc, snapshot.ctc.enc_len)
    return snapshot._replace(ctc=ctc)


def init_beam_arrays(cfg: ModelConfig, n_streams: int, beam: int) -> BeamArrays:
    lmax = cfg.max_tokens
    yseq = jnp.zeros((n_streams, beam, lmax), jnp.int32)
    yseq = yseq.at[:, :, 0].set(cfg.sos_id)
    score = jnp.full((n_streams, beam), NEG_INF)
    score = score.at[:, 0].set(0.0)  # single live hypothesis at start
    return BeamArrays(
        yseq=yseq,
        xpos=jnp.zeros((n_streams, beam, lmax), jnp.int32),
        ylen=jnp.ones((n_streams,), jnp.int32),
        score=score,
        score_dec=jnp.zeros((n_streams, beam)),
        score_ctc=jnp.zeros((n_streams, beam)),
        dec_cache=init_decoder_cache(cfg, n_streams * beam),
        ctc=init_ctc_state(n_streams, beam, cfg.max_enc_frames, cfg.vocab_size),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam", "pre_beam", "ctc_weight", "use_bbd"),
)
def beam_step(
    params,
    dec_pe: jnp.ndarray,
    mem_cache: MemoryCache,
    arrays: BeamArrays,
    vis_len: jnp.ndarray,   # (S,) visible encoder frames
    cfg: ModelConfig,
    beam: int,
    pre_beam: int,
    ctc_weight: float,
    use_bbd: bool,
) -> Tuple[BeamArrays, StepFlags]:
    """One synchronous beam step for all streams (reference :701-821)."""
    s_dim = arrays.yseq.shape[0]
    n = s_dim * beam
    vocab = cfg.vocab_size
    decoder_weight = 1.0 - ctc_weight

    last_tok = jnp.take_along_axis(
        arrays.yseq, (arrays.ylen - 1)[:, None, None].repeat(beam, 1), axis=2
    )[:, :, 0]                                                   # (S, B)

    # --- Pass 1: decoder scores full vocab (reference :121-146).
    dec_logp, new_cache = decoder_step(
        params["decoder"],
        dec_pe,
        arrays.dec_cache,
        mem_cache,
        last_tok.reshape(n),
        jnp.repeat(arrays.ylen - 1, beam),
        jnp.repeat(vis_len, beam),
        jnp.repeat(jnp.arange(s_dim, dtype=jnp.int32), beam),
        cfg,
    )
    dec_logp = dec_logp.reshape(s_dim, beam, vocab)

    # --- Pre-beam: top-K by (weighted) decoder score (reference :148-154).
    k = min(pre_beam, vocab)
    _, cand_ids = jax.lax.top_k(dec_logp, k)                     # (S, B, K)
    cand_ids = cand_ids.astype(jnp.int32)

    # --- Pass 2: CTC partial scoring of the K candidates (reference :156-184).
    olen = arrays.ylen - 1
    ctc_scores, log_psi = ctc_score_candidates(
        arrays.ctc, last_tok, olen, cand_ids,
        blank=cfg.blank_id, eos=cfg.eos_id,
    )
    combined = decoder_weight * dec_logp + ctc_weight * ctc_scores

    # --- Expand: per-hyp top-B, then global top-B of the B·B candidates
    # (reference :721-758 expands per-hyp beams then prunes by total score).
    top_scores, top_tokens = jax.lax.top_k(combined, beam)       # (S, B, B)
    total = arrays.score[:, :, None] + top_scores                # (S, B, B)
    flat_total = total.reshape(s_dim, beam * beam)
    best_total, best_flat = jax.lax.top_k(flat_total, beam)      # (S, B)
    src = (best_flat // beam).astype(jnp.int32)                  # (S, B)
    rank = best_flat % beam
    chosen = jnp.take_along_axis(
        top_tokens.reshape(s_dim, beam * beam), best_flat, axis=1
    ).astype(jnp.int32)                                          # (S, B)

    take2 = lambda a: jnp.take_along_axis(a, src, axis=1)
    gather_tok = lambda a: jnp.take_along_axis(
        jnp.take_along_axis(a, src[:, :, None].repeat(vocab, 2), axis=1),
        chosen[:, :, None], axis=2,
    )[:, :, 0]

    new_yseq = jnp.take_along_axis(
        arrays.yseq, src[:, :, None].repeat(arrays.yseq.shape[2], 2), axis=1
    )
    pos_onehot = jax.nn.one_hot(
        arrays.ylen[:, None].repeat(beam, 1), arrays.yseq.shape[2],
        dtype=jnp.int32,
    )
    new_yseq = new_yseq * (1 - pos_onehot) + pos_onehot * chosen[:, :, None]
    new_xpos = jnp.take_along_axis(
        arrays.xpos, src[:, :, None].repeat(arrays.xpos.shape[2], 2), axis=1
    )
    cur_pos = jnp.maximum(vis_len - 1, 0)                        # (S,)
    new_xpos = (
        new_xpos * (1 - pos_onehot)
        + pos_onehot * cur_pos[:, None, None].astype(jnp.int32)
    )

    new_score = best_total
    new_score_dec = take2(arrays.score_dec) + gather_tok(dec_logp)
    new_score_ctc = take2(arrays.score_ctc) + gather_tok(ctc_scores)

    # CTC survivor states (select_state semantics).
    new_ctc = ctc_advance_state(
        arrays.ctc, log_psi, src, chosen, cand_ids, last_tok, olen
    )
    # Decoder cache: flat gather across (S*B).
    flat_src = (src + (jnp.arange(s_dim) * beam)[:, None]).reshape(n)
    new_dec_cache = DecoderCache(
        k=new_cache.k[:, flat_src], v=new_cache.v[:, flat_src]
    )

    new_arrays = BeamArrays(
        yseq=new_yseq,
        xpos=new_xpos,
        ylen=arrays.ylen + 1,
        score=new_score,
        score_dec=new_score_dec,
        score_ctc=new_score_ctc,
        dec_cache=new_dec_cache,
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

    return new_arrays, StepFlags(
        eos_in_beam=eos_in_beam,
        best_is_eos=best_is_eos,
        all_eos=all_eos,
        repetition=repetition,
    )


@dataclasses.dataclass
class BSBSState:
    """Host-side handles for one decoding session (single stream, S=1)."""

    enc_state: Optional[EncoderState]
    enc_buf: Optional[jnp.ndarray]       # (1, L, d) accumulated encoder out
    vis_len: int                         # frames made visible to scorers
    arrays: BeamArrays
    mem_cache: MemoryCache
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
    ):
        self.model = model
        self.cfg = model.cfg
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.use_bbd = use_bbd
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
            mem_cache=init_memory_cache(self.cfg, 1),
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

        if feats.shape[1] >= 3:
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
        new_frames = st.enc_buf[:, st.vis_len : cur_end, :]
        new_logp = ctc_log_softmax(self.model.params["ctc"], new_frames)
        arrays = st.arrays
        st.arrays = arrays._replace(
            ctc=ctc_extend(arrays.ctc, new_logp, jnp.array([True]))
        )
        st.mem_cache = extend_memory_cache(
            self.model.params["decoder"],
            st.mem_cache,
            new_frames,
            jnp.array([st.vis_len], jnp.int32),
            self.cfg,
        )
        st.vis_len = cur_end

    def _decode_one_block(self, cur_end: int, block_is_final: bool):
        """Beam-step loop for one block (reference _decode_one_block :655-838)."""
        st = self.state
        self._extend_scorers(cur_end)
        if st.vis_len == 0:
            return

        prev_step_arrays = st.arrays  # rollback target (reference :697)
        vis = jnp.array([st.vis_len], jnp.int32)

        while st.process_idx < self.max_length:
            st.output_index += 1
            new_arrays, flags = beam_step(
                self.model.params,
                self.model.dec_pe,
                st.mem_cache,
                st.arrays,
                vis,
                self.cfg,
                self.beam_size,
                self.pre_beam,
                self.ctc_weight,
                self.use_bbd,
            )
            st.arrays = new_arrays

            # EOS stopping (reference :760-778).
            if bool(flags.eos_in_beam[0]):
                if not block_is_final:
                    break
                if bool(flags.best_is_eos[0]):
                    break

            # BBD repetition → rollback one step (reference :780-800).
            if self.use_bbd and not block_is_final and bool(
                flags.repetition[0]
            ):
                st.arrays = restore_hypotheses(prev_step_arrays, st.arrays)
                st.output_index -= 1
                break

            if bool(flags.all_eos[0]) and block_is_final:
                break

            prev_step_arrays = st.arrays
            # Save rewind snapshot AFTER all break checks (reference :811-816).
            st.prev_arrays = st.arrays
            st.process_idx += 1

        # Block-end rewind (reference :824-837).
        if st.process_idx > 1 and st.prev_arrays is not None:
            st.arrays = restore_hypotheses(st.prev_arrays, st.arrays)
            st.process_idx -= 1
            st.prev_arrays = None

    # ------------------------------------------------------------------
    # Output assembly
    # ------------------------------------------------------------------

    def best_hypothesis(self) -> Tuple[np.ndarray, np.ndarray, float]:
        """(token_ids, xpos, score) of the current best hypothesis."""
        arrays = self.state.arrays
        ylen = int(arrays.ylen[0])
        yseq = np.asarray(arrays.yseq[0, 0, :ylen])
        xpos = np.asarray(arrays.xpos[0, 0, :ylen])
        return yseq, xpos, float(arrays.score[0, 0])

    def nbest_hypotheses(self) -> List[Tuple[np.ndarray, np.ndarray, float]]:
        arrays = self.state.arrays
        ylen = int(arrays.ylen[0])
        out = []
        for b in range(self.beam_size):
            out.append(
                (
                    np.asarray(arrays.yseq[0, b, :ylen]),
                    np.asarray(arrays.xpos[0, b, :ylen]),
                    float(arrays.score[0, b]),
                )
            )
        return out
