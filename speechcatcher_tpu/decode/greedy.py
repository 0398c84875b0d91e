"""Greedy CTC decoding paths.

Counterparts of the reference's standalone CTC decoders (model/ctc.py:142-256)
plus a batched offline mode the reference lacks: whole utterances through the
train-mode encoder + vectorized greedy collapse — maximum-throughput batch
transcription when beam-search accuracy isn't needed.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.models.ctc import ctc_greedy_collapse, ctc_logits
from speechcatcher_tpu.models.encoder import encoder_forward_train


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_and_collapse(params, feats, ilens, cfg: ModelConfig):
    enc_out, olens = encoder_forward_train(params["encoder"], feats, ilens, cfg)
    preds = jnp.argmax(ctc_logits(params["ctc"], enc_out), axis=-1)
    return ctc_greedy_collapse(preds, olens, blank=cfg.blank_id)


def greedy_decode_batch(
    model: ASRModel,
    waveforms: List[np.ndarray],
    rate: int = 16000,
) -> List[Tuple[str, List[int]]]:
    """Batch transcription: N float32 waveforms → [(text, token_ids)].

    Pads to a common length; the whole batch runs as one device program.
    """
    assert rate == model.cfg.sample_rate
    max_len = max(len(w) for w in waveforms)
    batch = np.zeros((len(waveforms), max_len), np.float32)
    for i, w in enumerate(waveforms):
        batch[i, : len(w)] = w
    feats = model.frontend(jnp.asarray(batch))
    ilens = jnp.asarray(
        [model.frontend.n_frames(len(w)) for w in waveforms], jnp.int32
    )
    tokens, counts = _encode_and_collapse(
        model.params, feats, ilens, model.cfg
    )
    tokens = np.asarray(tokens)
    counts = np.asarray(counts)
    out = []
    for i in range(len(waveforms)):
        ids = [int(t) for t in tokens[i, : counts[i]]]
        out.append((model.tokenizer.ids_to_text(ids), ids))
    return out


def ctc_prefix_beam_search_host(
    log_probs: np.ndarray,  # (T, V)
    beam_size: int = 10,
    blank: int = 0,
) -> List[int]:
    """Small host-side CTC prefix beam search over one utterance
    (counterpart of reference ctc.py:181-256; the production joint decoder
    is decode/beam_search.py)."""
    from collections import defaultdict

    t_len, vocab = log_probs.shape
    # beam: prefix -> (p_blank, p_nonblank) in log space
    NEG = -1e30

    def lse(a, b):
        m = max(a, b)
        if m <= NEG / 2:
            return NEG
        return m + np.log1p(np.exp(min(a, b) - m))

    beam = {(): (0.0, NEG)}
    for t in range(t_len):
        row = log_probs[t]
        top = np.argsort(-row)[: max(beam_size * 2, 8)]
        new = defaultdict(lambda: (NEG, NEG))
        for prefix, (pb, pnb) in beam.items():
            p_tot = lse(pb, pnb)
            # blank
            b0, n0 = new[prefix]
            new[prefix] = (lse(b0, p_tot + row[blank]), n0)
            for c in top:
                c = int(c)
                if c == blank:
                    continue
                p_c = row[c]
                if prefix and prefix[-1] == c:
                    # same symbol: extend needs blank in between
                    b0, n0 = new[prefix]
                    new[prefix] = (b0, lse(n0, pnb + p_c))
                    ext = prefix + (c,)
                    b1, n1 = new[ext]
                    new[ext] = (b1, lse(n1, pb + p_c))
                else:
                    ext = prefix + (c,)
                    b1, n1 = new[ext]
                    new[ext] = (b1, lse(n1, p_tot + p_c))
        ranked = sorted(new.items(), key=lambda kv: -lse(*kv[1]))
        beam = dict(ranked[:beam_size])
    best = max(beam.items(), key=lambda kv: lse(*kv[1]))[0]
    return list(best)
