"""End-to-end BSBS parity: identical tiny random model + identical feature
chunks through our device-resident beam search and the reference Python BSBS;
token sequences must match exactly."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.decode.beam_search import BlockwiseSynchronousBeamSearch
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.ops.frontend import Frontend
from speechcatcher_tpu.models.encoder import encoder_pe_table
from speechcatcher_tpu.models.decoder import decoder_pe_table
from speechcatcher_tpu.tokenizer import Tokenizer

from helpers import make_reference_modules, reference_params_to_jax, rand_feats

torch = pytest.importorskip("torch")
# Parity tests need the reference implementation (mounted read-only
# at /root/reference in the dev environment; absent in CI).
pytest.importorskip("speechcatcher")

CFG = tiny_config(n_mels=20)


def _build_models(seed):
    ref_enc, ref_dec, ref_ctc = make_reference_modules(CFG, seed=seed)
    params = reference_params_to_jax(ref_enc, ref_dec, ref_ctc, CFG)
    model = ASRModel(
        cfg=CFG,
        params=params,
        frontend=Frontend(
            n_fft=CFG.n_fft, hop_length=CFG.hop_length,
            win_length=CFG.win_length, n_mels=CFG.n_mels,
        ),
        tokenizer=Tokenizer.dummy(CFG.vocab_size),
        enc_pe=encoder_pe_table(CFG),
        dec_pe=decoder_pe_table(CFG),
    )
    ref_model = types.SimpleNamespace(
        encoder=ref_enc, decoder=ref_dec, ctc=ref_ctc,
        vocab_size=CFG.vocab_size,
    )
    return model, ref_model


def _patch_reference_extend_prob():
    """The reference CTCPrefixScorer.extend_prob feeds raw logits into the
    prefix scorer (scorers.py:349: `self.ctc.ctc_lo(x)` without log_softmax)
    while batch_init_state log-softmaxes (scorers.py:133-134) — a bug in the
    reference's 92%-parity native path; real ESPnet log-softmaxes both. We
    implement the correct behavior, so pin the reference to it for
    comparison."""
    import torch

    from speechcatcher.beam_search.scorers import CTCPrefixScorer

    def fixed_extend_prob(self, x):
        if self.impl is None:
            self.batch_init_state(x)
            return
        logits = self.ctc.ctc_lo(x)
        self.impl.extend_prob(torch.log_softmax(logits, dim=-1))

    CTCPrefixScorer.extend_prob = fixed_extend_prob


def _run_reference(ref_model, chunks, finals, beam, use_bbd):
    from speechcatcher.beam_search.beam_search import create_beam_search

    _patch_reference_extend_prob()

    bsbs = create_beam_search(
        ref_model, beam_size=beam, ctc_weight=0.3, decoder_weight=0.7,
        device="cpu", use_bbd=use_bbd,
    )
    # Match our encoder block/hop/lookahead (reference hardcodes 40/16/16).
    bsbs.block_size = CFG.block_size
    bsbs.hop_size = CFG.hop_size
    bsbs.look_ahead = CFG.look_ahead
    state = None
    with torch.no_grad():
        for chunk, is_final in zip(chunks, finals):
            lens = torch.tensor([chunk.shape[1]])
            state = bsbs.process_block(
                torch.from_numpy(chunk), lens, is_final
            )
    hyps = sorted(state.hypotheses, key=lambda h: h.score, reverse=True)
    return [
        (h.yseq.numpy().tolist(), h.xpos.numpy().tolist(), h.score)
        for h in hyps
    ]


def _run_ours(model, chunks, finals, beam, use_bbd):
    bsbs = BlockwiseSynchronousBeamSearch(
        model, beam_size=beam, ctc_weight=0.3, use_bbd=use_bbd
    )
    for chunk, is_final in zip(chunks, finals):
        bsbs.process_block(jnp.asarray(chunk), is_final=is_final)
    return bsbs.nbest_hypotheses()


@pytest.mark.parametrize("use_bbd", [True, False])
@pytest.mark.parametrize("seed", [3, 11])
def test_bsbs_token_parity(use_bbd, seed):
    model, ref_model = _build_models(seed)
    rng = np.random.RandomState(seed)
    chunks = [rand_feats(rng, 1, 49, CFG.n_mels) for _ in range(6)]
    finals = [False] * 5 + [True]

    ref_hyps = _run_reference(ref_model, chunks, finals, beam=3,
                              use_bbd=use_bbd)
    our_hyps = _run_ours(model, chunks, finals, beam=3, use_bbd=use_bbd)

    ref_best_yseq, ref_best_xpos, ref_best_score = ref_hyps[0]
    our_best_yseq, our_best_xpos, our_best_score = our_hyps[0]

    assert list(our_best_yseq) == ref_best_yseq, (
        f"best yseq mismatch: {list(our_best_yseq)} vs {ref_best_yseq}"
    )
    assert list(our_best_xpos) == ref_best_xpos
    np.testing.assert_allclose(our_best_score, ref_best_score, rtol=1e-3,
                               atol=1e-3)

    # The full beam should agree too (same order after score sort).
    for (ry, _, rs), (oy, _, os) in zip(ref_hyps, our_hyps):
        assert list(oy) == ry
        np.testing.assert_allclose(os, rs, rtol=1e-3, atol=1e-3)
