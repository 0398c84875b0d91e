#!/usr/bin/env python
"""Bless the flagship-dims torch-golden decode fixture (VERDICT r03 #7).

The CI parity tier proves token-exact BSBS agreement with the reference
torch implementation at tiny_config only; this script runs the SAME
comparison once at the serving architecture (d=512, 18 encoder layers,
8 heads, beam 5 — tests/helpers.py::flagship_parity_config) and commits
the reference decode as a fixture. tests/test_flagship_golden.py then
replays OUR decode against the committed tokens on every CI run without
paying the reference's slow Python beam search again.

Run on a dev machine with /root/reference importable:

    JAX_PLATFORMS=cpu python scripts/bless_flagship_golden.py

Writes tests/fixtures/flagship_golden.json. Everything is deterministic:
weights come from torch.manual_seed, features from a pinned RandomState —
the fixture records both seeds plus the architecture for drift detection.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import asdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXTURE = REPO / "tests" / "fixtures" / "flagship_golden.json"
FIXTURE_ESPNET = REPO / "tests" / "fixtures" / "flagship_golden_espnet.json"
BEAM = 5


def make_espnet_semantics_bsbs(ref_model):
    """Reference torch BSBS with the espnet-path block-decode semantics.

    The two semantic deltas between the reference's native loop
    (beam_search.py:655-838) and the espnet backend it targets
    (docs/ESPNET_PARITY.md D1/D2, from the reference's own
    docs/architecture/global-state-architecture.md:30-97) are patched in:
    the EOS-detecting step is discarded (break BEFORE commit), the rewind
    snapshot is the PRE-update beam (one step more rollback at block
    ends), and repetition detection is off. The loop below is written
    fresh against the reference's public scoring primitives
    (batch_score_hypotheses / select_state / top_k_hypotheses) — the same
    calls the native loop makes, so scoring is bit-identical and only the
    control flow differs. Final blocks keep the native snapshot (no
    espnet ended-hypothesis pool here — divergence D3, documented)."""
    import torch

    from speechcatcher.beam_search.beam_search import create_beam_search
    from speechcatcher.beam_search.hypothesis import (
        BeamState,
        Hypothesis,
        append_position,
        append_token,
        top_k_hypotheses,
    )

    bsbs = create_beam_search(
        ref_model, beam_size=BEAM, ctc_weight=0.3, decoder_weight=0.7,
        device="cpu", use_bbd=False,
    )

    def _decode_one_block(encoder_out, prev_state, is_final=False):
        hyps = bsbs.extend_scorers(encoder_out, prev_state.hypotheses)
        new_state = BeamState(
            hypotheses=hyps,
            encoder_states=None,
            encoder_out=encoder_out,
            encoder_out_lens=torch.tensor([encoder_out.size(1)],
                                          dtype=torch.long),
            processed_frames=prev_state.processed_frames,
            is_final=is_final,
        )
        if encoder_out.size(1) == 0:
            return new_state
        while bsbs.process_idx < bsbs.max_length:
            scores, states_d, individual = (
                bsbs.beam_search.batch_score_hypotheses(
                    new_state.hypotheses, encoder_out
                )
            )
            cand = []
            for i, hyp in enumerate(new_state.hypotheses):
                top_s, top_t = torch.topk(scores[i], bsbs.beam_size)
                for sc, tok in zip(top_s.tolist(), top_t.tolist()):
                    st_h = {}
                    for name in states_d:
                        scorer = bsbs.scorers[name]
                        s0 = states_d[name][i]
                        st_h[name] = (
                            scorer.select_state(s0, i, tok)
                            if hasattr(scorer, "select_state") else s0
                        )
                    nsc = hyp.scores.copy()
                    for name, ssc in individual.items():
                        nsc[name] = nsc.get(name, 0.0) + ssc[i, tok].item()
                    cand.append(Hypothesis(
                        yseq=append_token(hyp.yseq, tok),
                        score=hyp.score + sc,
                        scores=nsc,
                        states=st_h,
                        xpos=append_position(hyp.xpos,
                                             encoder_out.size(1) - 1),
                    ))
            best = top_k_hypotheses(cand, bsbs.beam_size)
            completed = [h for h in best
                         if h.yseq[-1].item() == bsbs.eos_id]
            if completed and not is_final:
                # D1: discard the EOS-detecting step entirely —
                # new_state.hypotheses stays at the pre-step beam.
                break
            pre_update = new_state.hypotheses
            new_state.hypotheses = best
            new_state.output_index += 1
            if is_final:
                best_hyp = max(best, key=lambda h: h.score)
                if best_hyp.yseq[-1].item() == bsbs.eos_id:
                    break
                if all(h.yseq[-1].item() == bsbs.eos_id for h in best):
                    break
            # D1 companion: the rewind snapshot lags one step on
            # streaming blocks (prev = running BEFORE the update); final
            # blocks keep the committed beam (native snapshot, D3 note).
            bsbs.prev_hyps = bsbs._copy_hypotheses(
                best if is_final else pre_update
            )
            bsbs.process_idx += 1
        if bsbs.process_idx > 1 and len(bsbs.prev_hyps) > 0:
            new_state.hypotheses = bsbs.prev_hyps
            bsbs.process_idx -= 1
            bsbs.prev_hyps = []
        return new_state

    bsbs._decode_one_block = _decode_one_block
    return bsbs


def main() -> int:
    # conftest import installs the torchaudio stub the reference frontend
    # needs and pins JAX to CPU with the virtual 8-device mesh.
    import conftest  # noqa: F401
    import torch

    from helpers import (
        FLAGSHIP_GOLDEN_SEED,
        make_flagship_parity_setup,
    )
    from test_beam_search import _patch_reference_extend_prob

    import jax.numpy as jnp

    from speechcatcher_tpu.decode.beam_search import (
        BlockwiseSynchronousBeamSearch,
    )

    espnet_mode = "--espnet-semantics" in sys.argv
    fixture = FIXTURE_ESPNET if espnet_mode else FIXTURE
    model, ref_model, chunks, finals = make_flagship_parity_setup()

    # --- reference decode (slow Python BSBS; run once, committed) -------
    from speechcatcher.beam_search.beam_search import create_beam_search

    _patch_reference_extend_prob()
    t0 = time.time()
    if espnet_mode:
        bsbs = make_espnet_semantics_bsbs(ref_model)
    else:
        bsbs = create_beam_search(
            ref_model, beam_size=BEAM, ctc_weight=0.3, decoder_weight=0.7,
            device="cpu", use_bbd=True,
        )
    state = None
    with torch.no_grad():
        for i, (chunk, is_final) in enumerate(zip(chunks, finals)):
            lens = torch.tensor([chunk.shape[1]])
            state = bsbs.process_block(torch.from_numpy(chunk), lens, is_final)
            print(f"reference chunk {i+1}/{len(chunks)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    ref_hyps = sorted(state.hypotheses, key=lambda h: h.score, reverse=True)
    ref_best = ref_hyps[0]
    golden = {
        "seed": FLAGSHIP_GOLDEN_SEED,
        "beam": BEAM,
        "eos_commit": "espnet" if espnet_mode else "native",
        "use_bbd": not espnet_mode,
        "cfg": asdict(model.cfg),
        "yseq": ref_best.yseq.numpy().tolist(),
        "xpos": ref_best.xpos.numpy().tolist(),
        "score": float(ref_best.score),
        "nbest_yseq": [h.yseq.numpy().tolist() for h in ref_hyps],
        "nbest_score": [float(h.score) for h in ref_hyps],
    }
    print(f"reference decode: {len(golden['yseq'])} tokens, "
          f"score {golden['score']:.4f}, {time.time()-t0:.0f}s")

    # --- our decode: must match before we bless --------------------------
    t0 = time.time()
    ours = BlockwiseSynchronousBeamSearch(
        model, beam_size=BEAM, ctc_weight=0.3, use_bbd=not espnet_mode,
        eos_commit="espnet" if espnet_mode else "native",
    )
    for chunk, is_final in zip(chunks, finals):
        ours.process_block(jnp.asarray(chunk), is_final=is_final)
    our_hyps = ours.nbest_hypotheses()
    our_yseq, our_xpos, our_score = our_hyps[0]
    print(f"our decode: {len(our_yseq)} tokens, score {our_score:.4f}, "
          f"{time.time()-t0:.0f}s")

    if list(our_yseq) != golden["yseq"]:
        print("FAIL: token mismatch — do not bless\n"
              f"  ref: {golden['yseq']}\n  our: {list(our_yseq)}")
        return 1
    if list(our_xpos) != golden["xpos"]:
        print(f"FAIL: xpos mismatch\n  ref: {golden['xpos']}\n"
              f"  our: {list(our_xpos)}")
        return 1
    if abs(our_score - golden["score"]) > 1e-2 * max(1.0, abs(golden["score"])):
        print(f"FAIL: score drift {our_score} vs {golden['score']}")
        return 1

    fixture.parent.mkdir(parents=True, exist_ok=True)
    fixture.write_text(json.dumps(golden, indent=1) + "\n")
    print(f"PASS — blessed {fixture} ({len(golden['yseq'])} tokens)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
