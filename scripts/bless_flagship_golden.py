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
BEAM = 5


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

    model, ref_model, chunks, finals = make_flagship_parity_setup()

    # --- reference decode (slow Python BSBS; run once, committed) -------
    from speechcatcher.beam_search.beam_search import create_beam_search

    _patch_reference_extend_prob()
    t0 = time.time()
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
        model, beam_size=BEAM, ctc_weight=0.3, use_bbd=True
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

    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(golden, indent=1) + "\n")
    print(f"PASS — blessed {FIXTURE} ({len(golden['yseq'])} tokens)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
