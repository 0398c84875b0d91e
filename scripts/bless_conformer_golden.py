#!/usr/bin/env python
"""Bless the flagship-dims CONFORMER regression fixture (VERDICT r04 #4).

Provenance differs from flagship_golden.json: the reference ships only the
contextual-block TRANSFORMER encoder (/root/reference/speechcatcher/model/
encoder/ contains no conformer), so our conformer variant
(speechcatcher_tpu/ops/conformer.py, encoder_type="conformer") has no
full-encoder torch anchor — its torch parity is module-level
(tests/test_conformer.py: conv module, rel-pos attention vs in-repo torch
reimplementations). This fixture is therefore a SELF-BLESSED regression
golden: the decode recorded here pins today's (module-parity-verified)
behavior so later refactors of the conformer path, the rel-pos Pallas
kernel's CPU fallback, or the shared block machinery cannot silently move
tokens at serving dims.

    JAX_PLATFORMS=cpu python scripts/bless_conformer_golden.py

Writes tests/fixtures/flagship_conformer_golden.json, consumed by
tests/test_flagship_golden.py::test_flagship_conformer_regression.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import asdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXTURE = REPO / "tests" / "fixtures" / "flagship_conformer_golden.json"
BEAM = 5
SEED = 7
N_CHUNKS = 10
CHUNK_T = 120


def build_model():
    """Flagship dims, conformer encoder, bench-style emission biases."""
    from __graft_entry__ import _flagship_config
    from speechcatcher_tpu.models.asr_model import ASRModel

    cfg = _flagship_config().replace(encoder_type="conformer")
    model = ASRModel.random_init(cfg, seed=SEED)
    dec_out = model.params["decoder"]["output_layer"]
    model.params["decoder"]["output_layer"] = {
        **dec_out, "bias": dec_out["bias"].at[cfg.eos_id].add(4.0),
    }
    ctc_lo = model.params["ctc"]["ctc_lo"]
    model.params["ctc"]["ctc_lo"] = {
        **ctc_lo, "bias": ctc_lo["bias"].at[cfg.blank_id].add(10.0),
    }
    return model


def decode(model):
    import jax.numpy as jnp

    from helpers import rand_feats
    from speechcatcher_tpu.decode.beam_search import (
        BlockwiseSynchronousBeamSearch,
    )

    rng = np.random.RandomState(SEED)
    chunks = [rand_feats(rng, 1, CHUNK_T, model.cfg.n_mels)
              for _ in range(N_CHUNKS)]
    bsbs = BlockwiseSynchronousBeamSearch(model, beam_size=BEAM,
                                          ctc_weight=0.3)
    for i, chunk in enumerate(chunks):
        bsbs.process_block(jnp.asarray(chunk), is_final=(i == N_CHUNKS - 1))
    return bsbs.nbest_hypotheses()[0]


def main() -> int:
    import conftest  # noqa: F401  (CPU pin, virtual mesh)

    model = build_model()
    t0 = time.time()
    yseq, xpos, score = decode(model)
    print(f"conformer decode: {len(yseq)} tokens, score {score:.4f}, "
          f"{time.time() - t0:.0f}s")
    if len(yseq) < 5:
        print("FAIL: degenerate decode — adjust biases before blessing")
        return 1
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps({
        "provenance": "self-blessed regression golden (no torch conformer "
                      "reference exists); module-level torch parity in "
                      "tests/test_conformer.py",
        "seed": SEED,
        "beam": BEAM,
        "n_chunks": N_CHUNKS,
        "chunk_t": CHUNK_T,
        "cfg": asdict(model.cfg),
        "yseq": [int(t) for t in yseq],
        "xpos": [int(p) for p in xpos],
        "score": float(score),
    }, indent=1) + "\n")
    print(f"PASS — blessed {FIXTURE}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
