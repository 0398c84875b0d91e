"""Flagship-dims golden decode (VERDICT r03 #7): replay OUR streaming BSBS
at the SERVING architecture (d=512/18L/8H, beam 5) against the committed
torch-golden fixture.

The fixture (tests/fixtures/flagship_golden.json) was produced by
scripts/bless_flagship_golden.py, which ran the reference Python BSBS
(/root/reference/speechcatcher/beam_search/beam_search.py) on the same
deterministic random weights + features and verified token-exact agreement
with this decode before writing it. CI then only pays our (fast) side:
weights regenerate from torch.manual_seed, features from the pinned
RandomState — both recorded in the fixture.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.decode.beam_search import BlockwiseSynchronousBeamSearch

torch = pytest.importorskip("torch")
pytest.importorskip("speechcatcher")

FIXTURE = Path(__file__).parent / "fixtures" / "flagship_golden.json"
FIXTURE_ESPNET = (Path(__file__).parent / "fixtures"
                  / "flagship_golden_espnet.json")


def _replay_fixture(fixture: Path):
    """Shared replay: decode with the fixture's recorded semantics mode
    and assert token/position/score exactness vs the blessed torch run."""
    from helpers import FLAGSHIP_GOLDEN_SEED, make_flagship_parity_setup

    golden = json.loads(fixture.read_text())
    assert golden["seed"] == FLAGSHIP_GOLDEN_SEED, (
        "fixture was blessed for a different seed — re-run "
        "scripts/bless_flagship_golden.py"
    )

    model, _ref, chunks, finals = make_flagship_parity_setup(golden["seed"])
    # Architecture drift guard: the fixture records the blessed config.
    import dataclasses

    assert dataclasses.asdict(model.cfg) == golden["cfg"], (
        "flagship_parity_config changed since the fixture was blessed"
    )

    bsbs = BlockwiseSynchronousBeamSearch(
        model, beam_size=golden["beam"], ctc_weight=0.3,
        use_bbd=golden.get("use_bbd", True),
        eos_commit=golden.get("eos_commit", "native"),
    )
    for chunk, is_final in zip(chunks, finals):
        bsbs.process_block(jnp.asarray(chunk), is_final=is_final)
    yseq, xpos, score = bsbs.nbest_hypotheses()[0]

    assert list(yseq) == golden["yseq"], (
        f"token mismatch vs blessed torch decode:\n"
        f"  golden: {golden['yseq']}\n  ours:   {list(yseq)}"
    )
    assert list(xpos) == golden["xpos"]
    np.testing.assert_allclose(score, golden["score"], rtol=1e-2, atol=1e-2)


@pytest.mark.skipif(not FIXTURE.exists(),
                    reason="no blessed fixture; run "
                    "scripts/bless_flagship_golden.py")
def test_flagship_golden_token_exact():
    _replay_fixture(FIXTURE)


@pytest.mark.skipif(not FIXTURE_ESPNET.exists(),
                    reason="no blessed fixture; run "
                    "scripts/bless_flagship_golden.py --espnet-semantics")
def test_flagship_golden_espnet_semantics():
    """ESPnet-path semantics (docs/ESPNET_PARITY.md D1+D2): the blessing
    script patched the reference torch BSBS to the espnet backend's
    control flow (EOS-detecting step discarded, lagged rewind snapshot,
    repetition detection off) and verified our eos_commit="espnet",
    use_bbd=False decode token-exact before writing the fixture."""
    _replay_fixture(FIXTURE_ESPNET)


FIXTURE_CONFORMER = (Path(__file__).parent / "fixtures"
                     / "flagship_conformer_golden.json")


@pytest.mark.skipif(not FIXTURE_CONFORMER.exists(),
                    reason="no blessed fixture; run "
                    "scripts/bless_conformer_golden.py")
def test_flagship_conformer_regression():
    """Conformer variant at serving dims vs its self-blessed regression
    golden (the reference has no conformer encoder to anchor against —
    see the blessing script's provenance note; torch parity for the
    conformer building blocks lives in tests/test_conformer.py). The
    model regenerates from ASRModel.random_init — no torch weights
    involved (this module's importorskip gate still applies)."""
    from bless_conformer_golden import build_model, decode

    golden = json.loads(FIXTURE_CONFORMER.read_text())
    model = build_model()
    import dataclasses

    assert dataclasses.asdict(model.cfg) == golden["cfg"], (
        "conformer flagship config drifted since the fixture was blessed"
    )
    yseq, xpos, score = decode(model)
    assert [int(t) for t in yseq] == golden["yseq"]
    assert [int(p) for p in xpos] == golden["xpos"]
    np.testing.assert_allclose(score, golden["score"], rtol=1e-2, atol=1e-2)
