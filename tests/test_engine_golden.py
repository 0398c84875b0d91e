"""Flagship-dims AUDIO-level engine goldens (VERDICT r04 #4): replay the
batched StreamingEngine at the serving architecture (d=512/18L/8H, beam 5)
against the committed torch-anchored fixture.

The fixture (tests/fixtures/flagship_engine_golden.json) was produced by
scripts/bless_engine_golden.py, which decoded deterministic synth audio
through our full pipeline (frontend → streaming encoder → BSBS), replayed
the identical visible-feature schedule through the reference torch BSBS
(/root/reference/speechcatcher/beam_search/beam_search.py), and verified
token/xpos-exact agreement before writing. Precision-mode token lists
(bench.py's serving default bf16+mu-law, int8, int8_all) were recorded on
CPU at bless time; CI replays them exactly (CPU XLA is deterministic for
these programs) — their edit distance vs the f32 golden is stored in the
fixture as drift evidence.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "flagship_engine_golden.json"

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(),
    reason="no blessed fixture; run scripts/bless_engine_golden.py",
)


@pytest.fixture(scope="module")
def golden():
    return json.loads(FIXTURE.read_text())


@pytest.fixture(scope="module")
def flagship_model(golden):
    import dataclasses

    pytest.importorskip("torch")
    pytest.importorskip("speechcatcher")
    from helpers import make_flagship_parity_setup

    model, _ref, _chunks, _finals = make_flagship_parity_setup(
        golden["seed"], eos_bias=golden["eos_bias"],
        blank_bias=golden["blank_bias"],
    )
    assert dataclasses.asdict(model.cfg) == golden["cfg"], (
        "flagship_parity_config changed since the fixture was blessed"
    )
    return model


def _audio(golden, seed):
    from bless_engine_golden import synth_audio

    return synth_audio(seed, golden["n_ticks"] * golden["chunk_samples"])


def _norm(model, yseq, xpos):
    from bless_engine_golden import normalize_final

    return normalize_final(model.cfg, model.tokenizer.unk_id, yseq, xpos)


def test_engine_batched_staggered_churn_matches_golden(golden, flagship_model):
    """The core batched-engine replay: three slots decoding two distinct
    audios with staggered start ticks, plus a churned (released + reused)
    slot decoding a second utterance — every final must equal its audio's
    torch-anchored golden exactly."""
    from speechcatcher_tpu.serve.engine import StreamingEngine

    model = flagship_model
    chunk = golden["chunk_samples"]
    n = golden["n_ticks"]
    seeds = golden["audio_seeds"]
    a0, a1 = _audio(golden, seeds[0]), _audio(golden, seeds[1])
    g0 = (golden["audios"][str(seeds[0])]["ids"],
          golden["audios"][str(seeds[0])]["pos"])
    g1 = (golden["audios"][str(seeds[1])]["ids"],
          golden["audios"][str(seeds[1])]["pos"])

    eng = StreamingEngine(model, n_slots=3, beam_size=golden["beam"],
                          chunk_samples=chunk)
    s0 = eng.acquire_slot()            # audio0 from tick 0
    eng.tick({s0: a0[:chunk]})
    s1 = eng.acquire_slot()            # audio1 joins one tick later
    eng.tick({s0: a0[chunk:2 * chunk], s1: a1[:chunk]})
    s2 = eng.acquire_slot()            # audio0 again, two ticks staggered
    for i in range(2, n - 1):
        eng.tick({
            s0: a0[i * chunk:(i + 1) * chunk],
            s1: a1[(i - 1) * chunk:i * chunk],
            s2: a0[(i - 2) * chunk:(i - 1) * chunk],
        })
    f0 = eng.finalize(s0, a0[(n - 1) * chunk:n * chunk])
    assert _norm(model, f0[0], f0[1]) == g0, "slot0 (audio0) != golden"

    # Churn: the released slot is immediately reused for a new utterance
    # (audio1) while s1/s2 are still mid-stream.
    s3 = eng.acquire_slot()
    assert s3 == s0, "released slot should be reused"
    ticks_done = {1: n - 2, 2: n - 3, 3: 0}
    streams = {1: (s1, a1), 2: (s2, a0), 3: (s3, a1)}
    while streams:
        batch, final_now = {}, []
        for k, (s, a) in streams.items():
            i = ticks_done[k]
            if i == n - 1:
                final_now.append(k)
            else:
                batch[s] = a[i * chunk:(i + 1) * chunk]
                ticks_done[k] += 1
        if batch:
            eng.tick(batch)
        for k in final_now:
            s, a = streams.pop(k)
            f = eng.finalize(s, a[(n - 1) * chunk:n * chunk])
            want = g1 if a is a1 else g0
            assert _norm(model, f[0], f[1]) == want, f"stream {k} != golden"


@pytest.mark.parametrize("mode", ["serving_default", "int8_all"])
def test_engine_precision_mode_matches_recording(golden, mode):
    """bench.py's serving precisions replay exactly against the blessed
    recording (and the fixture documents each mode's drift vs the f32
    golden). int8 (encoder-only) is strictly milder than int8_all and is
    covered by the fixture recording; set SC_TPU_ALL_FIXTURE_MODES=1 to
    replay it too."""
    pytest.importorskip("torch")
    pytest.importorskip("speechcatcher")
    from bless_engine_golden import engine_decode, precision_model

    rec = golden["modes"][mode]
    model = precision_model(golden["seed"], mode)
    audio = _audio(golden, golden["audio_seeds"][0])
    ids, pos = engine_decode(model, audio, wire=rec["wire"])
    assert ids == rec["ids"], (
        f"{mode}: tokens moved since bless "
        f"(recorded drift vs golden was {rec['edit_distance_vs_golden']})"
    )
    assert pos == rec["pos"]


@pytest.mark.skipif(
    not os.environ.get("SC_TPU_ALL_FIXTURE_MODES"),
    reason="env-gated (SC_TPU_ALL_FIXTURE_MODES=1): int8 encoder-only replay",
)
def test_engine_int8_encoder_matches_recording(golden):
    pytest.importorskip("torch")
    pytest.importorskip("speechcatcher")
    from bless_engine_golden import engine_decode, precision_model

    rec = golden["modes"]["int8"]
    model = precision_model(golden["seed"], "int8")
    audio = _audio(golden, golden["audio_seeds"][0])
    ids, pos = engine_decode(model, audio, wire=rec["wire"])
    assert ids == rec["ids"] and pos == rec["pos"]
