#!/usr/bin/env python
"""Bless the flagship-dims AUDIO-level engine golden fixture (VERDICT r04 #4).

The feature-level flagship fixture (bless_flagship_golden.py) anchors the
beam search alone; this script anchors the FULL serving pipeline — audio →
frontend → streaming encoder → BSBS — and the batched engine's precision
modes, at the serving architecture (d=512/18L, beam 5):

1. golden: our Speech2TextStreaming session decodes deterministic synth
   audio; the feature blocks it passes to BSBS.process_block are recorded
   and replayed through the reference torch BSBS
   (/root/reference/speechcatcher/beam_search/beam_search.py via
   create_beam_search) — the fixture is blessed only if the torch decode
   is token/xpos-exact with ours. Two audio seeds are blessed so the
   batched replay test can mix distinct streams.
2. engine_f32: the batched StreamingEngine (single slot, float32) must
   reproduce the golden exactly before blessing.
3. Precision-mode recordings (single slot, same audio): the bench.py
   serving default (bf16 weights + bf16 cache/ctc/enc rings + uint8 mu-law
   wire), int8 (encoder linears), int8_all (every eligible linear). Each
   mode's decoded tokens are recorded in the fixture with its edit
   distance vs the golden; CI replays them exactly (CPU-deterministic).

Run on a dev machine with /root/reference importable:

    JAX_PLATFORMS=cpu python scripts/bless_engine_golden.py

Writes tests/fixtures/flagship_engine_golden.json, consumed by
tests/test_engine_golden.py.
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

FIXTURE = REPO / "tests" / "fixtures" / "flagship_engine_golden.json"
BEAM = 5
CHUNK = 8192           # engine tick size (samples) — serving default
N_TICKS = 10           # 5.12 s per utterance
AUDIO_SEEDS = (100, 101)
# Realistic-emission weight biases (see helpers.make_flagship_parity_setup):
# real log-mel features of synth audio sit far from the N(0,1) stats the
# feature-level fixtures use — the feature fixture's (+4, +10) makes the
# empty hypothesis win outright here. Swept 2026-08-20: (0, +8) decodes
# 31 tokens on audio seed 100 (~6 tokens/s, a realistic emission rate).
EOS_BIAS = 0.0
BLANK_BIAS = 8.0


def synth_audio(seed: int, n_samples: int, rate: int = 16000) -> np.ndarray:
    """Deterministic tone+noise mix (same family as tests/test_engine.py)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples) / rate
    f = 200 + 100 * (seed % 5)
    tone = 0.3 * np.sin(2 * np.pi * f * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
    return (tone + 0.05 * rng.randn(n_samples)).astype(np.float32)


def normalize_final(cfg, unk_id: int, yseq, xpos):
    """Engine/session final → filtered (ids, pos): drop sos, trailing eos,
    blanks/unk — the same convention the engine parity tests use."""
    ids = list(map(int, yseq[1:]))
    pos = list(map(int, xpos[1:]))
    if ids and ids[-1] == cfg.eos_id:
        ids, pos = ids[:-1], pos[:-1]
    drop = {cfg.blank_id, unk_id, cfg.eos_id}
    keep = [i for i, t in enumerate(ids) if t not in drop]
    return [ids[i] for i in keep], [pos[i] for i in keep]


def session_decode_recording_blocks(model, audio):
    """Run our streaming session; return (ids, pos, recorded feature blocks).

    The session is the behavior anchor: whatever (feats, is_final) pairs it
    hands to BSBS.process_block are recorded so the torch reference decodes
    the IDENTICAL visible-feature schedule."""
    from speechcatcher_tpu.streaming import Speech2TextStreaming

    s2t = Speech2TextStreaming(model=model, beam_size=BEAM)
    blocks = []
    orig = s2t.beam_search.process_block

    def recording(feats, is_final=False):
        blocks.append((np.asarray(feats), bool(is_final)))
        return orig(feats, is_final=is_final)

    s2t.beam_search.process_block = recording
    results = []
    for i in range(N_TICKS):
        chunk = audio[i * CHUNK:(i + 1) * CHUNK]
        results = s2t(chunk, is_final=(i == N_TICKS - 1))
    assert results, "session produced no final result"
    _text, _tokens, ids, pos = results[0]
    return list(map(int, ids)), list(map(int, pos)), blocks


def torch_reference_decode(ref_model, blocks):
    """Reference torch BSBS (native semantics, use_bbd=True — the decode
    configuration the session runs) over the recorded feature schedule."""
    import torch

    from speechcatcher.beam_search.beam_search import create_beam_search
    from test_beam_search import _patch_reference_extend_prob

    _patch_reference_extend_prob()
    bsbs = create_beam_search(
        ref_model, beam_size=BEAM, ctc_weight=0.3, decoder_weight=0.7,
        device="cpu", use_bbd=True,
    )
    state = None
    t0 = time.time()
    with torch.no_grad():
        for i, (feats, is_final) in enumerate(blocks):
            lens = torch.tensor([feats.shape[1]])
            state = bsbs.process_block(torch.from_numpy(feats), lens, is_final)
            print(f"  torch block {i + 1}/{len(blocks)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    best = max(state.hypotheses, key=lambda h: h.score)
    return (best.yseq.numpy().tolist(), best.xpos.numpy().tolist(),
            float(best.score))


def engine_decode(model, audio, wire: str = "float32"):
    """Single-slot engine decode → normalized (ids, pos)."""
    from speechcatcher_tpu.serve.engine import StreamingEngine
    from speechcatcher_tpu.serve.wire import encode_chunk

    eng = StreamingEngine(model, n_slots=2, beam_size=BEAM,
                          chunk_samples=CHUNK)
    s = eng.acquire_slot()
    for i in range(N_TICKS - 1):
        chunk = audio[i * CHUNK:(i + 1) * CHUNK]
        if wire != "float32":
            chunk = encode_chunk(chunk, wire)
        eng.tick({s: chunk})
    last = audio[(N_TICKS - 1) * CHUNK:N_TICKS * CHUNK]
    if wire != "float32":
        last = encode_chunk(last, wire)
    yseq, xpos, _score = eng.finalize(s, last)
    return normalize_final(model.cfg, model.tokenizer.unk_id, yseq, xpos)


def precision_model(seed: int, mode: str):
    """Build the flagship model in one of the bench.py serving precisions.

    Weights must be bit-identical to the f32 golden model BEFORE the
    precision transform, so every mode reuses the same torch-seeded
    parameters (reference_params_to_jax of the same modules)."""
    import dataclasses

    from helpers import make_flagship_parity_setup

    from speechcatcher_tpu.ops.layers import cast_params, quantize_params_int8

    model, _ref, _chunks, _finals = make_flagship_parity_setup(
        seed, eos_bias=EOS_BIAS, blank_bias=BLANK_BIAS
    )
    if mode == "f32":
        return model
    # bench.py::_build_model serving default: bf16 caches + rings, bf16
    # matmul weights (fp32 accumulation/norms).
    cfg16 = dataclasses.replace(
        model.cfg, cache_dtype="bfloat16", ctc_ring_dtype="bfloat16",
        enc_ring_dtype="bfloat16",
    )
    model = dataclasses.replace(model, cfg=cfg16)
    params = cast_params(model.params)
    if mode == "int8":
        params = quantize_params_int8(params, scope=("encoder",))
    elif mode == "int8_all":
        params = quantize_params_int8(params, scope=None)
    else:
        assert mode == "serving_default", mode
    return dataclasses.replace(model, params=params)


def edit_distance(a, b):
    from speechcatcher_tpu.wer import edit_distance_counts

    s, d, i = edit_distance_counts([str(x) for x in a],
                                   [str(x) for x in b])
    return int(s + d + i)


def main() -> int:
    import conftest  # noqa: F401  (torchaudio stub + CPU pin)

    from helpers import FLAGSHIP_GOLDEN_SEED, make_flagship_parity_setup

    model, ref_model, _chunks, _finals = make_flagship_parity_setup(
        FLAGSHIP_GOLDEN_SEED, eos_bias=EOS_BIAS, blank_bias=BLANK_BIAS
    )
    n_samples = N_TICKS * CHUNK
    golden = {
        "seed": FLAGSHIP_GOLDEN_SEED,
        "eos_bias": EOS_BIAS,
        "blank_bias": BLANK_BIAS,
        "beam": BEAM,
        "chunk_samples": CHUNK,
        "n_ticks": N_TICKS,
        "audio_seeds": list(AUDIO_SEEDS),
        "cfg": asdict(model.cfg),
        "audios": {},
        "modes": {},
    }

    for aseed in AUDIO_SEEDS:
        audio = synth_audio(aseed, n_samples)
        print(f"audio seed {aseed}: session decode …", flush=True)
        ids, pos, blocks = session_decode_recording_blocks(model, audio)
        print(f"  session: {len(ids)} tokens; torch reference decode …",
              flush=True)
        t_yseq, t_xpos, t_score = torch_reference_decode(ref_model, blocks)
        t_ids, t_pos = normalize_final(model.cfg, model.tokenizer.unk_id,
                                       t_yseq, t_xpos)
        if (ids, pos) != (t_ids, t_pos):
            print(f"FAIL seed {aseed}: session vs torch mismatch\n"
                  f"  torch: {t_ids}\n  ours:  {ids}")
            return 1
        print(f"  torch agrees ({len(ids)} tokens, score {t_score:.4f})")
        e_ids, e_pos = engine_decode(model, audio)
        if (e_ids, e_pos) != (ids, pos):
            print(f"FAIL seed {aseed}: engine f32 vs golden mismatch\n"
                  f"  golden: {ids}\n  engine: {e_ids}")
            return 1
        print("  engine f32 agrees")
        golden["audios"][str(aseed)] = {
            "ids": ids, "pos": pos, "torch_score": t_score,
        }

    # Precision-mode recordings on the first audio.
    audio0 = synth_audio(AUDIO_SEEDS[0], n_samples)
    gold0 = golden["audios"][str(AUDIO_SEEDS[0])]["ids"]
    for mode, wire in (("serving_default", "mulaw"),
                       ("int8", "mulaw"),
                       ("int8_all", "mulaw")):
        print(f"mode {mode} (wire={wire}) …", flush=True)
        m = precision_model(FLAGSHIP_GOLDEN_SEED, mode)
        ids, pos = engine_decode(m, audio0, wire=wire)
        drift = edit_distance(gold0, ids)
        print(f"  {len(ids)} tokens, edit distance vs golden = {drift}")
        golden["modes"][mode] = {
            "wire": wire, "ids": ids, "pos": pos,
            "edit_distance_vs_golden": drift,
        }

    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(golden, indent=1) + "\n")
    print(f"PASS — blessed {FIXTURE}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
