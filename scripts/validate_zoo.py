#!/usr/bin/env python
"""One-command real-checkpoint validation on a connected machine.

The build environment has no network egress, so WER parity on the real
model zoo cannot be proven there. This script makes it a one-command check
the moment egress exists, mirroring the reference's CI smoke
(/root/reference/.github/workflows/python-package-test.yml:27-33: decode a
public LibriVox recording end-to-end) and its golden-transcript tier
(/root/reference/tests/test_end_to_end.py:17-21).

Usage (machine with internet access):

    python scripts/validate_zoo.py                  # decode + WER report
    python scripts/validate_zoo.py --bless          # store the decode as
                                                    # the golden fixture
    python scripts/validate_zoo.py --espnet-diff    # also diff against the
                                                    # installed reference
                                                    # (`pip install speechcatcher`)

What it does:
1. Resolves --tag (default de_streaming_transformer_m) through
   speechcatcher_tpu.utils.zoo (HF download, offline-first cache).
2. Downloads the reference CI's LibriVox recording (AUDIO_URL below) into
   the cache and decodes it through the full file pipeline (ffmpeg →
   segmentation → batched streaming decode).
3. Reports WER against (a) the committed golden transcript fixture
   (tests/fixtures/<fixture>) when present — the PARITY gate, threshold
   --max-drift-wer — and (b) the known ground-truth poem text — an
   absolute-quality cross-check, threshold --max-truth-wer (loose: the
   recording carries LibriVox intro/outro boilerplate that counts as
   insertions against the bare poem).
4. With --bless, writes the decode to the fixture path for committing
   (after human review!). Tier B (tests/test_checkpoint_real.py) consumes
   the same fixture automatically once audio + model are cached.
5. With --espnet-diff, decodes the same file through the installed
   reference CLI (`speechcatcher --decoder espnet`) and prints the
   word-level diff — the reconciliation with the reference's 100%-golden
   path (/root/reference/docs/README.md:194).

Exit code: 0 = every requested gate passed; 1 = a gate failed;
2 = environment problem (no egress / missing deps).
"""

from __future__ import annotations

import argparse
import difflib
import subprocess
import sys
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AUDIO_URL = (
    "https://upload.wikimedia.org/wikipedia/commons/6/65/"
    "LibriVox_-_Fontane_Herr_von_Ribbeck.ogg"
)
FIXTURE_DIR = REPO / "tests" / "fixtures"
TRUTH_FILE = FIXTURE_DIR / "herr_von_ribbeck_truth.txt"


def fixture_path(tag: str) -> Path:
    return FIXTURE_DIR / f"librivox_ribbeck.{tag}.txt"


def fetch_audio(cache_dir: Path) -> Path:
    dest = cache_dir / "validate" / Path(AUDIO_URL).name
    dest.parent.mkdir(parents=True, exist_ok=True)
    if not dest.exists():
        print(f"Downloading {AUDIO_URL}")
        try:
            urllib.request.urlretrieve(AUDIO_URL, dest)
        except OSError as e:
            print(f"ERROR: cannot download audio ({e}); this script needs "
                  "network egress", file=sys.stderr)
            sys.exit(2)
    return dest


def decode(tag: str, audio: Path, cache_dir: Path, beam_size: int,
           dtype: str = "float32", mulaw_wire: bool = False) -> str:
    """Decode `audio` with the zoo model at the requested precision mode.

    dtype is a Speech2TextStreaming precision mode (float32 | bfloat16 |
    int8 | int8-all — see streaming.py). mulaw_wire additionally
    round-trips the audio through the serving wire codec
    (serve/wire.py::mulaw_encode_i16 → mulaw_decode), which is
    bit-identical to what the batched engine's uint8 ingest computes on
    device (tests/test_wire.py) — so its WER impact is measured without a
    websocket in the loop."""
    from speechcatcher_tpu.recognize import load_model, recognize
    from speechcatcher_tpu.utils.audio import convert_media

    try:
        s2t = load_model(tag=tag, beam_size=beam_size,
                         cache_dir=str(cache_dir), dtype=dtype)
    except Exception as e:
        print(f"ERROR: model download/load failed for '{tag}': {e}",
              file=sys.stderr)
        sys.exit(2)
    data, rate = convert_media(str(audio))
    if mulaw_wire:
        from speechcatcher_tpu.serve.wire import mulaw_decode, mulaw_encode_i16

        # convert_media returns INT16-scale samples and recognize()
        # divides by 32767 — so encode with the int16 codec and rescale
        # the [-1, 1] decode back to int16 scale. (Encoding the raw int16
        # values with mulaw_encode_f32 would clip every |s| >= 1 to ±1 —
        # a sign square wave — and the /32767 inside recognize would then
        # shrink the decode to near-silence.)
        data = mulaw_decode(mulaw_encode_i16(data)) * np.float32(32767.0)
    text, _ = recognize(s2t, data, rate, progress=True, quiet=True)
    return text.strip()


def espnet_reference_decode(audio: Path) -> str | None:
    """Decode through the installed reference package (espnet golden path)."""
    try:
        res = subprocess.run(
            ["speechcatcher", "--decoder", "espnet", str(audio)],
            capture_output=True, text=True, timeout=3600,
        )
    except FileNotFoundError:
        print("NOTE: `speechcatcher` CLI not installed "
              "(pip install speechcatcher) — skipping espnet diff")
        return None
    txt = Path(str(audio) + ".txt")
    if res.returncode != 0 or not txt.exists():
        print(f"NOTE: reference decode failed (rc={res.returncode}); "
              f"stderr tail: {res.stderr.strip().splitlines()[-3:]}")
        return None
    return txt.read_text().strip()


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--tag", default="de_streaming_transformer_m")
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--cache-dir", default="~/.cache/speechcatcher_tpu")
    parser.add_argument("--bless", action="store_true",
                        help="write the decode as the golden fixture")
    parser.add_argument("--espnet-diff", action="store_true",
                        help="also diff vs the installed reference CLI "
                        "(espnet decoder, the 100%%-parity path)")
    parser.add_argument("--max-drift-wer", type=float, default=0.02,
                        help="gate vs the committed golden fixture")
    parser.add_argument("--max-truth-wer", type=float, default=0.40,
                        help="loose gate vs the bare poem text (LibriVox "
                        "boilerplate counts as insertions)")
    parser.add_argument("--modes", default="float32",
                        help="comma list of precision modes to decode and "
                        "WER-table (float32,bfloat16,int8,int8-all,mulaw; "
                        "'all' = every mode). The golden/bless gates apply "
                        "to the float32 decode; every other mode is "
                        "reported as a WER delta vs float32 AND vs truth, "
                        "gated by --max-mode-drift-wer.")
    parser.add_argument("--max-mode-drift-wer", type=float, default=0.03,
                        help="gate for each reduced-precision mode's WER "
                        "vs the float32 decode of the same audio")
    args = parser.parse_args()

    from speechcatcher_tpu.wer import word_error_rate

    cache_dir = Path(args.cache_dir).expanduser()
    audio = fetch_audio(cache_dir)
    hyp = decode(args.tag, audio, cache_dir, args.beam_size)
    print(f"\n=== decode ({args.tag}) ===\n{hyp}\n")

    ok = True

    # Per-precision-mode WER table: bfloat16 / int8 / int8-all are the
    # serving precision modes (streaming.py) and "mulaw" is the serving
    # wire codec; each ships with exactness/structural tests only — the
    # WER impact on a REAL model is measured here, in the same command as
    # the parity gate, the moment egress exists.
    all_modes = ["bfloat16", "int8", "int8-all", "mulaw"]
    modes = ([] if args.modes in ("", "float32") else
             all_modes if args.modes == "all" else
             [m for m in args.modes.split(",") if m != "float32"])
    if modes:
        truth = TRUTH_FILE.read_text().strip() if TRUTH_FILE.exists() else None
        print(f"{'mode':<10} {'WER vs f32':>11} {'WER vs truth':>13}")
        print(f"{'float32':<10} {0.0:>11.3f} " + (
            f"{word_error_rate([truth], [hyp])['wer']:>13.3f}"
            if truth else f"{'n/a':>13}"))
        for mode in modes:
            m_hyp = decode(args.tag, audio, cache_dir, args.beam_size,
                           dtype="float32" if mode == "mulaw" else mode,
                           mulaw_wire=(mode == "mulaw"))
            drift = word_error_rate([hyp], [m_hyp])["wer"]
            t_wer = (word_error_rate([truth], [m_hyp])["wer"]
                     if truth else None)
            print(f"{mode:<10} {drift:>11.3f} " + (
                f"{t_wer:>13.3f}" if t_wer is not None else f"{'n/a':>13}"))
            if drift > args.max_mode_drift_wer:
                print(f"FAIL: {mode} drift {drift:.3f} vs float32 > "
                      f"{args.max_mode_drift_wer}")
                ok = False

    if TRUTH_FILE.exists():
        truth = TRUTH_FILE.read_text().strip()
        m = word_error_rate([truth], [hyp])
        print(f"WER vs ground-truth poem: {m['wer']:.3f} "
              f"(cer {m['cer']:.3f}, sub {m['substitutions']} "
              f"del {m['deletions']} ins {m['insertions']})")
        if m["wer"] > args.max_truth_wer:
            print(f"FAIL: truth WER {m['wer']:.3f} > {args.max_truth_wer}")
            ok = False

    fx = fixture_path(args.tag)
    if args.bless:
        fx.parent.mkdir(parents=True, exist_ok=True)
        fx.write_text(hyp + "\n")
        print(f"Blessed fixture written: {fx} — review and commit it.")
    elif fx.exists():
        golden = fx.read_text().strip()
        m = word_error_rate([golden], [hyp])
        print(f"WER vs blessed fixture: {m['wer']:.3f}")
        if m["wer"] > args.max_drift_wer:
            print(f"FAIL: drift {m['wer']:.3f} > {args.max_drift_wer} "
                  f"vs {fx}")
            for line in difflib.unified_diff(
                golden.split(), hyp.split(), lineterm="", n=2
            ):
                print(f"  {line}")
            ok = False
    else:
        print(f"NOTE: no blessed fixture at {fx}; run with --bless once "
              "and commit it to enable the drift gate.")

    if args.espnet_diff:
        ref = espnet_reference_decode(audio)
        if ref is not None:
            m = word_error_rate([ref], [hyp])
            words = max(m["words"], 1)
            agree = 1.0 - m["wer"]
            print(f"Word agreement vs reference espnet path: "
                  f"{agree:.1%} ({words} ref words) — the reference's own "
                  f"native path scores 92% here "
                  f"(/root/reference/docs/README.md:185)")
            for line in difflib.unified_diff(
                ref.split(), hyp.split(), lineterm="", n=2
            ):
                print(f"  {line}")

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
