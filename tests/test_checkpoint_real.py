"""Checkpoint validation tier.

Tier A (runs everywhere): a real `.pth` file round-trip — reference torch
modules saved exactly the way ESPnet training does ({"model": state_dict},
ESPnet key names), plus config.yaml / feats_stats.npz / search-priority
resolution, loaded back through the public `ASRModel.from_directory` path
and decoded. Mirrors the reference loader tests
(/root/reference/tests/test_checkpoint_loading.py) without needing a
download.

Tier B (skips when no real model is cached): loads a real ESPnet
checkpoint from the cache and decodes real audio against a stored golden
transcript with a WER bound — the reference's dominant test tier
(/root/reference/tests/test_end_to_end.py:17-21, BASELINE.md "at parity
WER").
"""

import os
from pathlib import Path

import numpy as np
import pytest

from speechcatcher_tpu.checkpoint import (
    find_checkpoint,
    find_stats,
    load_espnet_checkpoint,
    load_normalization_stats,
)
from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.streaming import Speech2TextStreaming

torch = pytest.importorskip("torch")

from helpers import make_reference_modules, reference_params_to_jax  # noqa: E402


# ---------------------------------------------------------------------------
# Tier A: synthetic-but-ESPnet-exact model directory
# ---------------------------------------------------------------------------

CFG = tiny_config()  # full 80-mel frontend


def _write_model_dir(tmp_path: Path, seed: int = 11) -> Path:
    """Create an ESPnet-layout model dir: exp/<run>/{valid.acc.ave_6best.pth,
    config.yaml} + asr_stats/train/feats_stats.npz, like the packages the
    zoo unpacks."""
    pytest.importorskip("speechcatcher")
    enc, dec, ctc = make_reference_modules(CFG, seed=seed)
    sd = {}
    for prefix, module in (("encoder.", enc), ("decoder.", dec),
                           ("ctc.", ctc)):
        for k, v in module.state_dict().items():
            sd[prefix + k] = v
    run = tmp_path / "exp" / "asr_train_asr_streaming_tiny"
    run.mkdir(parents=True)
    # ESPnet saves {"model": sd} in averaged checkpoints.
    torch.save({"model": sd}, run / "valid.acc.ave_6best.pth")

    import yaml

    config = {
        "encoder": "contextual_block_transformer",
        "encoder_conf": {
            "output_size": CFG.encoder_dim,
            "attention_heads": CFG.encoder_heads,
            "linear_units": CFG.encoder_linear_units,
            "num_blocks": CFG.encoder_layers,
            "input_layer": CFG.input_layer,
            "block_size": CFG.block_size,
            "hop_size": CFG.hop_size,
            "look_ahead": CFG.look_ahead,
            "init_average": True,
            "ctx_pos_enc": True,
        },
        "decoder_conf": {
            "attention_heads": CFG.decoder_heads,
            "linear_units": CFG.decoder_linear_units,
            "num_blocks": CFG.decoder_layers,
        },
        "frontend_conf": {"n_fft": CFG.n_fft, "hop_length": CFG.hop_length,
                          "win_length": CFG.win_length},
        "token_list": [f"t{i}" for i in range(CFG.vocab_size)],
    }
    with open(run / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    # MVN stats in the raw sum/sum_square/count form ESPnet collects.
    rng = np.random.RandomState(0)
    feats = rng.randn(1000, CFG.n_mels).astype(np.float64) * 2.0 + 1.0
    stats_dir = tmp_path / "exp" / "asr_stats_raw" / "train"
    stats_dir.mkdir(parents=True)
    np.savez(
        stats_dir / "feats_stats.npz",
        sum=feats.sum(0),
        sum_square=(feats**2).sum(0),
        count=np.asarray(feats.shape[0]),
    )
    return tmp_path


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    return _write_model_dir(tmp_path_factory.mktemp("espnet_model"))


def test_pth_roundtrip_matches_in_memory_conversion(model_dir):
    """torch.save → load_espnet_checkpoint == direct state_dict conversion."""
    import jax

    pytest.importorskip("speechcatcher")
    enc, dec, ctc = make_reference_modules(CFG, seed=11)
    expected = reference_params_to_jax(enc, dec, ctc, CFG)

    ckpt = find_checkpoint(model_dir)
    assert ckpt is not None and ckpt.name == "valid.acc.ave_6best.pth"
    params, cfg, arch = load_espnet_checkpoint(ckpt, CFG)
    assert arch["vocab_size"] == CFG.vocab_size
    assert arch["encoder_layers"] == CFG.encoder_layers
    assert arch["decoder_layers"] == CFG.decoder_layers
    assert arch["encoder_dim"] == CFG.encoder_dim

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(expected)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stats_roundtrip(model_dir):
    stats = find_stats(model_dir)
    assert stats is not None
    mean, std = load_normalization_stats(stats)
    assert mean.shape == (CFG.n_mels,)
    # sum/sum_square/count reduction must reproduce the sample moments.
    assert np.all(np.isfinite(mean)) and np.all(std > 0)
    assert abs(float(mean.mean()) - 1.0) < 0.3
    assert abs(float(std.mean()) - 2.0) < 0.3


def test_from_directory_end_to_end_decode(model_dir):
    """The full public path: directory → model (+yaml config +stats +token
    list) → streaming decode; must equal the in-memory-constructed model
    token-for-token."""
    from speechcatcher_tpu.models.decoder import decoder_pe_table
    from speechcatcher_tpu.models.encoder import encoder_pe_table
    from speechcatcher_tpu.ops.frontend import Frontend
    from speechcatcher_tpu.tokenizer import Tokenizer

    pytest.importorskip("speechcatcher")
    run = next((model_dir / "exp").glob("asr_train_*"))
    model = ASRModel.from_directory(run)
    assert model.cfg.vocab_size == CFG.vocab_size
    assert model.cfg.block_size == CFG.block_size

    # Same weights constructed in memory, same MVN stats.
    enc, dec, ctc = make_reference_modules(CFG, seed=11)
    params = reference_params_to_jax(enc, dec, ctc, CFG)
    mean, std = load_normalization_stats(find_stats(model_dir))
    ref_model = ASRModel(
        cfg=model.cfg,
        params=params,
        frontend=Frontend(
            n_fft=CFG.n_fft, hop_length=CFG.hop_length,
            win_length=CFG.win_length, n_mels=CFG.n_mels,
            mean=mean, std=std,
        ),
        tokenizer=Tokenizer.dummy(CFG.vocab_size),
        enc_pe=encoder_pe_table(model.cfg),
        dec_pe=decoder_pe_table(model.cfg),
    )

    rng = np.random.RandomState(3)
    t = np.arange(16000) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)
             + 0.05 * rng.randn(16000)).astype(np.float32)

    got = Speech2TextStreaming(model=model, beam_size=2).recognize(audio)
    want = Speech2TextStreaming(model=ref_model, beam_size=2).recognize(audio)
    assert [r[2] for r in got] == [r[2] for r in want]  # token ids


def test_find_checkpoint_priority(tmp_path):
    """valid.acc.best.pth outranks the averaged checkpoints, root outranks
    exp/ (reference speech2text_streaming.py:163-189 search order)."""
    exp = tmp_path / "exp" / "run1"
    exp.mkdir(parents=True)
    (exp / "valid.acc.ave_6best.pth").touch()
    assert find_checkpoint(tmp_path) == exp / "valid.acc.ave_6best.pth"
    (exp / "valid.acc.best.pth").touch()
    assert find_checkpoint(tmp_path) == exp / "valid.acc.best.pth"
    (tmp_path / "valid.acc.ave.pth").touch()
    assert find_checkpoint(tmp_path) == tmp_path / "valid.acc.ave.pth"
    (tmp_path / "valid.acc.best.pth").touch()
    assert find_checkpoint(tmp_path) == tmp_path / "valid.acc.best.pth"


# ---------------------------------------------------------------------------
# Tier B: real cached model (skips when absent, like the reference's tests)
# ---------------------------------------------------------------------------

def _real_model_dir():
    roots = [
        Path.home() / ".cache/espnet",
        Path.home() / ".cache/speechcatcher_tpu",
        Path(os.environ.get("SPEECHCATCHER_MODEL_DIR", "/nonexistent")),
    ]
    for root in roots:
        if not root.exists():
            continue
        for ckpt in sorted(root.glob("**/valid.acc.*.pth")):
            if ckpt.stat().st_size > 10_000_000:  # a real model, not a stub
                return ckpt.parent
    return None


@pytest.fixture(scope="module")
def real_model_dir():
    d = _real_model_dir()
    if d is None:
        pytest.skip("No real model found in cache")
    return d


def test_real_checkpoint_loads(real_model_dir):
    ckpt = find_checkpoint(real_model_dir)
    model = ASRModel.from_directory(real_model_dir)
    import jax

    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(model.params))
    assert n_params > 1_000_000, f"{ckpt}: suspiciously small ({n_params})"
    for leaf in jax.tree.leaves(model.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_real_audio_golden_wer(real_model_dir):
    """Decode a real recording and compare to its stored golden transcript
    (reference tests/test_end_to_end.py:17-21). Provide the pair via
    SPEECHCATCHER_GOLDEN=/path/to/audio.wav (16 kHz mono PCM wav or raw
    f32) with /path/to/audio.wav.txt next to it."""
    golden = os.environ.get("SPEECHCATCHER_GOLDEN")
    if not golden or not Path(golden).exists():
        pytest.skip("No golden audio/transcript pair provided")
    gold_text = Path(golden + ".txt").read_text().strip()

    from speechcatcher_tpu.utils.audio import read_wav
    from speechcatcher_tpu.wer import word_error_rate

    audio, rate = read_wav(Path(golden))
    model = ASRModel.from_directory(real_model_dir)
    assert rate == model.cfg.sample_rate
    s2t = Speech2TextStreaming(model=model, beam_size=5)
    results = s2t.recognize(audio)
    hyp = " ".join(r[0] for r in results).strip()
    wer = word_error_rate([gold_text], [hyp])["wer"]
    assert wer <= 0.15, f"WER {wer:.3f} vs golden:\n{gold_text}\n---\n{hyp}"


def test_real_audio_validate_zoo_fixture(real_model_dir):
    """Tier B via the validate_zoo fixtures: when the LibriVox recording
    (scripts/validate_zoo.py AUDIO_URL) is cached and a blessed fixture is
    committed, decode and gate WER drift — the exact check
    `python scripts/validate_zoo.py` runs on a connected machine (mirrors
    the reference CI smoke, .github/workflows/python-package-test.yml:27-33)."""
    repo = Path(__file__).resolve().parent.parent
    import sys

    sys.path.insert(0, str(repo / "scripts"))
    import validate_zoo

    tag = None
    for t in ("de_streaming_transformer_m", "de_streaming_transformer_l",
              "de_streaming_transformer_xl"):
        if validate_zoo.fixture_path(t).exists():
            tag = t
            break
    if tag is None:
        pytest.skip("No blessed validate_zoo fixture committed yet")
    cache_dir = Path("~/.cache/speechcatcher_tpu").expanduser()
    audio = cache_dir / "validate" / Path(validate_zoo.AUDIO_URL).name
    if not audio.exists():
        pytest.skip("LibriVox validation audio not cached "
                    "(run scripts/validate_zoo.py once with egress)")

    from speechcatcher_tpu.wer import word_error_rate

    hyp = validate_zoo.decode(tag, audio, cache_dir, beam_size=5)
    golden = validate_zoo.fixture_path(tag).read_text().strip()
    wer = word_error_rate([golden], [hyp])["wer"]
    assert wer <= 0.02, f"drift {wer:.3f} vs blessed fixture:\n{hyp}"
