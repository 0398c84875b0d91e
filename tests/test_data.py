"""Training data pipeline tests: tokenization, bucketing, eval loop.

The reference has no trainer/dataloader (models come from ESPnet runs,
/root/reference/README.md:238-244); these tests cover the TPU-first
pipeline that data.py adds on top of that capability surface —
static-shape bucket batching, greedy BPE encoding, and the held-out
eval loop with greedy-CTC WER.
"""

import numpy as np
import pytest

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.data import (
    BucketBatcher,
    synthetic_dataset,
    train_eval_split,
    Utterance,
)
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.tokenizer import Tokenizer
from speechcatcher_tpu.training import evaluate, warmup_lr_schedule

CFG = tiny_config(n_mels=20)


@pytest.fixture(scope="module")
def model():
    return ASRModel.random_init(CFG, seed=0)


def test_text_to_ids_roundtrip():
    tok = Tokenizer.dummy(CFG.vocab_size)
    text = "t0 t3 t1 t0"
    ids = tok.text_to_ids(text)
    assert ids, "dummy vocabulary covers its own word pieces"
    assert tok.unk_id not in ids
    assert tok.ids_to_text(ids) == text


def test_text_to_ids_unknown_chars_map_to_unk():
    tok = Tokenizer.dummy(CFG.vocab_size)
    ids = tok.text_to_ids("@@@")
    assert ids and all(i == tok.unk_id for i in ids)


def test_bucket_batcher_static_shapes(model):
    utts = synthetic_dataset(20, CFG, model.tokenizer, seed=1)
    batcher = BucketBatcher(model.frontend, model.tokenizer, batch_size=4)
    sample_buckets = set(batcher.sample_buckets)
    token_buckets = set(batcher.token_buckets)
    seen = 0
    for batch in batcher.batches(utts):
        b, t, f = batch.feats.shape
        assert b == 4 and f == CFG.n_mels
        # T derives from one of the sample buckets.
        assert t in {model.frontend.n_frames(s) for s in sample_buckets}
        assert batch.tokens.shape[1] in token_buckets
        assert int(batch.token_lens.max()) <= batch.tokens.shape[1]
        assert int(batch.feat_lens.max()) <= t
        seen += b
    assert seen + batcher.n_dropped >= 20  # flush pads may repeat rows


def test_bucket_batcher_drops_oversized(model):
    too_long = Utterance(
        "long0", np.zeros(CFG.sample_rate * 64, np.float32), "t0 t1"
    )
    batcher = BucketBatcher(model.frontend, model.tokenizer, batch_size=1)
    batches = list(batcher.batches([too_long]))
    assert not batches and batcher.n_dropped == 1


def test_bucket_batcher_drops_untrainable_ctc(model):
    # 2U+1 > subsampled frames: a long transcript over a tiny clip.
    text = " ".join(["t0"] * 40)
    short = Utterance(
        "short0", np.zeros(int(CFG.sample_rate * 0.2), np.float32), text
    )
    batcher = BucketBatcher(model.frontend, model.tokenizer, batch_size=1)
    assert not list(batcher.batches([short]))
    assert batcher.n_dropped == 1


def test_ctc_guard_tracks_subsampling_variant(model):
    # The 2U+1 CTC bound must use the MODEL's subsampling (conv2d8 keeps
    # ~half the frames conv2d does), not a hard-coded 4x: a transcript
    # trainable under conv2d can be impossible under conv2d8.
    b4 = BucketBatcher(model.frontend, model.tokenizer, batch_size=1,
                       input_layer="conv2d")
    b8 = BucketBatcher(model.frontend, model.tokenizer, batch_size=1,
                       input_layer="conv2d8")
    n_samp = CFG.sample_rate  # 1 s
    f4, f8 = b4._subsampled_frames(n_samp), b8._subsampled_frames(n_samp)
    assert f8 < f4
    n_tok = (f4 - 1) // 2  # fits under conv2d, not under conv2d8
    assert 2 * n_tok + 1 <= f4 and 2 * n_tok + 1 > f8
    utt = Utterance("u0", np.zeros(n_samp, np.float32),
                    " ".join(["t0"] * n_tok))
    assert list(b4.batches([utt])) and b4.n_dropped == 0
    assert not list(b8.batches([utt])) and b8.n_dropped == 1


def test_shuffle_is_deterministic(model):
    utts = synthetic_dataset(12, CFG, model.tokenizer, seed=2)
    def first_lens(seed):
        batcher = BucketBatcher(model.frontend, model.tokenizer, batch_size=4)
        return [tuple(np.asarray(b.token_lens)) for b in
                batcher.batches(utts, shuffle_seed=seed)]
    assert first_lens(7) == first_lens(7)


def test_train_eval_split_partitions():
    utts = synthetic_dataset(10, CFG, Tokenizer.dummy(CFG.vocab_size))
    train, evals = train_eval_split(utts, eval_frac=0.2, seed=3)
    assert len(train) + len(evals) == 10 and len(evals) == 2
    ids = {u.uttid for u in train} | {u.uttid for u in evals}
    assert len(ids) == 10


def test_warmup_lr_schedule_shape():
    sched = warmup_lr_schedule(peak_lr=1e-3, warmup_steps=100)
    lrs = [float(sched(np.int32(s))) for s in (1, 50, 100, 400)]
    assert lrs[0] < lrs[1] < lrs[2]            # linear ramp
    assert abs(lrs[2] - 1e-3) < 1e-9            # peak at warmup_steps
    assert abs(lrs[3] - 1e-3 * 0.5) < 1e-9      # inverse-sqrt decay (4x -> /2)


def test_evaluate_reports_losses_and_wer(model):
    utts = synthetic_dataset(8, CFG, model.tokenizer, seed=4)
    batcher = BucketBatcher(model.frontend, model.tokenizer, batch_size=4)
    m = evaluate(model.params, CFG,
                 batcher.batches(utts, with_refs=True), model.tokenizer)
    for k in ("loss", "ctc", "att", "wer", "cer"):
        assert k in m and np.isfinite(m[k]), (k, m)
    assert m["wer"] > 0  # random weights can't transcribe synthetics
