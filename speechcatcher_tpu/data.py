"""Training data pipeline: datasets, bucketed static-shape batching,
on-device featurization.

The reference has no trainer (models come from ESPnet training runs —
/root/reference/README.md:238-244), so this module has no reference
counterpart; it turns training.py from a smoke harness into a usable
loop. The design is TPU-first:

- Every batch is padded to one of a FIXED, small set of
  (wave-samples, target-tokens) bucket shapes, so the featurizer and the
  jitted train step compile once per bucket and never see a dynamic
  shape (XLA retraces per shape; unbounded shapes = unbounded compiles).
- Features are computed on device through ops/frontend.py's fused
  STFT → mel → log → MVN program, batched over the whole bucket — not
  per-utterance on host.
- Buckets grow geometrically, so padding waste is bounded (< 2x) while
  the number of distinct compiled programs stays logarithmic in the
  length range.

Data sources: Kaldi-style directories (wav.scp + text — the same format
decode_kaldidir.py consumes, reference decode_kaldidir.py:17-41) and a
synthetic dataset for CI/smoke runs.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.ops.frontend import Frontend
from speechcatcher_tpu.tokenizer import Tokenizer

logger = logging.getLogger(__name__)


class Utterance(NamedTuple):
    uttid: str
    wave: np.ndarray  # float32 in [-1, 1] at cfg.sample_rate
    text: str


def read_kaldi_dir(data_dir: Path, limit: Optional[int] = None
                   ) -> List[Utterance]:
    """Load a Kaldi-style data dir (wav.scp + text) into memory.

    Reuses decode_kaldidir's wav.scp semantics (plain paths and
    trailing-pipe commands); utterances missing from either file are
    skipped with a log line rather than an error, matching how Kaldi
    tooling treats ragged dirs.
    """
    from speechcatcher_tpu.decode_kaldidir import load_entry, read_wav_scp
    from speechcatcher_tpu.wer import read_kaldi_text

    data_dir = Path(data_dir)
    texts = read_kaldi_text(str(data_dir / "text"))
    utts: List[Utterance] = []
    for uttid, spec in read_wav_scp(data_dir / "wav.scp"):
        if uttid not in texts:
            logger.warning("No transcript for %s; skipped", uttid)
            continue
        pcm, rate = load_entry(spec)
        wave = pcm.astype(np.float32) / 32768.0
        utts.append(Utterance(uttid, wave, texts[uttid]))
        if limit is not None and len(utts) >= limit:
            break
    return utts


def synthetic_dataset(n_utts: int, cfg: ModelConfig, tokenizer: Tokenizer,
                      seed: int = 0, min_sec: float = 0.5,
                      max_sec: float = 4.0) -> List[Utterance]:
    """Deterministic random utterances whose texts round-trip through
    tokenizer.text_to_ids — the CI/smoke stand-in for a corpus."""
    rng = np.random.RandomState(seed)
    words = [p.lstrip("▁") for p in tokenizer.token_list[2:-1]
             if p.startswith("▁") and len(p) > 1]
    if not words:
        words = ["t0", "t1", "t2"]
    utts = []
    for i in range(n_utts):
        n_samp = int(cfg.sample_rate
                     * rng.uniform(min_sec, max_sec))
        wave = (rng.randn(n_samp) * 0.1).astype(np.float32)
        text = " ".join(rng.choice(words, size=rng.randint(2, 9)))
        utts.append(Utterance(f"synth{i:05d}", wave, text))
    return utts


def train_eval_split(utts: Sequence[Utterance], eval_frac: float = 0.1,
                     seed: int = 0
                     ) -> Tuple[List[Utterance], List[Utterance]]:
    order = np.random.RandomState(seed).permutation(len(utts))
    n_eval = max(1, int(len(utts) * eval_frac)) if eval_frac > 0 else 0
    eval_idx = set(order[:n_eval].tolist())
    train = [u for i, u in enumerate(utts) if i not in eval_idx]
    evals = [u for i, u in enumerate(utts) if i in eval_idx]
    return train, evals


def _bucket_for(value: int, buckets: Sequence[int]) -> Optional[int]:
    for b in buckets:
        if value <= b:
            return b
    return None


class BucketBatcher:
    """Groups utterances into fixed-shape, feature-ready TrainBatches.

    Each yielded batch has waves padded to a sample bucket and targets
    padded to a token bucket; the cartesian set of bucket pairs bounds
    the number of distinct compiled programs downstream. Utterances that
    exceed the largest bucket on either axis are dropped loudly (no
    silent truncation — a truncated target corrupts the CTC loss).
    """

    def __init__(
        self,
        frontend: Frontend,
        tokenizer: Tokenizer,
        batch_size: int = 8,
        sample_buckets: Optional[Sequence[int]] = None,
        token_buckets: Sequence[int] = (16, 32, 64, 128),
        sample_rate: int = 16000,
        input_layer: str = "conv2d",
    ):
        if sample_buckets is None:
            # 2s..32s geometric — covers segmented ASR utterances.
            sample_buckets = [sample_rate * s for s in (2, 4, 8, 16, 32)]
        self.frontend = frontend
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.sample_buckets = sorted(sample_buckets)
        self.token_buckets = sorted(token_buckets)
        self.input_layer = input_layer
        self._featurize = jax.jit(lambda w: frontend(w))
        self.n_dropped = 0

    def _subsampled_frames(self, n_samples: int) -> int:
        """Encoder frame count after the model's conv subsampling — the
        same kernel/stride walk encoder_forward_train applies to ilens."""
        from speechcatcher_tpu.models.encoder import _CONV_SPECS

        n = self.frontend.n_frames(n_samples)
        if self.input_layer == "linear":
            return n
        for k, s in zip(*_CONV_SPECS[self.input_layer]):
            n = (n - k) // s + 1
        return n

    def _encode_targets(self, utt: Utterance) -> Optional[List[int]]:
        ids = self.tokenizer.text_to_ids(utt.text)
        # CTC needs enough subsampled frames to emit every (possibly
        # repeated) label with blanks: 2U+1 is the hard bound.
        if not ids or 2 * len(ids) + 1 > self._subsampled_frames(
            len(utt.wave)
        ):
            return None
        return ids

    def batches(self, utts: Sequence[Utterance], shuffle_seed: Optional[int]
                = None, with_refs: bool = False) -> Iterator:
        """Yield TrainBatch (or (TrainBatch, ref_texts) when with_refs).

        Groups by (sample_bucket, token_bucket); partial groups flush at
        the end of the pass, padded by repeating their last row so the
        batch shape stays static (repeated rows carry real loss signal
        and merely reweight those utterances slightly)."""
        from speechcatcher_tpu.training import TrainBatch

        order = list(range(len(utts)))
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(order)

        groups: dict = {}
        for idx in order:
            utt = utts[idx]
            ids = self._encode_targets(utt)
            sb = _bucket_for(len(utt.wave), self.sample_buckets)
            tb = _bucket_for(len(ids), self.token_buckets) if ids else None
            if ids is None or sb is None or tb is None:
                self.n_dropped += 1
                logger.warning(
                    "Dropped %s (%.1fs, %s tokens): exceeds buckets or "
                    "too short for its targets", utt.uttid,
                    len(utt.wave) / 16000.0, ids and len(ids))
                continue
            groups.setdefault((sb, tb), []).append((utt, ids))
            if len(groups[(sb, tb)]) == self.batch_size:
                yield self._emit(groups.pop((sb, tb)), sb, tb, TrainBatch,
                                 with_refs)
        for (sb, tb), group in sorted(groups.items()):
            n_real = len(group)
            while len(group) < self.batch_size:  # static-shape flush pad
                group.append(group[-1])
            yield self._emit(group, sb, tb, TrainBatch, with_refs, n_real)

    def _emit(self, group, sb: int, tb: int, TrainBatch, with_refs: bool,
              n_real: Optional[int] = None):
        b = len(group)
        waves = np.zeros((b, sb), np.float32)
        tokens = np.zeros((b, tb), np.int32)
        feat_lens = np.zeros((b,), np.int32)
        token_lens = np.zeros((b,), np.int32)
        for i, (utt, ids) in enumerate(group):
            waves[i, : len(utt.wave)] = utt.wave
            tokens[i, : len(ids)] = ids
            feat_lens[i] = self.frontend.n_frames(len(utt.wave))
            token_lens[i] = len(ids)
        feats = self._featurize(jnp.asarray(waves))
        batch = TrainBatch(
            feats=feats,
            feat_lens=jnp.asarray(feat_lens),
            tokens=jnp.asarray(tokens),
            token_lens=jnp.asarray(token_lens),
        )
        if with_refs:
            # Flush pads repeat the LAST row; trimming refs to the real
            # rows keeps eval WER from double-counting those utterances
            # (evaluate() slices hyps to len(refs) to stay aligned).
            return batch, [utt.text for utt, _ in group[: n_real or b]]
        return batch
