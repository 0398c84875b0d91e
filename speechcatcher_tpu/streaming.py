"""Speech2TextStreaming — the public streaming session API.

Drop-in behavioral counterpart of the reference
/root/reference/speechcatcher/speech2text_streaming.py (itself mirroring
ESPnet's asr_inference_streaming entry point): raw-PCM chunks in,
(text, tokens, token_ids, token_pos) tuples out, with waveform buffering,
STFT-boundary frame trimming, streaming partials, and reset between
utterances.

TPU differences: the frontend/MVN run fused on device (the reference bounced
features through CPU numpy per chunk, speech2text_streaming.py:356-358), and
all beam/CTC state is device-resident.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.decode.beam_search import BlockwiseSynchronousBeamSearch
from speechcatcher_tpu.models.asr_model import ASRModel

Result = Tuple[str, List[str], List[int], List[int]]


def assemble_hypothesis(cfg, tokenizer, yseq, xpos, is_final: bool
                        ) -> List[Result]:
    """Best-hypothesis output assembly (assemble_hyps semantics: strip SOS +
    trailing EOS or unstable last token, drop blanks, detokenize). Shared by
    the single-stream session and the batched engine so file/segment decode
    produces byte-identical text either way."""
    if len(yseq) <= 1:
        return []
    if is_final:
        token_ids = yseq[1:]
        pos = xpos[1:]
        if len(token_ids) > 0 and token_ids[-1] == cfg.eos_id:
            token_ids = token_ids[:-1]
            pos = pos[:-1]
    else:
        # Streaming partial: drop the last (unstable) token like the
        # espnet assemble path (yseq[1:-1]).
        token_ids = yseq[1:-1]
        pos = xpos[1:-1]

    # Strip <blank>, <unk>, <sos/eos> (reference :513-518).
    drop = {cfg.blank_id, tokenizer.unk_id, cfg.eos_id}
    keep = [i for i, tid in enumerate(token_ids) if int(tid) not in drop]
    token_ids = [int(token_ids[i]) for i in keep]
    token_pos = [int(pos[i]) for i in keep]
    tokens = tokenizer.ids_to_tokens(token_ids)
    text = "".join(tokens).replace("▁", " ").strip()
    return [(text, tokens, token_ids, token_pos)]


class Speech2TextStreaming:
    """Streaming recognition session over one model.

    Args mirror the reference (speech2text_streaming.py:43-57):
        model_dir: unpacked ESPnet model directory (or pass `model=`)
        beam_size, ctc_weight, use_bbd: decode configuration
    """

    def __init__(
        self,
        model_dir: Optional[Union[str, Path]] = None,
        beam_size: int = 5,
        ctc_weight: float = 0.3,
        device: str = "tpu",          # accepted for API compat; JAX picks
        dtype: str = "float32",       # accepted for API compat
        use_bbd: bool = True,
        model: Optional[ASRModel] = None,
        penalty: float = 0.0,
        coverage_weight: float = 0.0,
    ):
        if model is None:
            if model_dir is None:
                raise ValueError("need model_dir or model")
            model = ASRModel.from_directory(Path(model_dir))
        if dtype in ("float16", "bfloat16", "int8", "int8-all"):
            # Mixed precision: bf16 matmul weights + bf16 KV caches (bf16 is
            # the TPU-native reduced precision; fp16 requests map to it).
            # "int8" additionally quantizes the encoder linear weights to
            # symmetric per-channel int8 (weight-only; see
            # ops/layers.py::quantize_params_int8); "int8-all" extends that
            # to every eligible linear (decoder/CTC too — the drain beam
            # steps re-read all decoder weights, so at small batches the
            # weight-bound GEMMs halve their HBM traffic).
            from speechcatcher_tpu.ops.layers import (
                cast_params,
                quantize_params_int8,
            )

            model.params = cast_params(model.params)
            model.cfg = model.cfg.replace(cache_dtype="bfloat16")
            if dtype == "int8":
                model.params = quantize_params_int8(model.params)
            elif dtype == "int8-all":
                model.params = quantize_params_int8(model.params, scope=None)
        self.model = model
        self.cfg = model.cfg
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.use_bbd = use_bbd
        self.tokenizer = model.tokenizer

        self.win_length = self.cfg.win_length
        self.hop_length = self.cfg.hop_length

        self.beam_search = BlockwiseSynchronousBeamSearch(
            model,
            beam_size=beam_size,
            ctc_weight=ctc_weight,
            use_bbd=use_bbd,
            penalty=penalty,
            coverage_weight=coverage_weight,
        )
        self.reset()

    # ------------------------------------------------------------------
    def reset(self):
        """Reset all streaming state (reference :252-263)."""
        self.frontend_states: Optional[Dict] = None
        self.beam_search.reset()

    # ------------------------------------------------------------------
    def apply_frontend(
        self,
        speech: np.ndarray,
        prev_states: Optional[Dict],
        is_final: bool,
    ) -> Tuple[Optional[jnp.ndarray], Optional[Dict]]:
        """Waveform buffering + feature extraction + boundary trimming
        (reference :278-400 / asr_inference_streaming.py:205-292).

        speech: (samples,) float32. Returns (feats (1, T, n_mels) | None,
        next_states).
        """
        if prev_states is not None and "waveform_buffer" in prev_states:
            speech = np.concatenate([prev_states["waveform_buffer"], speech])

        if speech.shape[0] <= self.win_length:
            if is_final:
                pad = np.zeros(
                    self.win_length - speech.shape[0], dtype=speech.dtype
                )
                speech = np.concatenate([speech, pad])
            else:
                return None, {"waveform_buffer": speech.copy()}

        if is_final:
            speech_to_process = speech
            waveform_buffer = None
        else:
            overlap = self.win_length - self.hop_length
            n_frames = (speech.shape[0] - overlap) // self.hop_length
            n_residual = (speech.shape[0] - overlap) % self.hop_length
            speech_to_process = speech[: overlap + n_frames * self.hop_length]
            waveform_buffer = speech[
                speech.shape[0] - overlap - n_residual :
            ].copy()

        feats = self.model.frontend(jnp.asarray(speech_to_process))

        # Boundary trimming (reference :360-389).
        trim = math.ceil(math.ceil(self.win_length / self.hop_length) / 2)
        t = feats.shape[1]
        if is_final:
            if prev_states is not None and t > trim:
                feats = feats[:, trim:, :]
        else:
            if prev_states is None:
                if t > trim:
                    feats = feats[:, : t - trim, :]
            else:
                if t > 2 * trim:
                    feats = feats[:, trim : t - trim, :]
                else:
                    next_states = (
                        {"waveform_buffer": waveform_buffer}
                        if waveform_buffer is not None
                        else None
                    )
                    return None, next_states

        next_states = None if is_final else {"waveform_buffer": waveform_buffer}
        return feats, next_states

    # ------------------------------------------------------------------
    def __call__(
        self,
        speech: Union[np.ndarray, jnp.ndarray],
        is_final: bool = False,
        finalize_all: bool = True,
        always_assemble_hyps: bool = True,
    ) -> List[Result]:
        """Process one chunk (reference :402-539).

        Raw audio (samples,) or features (T, n_mels) in; list of
        (text, tokens, token_ids, token_pos) out — token_pos are encoder
        frame indices per token (xpos), the espnet path's 5-tuple timestamp
        convention (asr_inference_streaming.py:341-364) minus the hyp object.
        """
        speech = np.asarray(speech, dtype=np.float32)

        if speech.ndim == 1:
            feats, self.frontend_states = self.apply_frontend(
                speech, self.frontend_states, is_final
            )
            if feats is None:
                return []
        elif speech.ndim == 2:
            feats = self.model.frontend.normalize_only(jnp.asarray(speech))
        else:
            feats = jnp.asarray(speech)

        self.beam_search.process_block(feats, is_final=is_final)

        if not always_assemble_hyps and not is_final:
            return []
        results = self._assemble(is_final=is_final, finalize_all=finalize_all)
        if is_final:
            self.reset()
        return results

    # ------------------------------------------------------------------
    def _assemble(self, is_final: bool, finalize_all: bool = True
                  ) -> List[Result]:
        """Best-hypothesis output (assemble_hyps semantics:
        strip SOS + trailing/unstable last token, drop blanks, detokenize).

        finalize_all=False on a final chunk emits only hypotheses that
        reached EOS (reference speech2text_streaming.py:469-481: segment
        finals withhold incomplete hypotheses unless this is the very last
        chunk of the audio)."""
        yseq, xpos, score = self.beam_search.best_hypothesis()
        if len(yseq) <= 1:
            return []
        if is_final and not finalize_all and int(yseq[-1]) != self.cfg.eos_id:
            return []
        return assemble_hypothesis(self.cfg, self.tokenizer, yseq, xpos,
                                   is_final=is_final)

    # ------------------------------------------------------------------
    def recognize(self, speech) -> List[Result]:
        """Whole-utterance recognition (reference :541-557)."""
        self.reset()
        return self(speech, is_final=True)

    def recognize_stream(self, chunks) -> List[Result]:
        """Multi-chunk recognition (reference :559-579). Accepts any
        iterable (generators included)."""
        self.reset()
        chunks = list(chunks)
        results: List[Result] = []
        for i, chunk in enumerate(chunks):
            results = self(chunk, is_final=(i == len(chunks) - 1))
        return results

    @property
    def n_best_hypotheses(self) -> int:
        return self.beam_size


def create_streaming_interface(
    model_dir: Union[str, Path],
    beam_size: int = 5,
    ctc_weight: float = 0.3,
    device: str = "tpu",
) -> Speech2TextStreaming:
    """Factory (reference :599-621)."""
    return Speech2TextStreaming(
        model_dir=model_dir,
        beam_size=beam_size,
        ctc_weight=ctc_weight,
        device=device,
    )
