"""Model/architecture configuration.

One dataclass holds every architecture constant the framework needs. Values
come from the ESPnet ``config.yaml`` inside a model directory, from shape
inference on a checkpoint, or from explicit construction in tests.

The reference hardcodes block/hop/look_ahead = 40/16/16
(/root/reference/speechcatcher/model/encoder/contextual_block_transformer_encoder.py:69-71)
and only the external espnet path reads them from config
(/root/reference/speechcatcher/asr_inference_streaming.py:113-116). Here they
are always config-driven, with the published-zoo values as defaults.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Complete architecture description of one streaming ASR model."""

    # Vocabulary (ESPnet layout: [<blank>, <unk>=sp0, sp3.., <sos/eos>]).
    vocab_size: int = 1024
    blank_id: int = 0
    # sos = eos = vocab_size - 1 (reference beam_search.py:908-913).

    # Frontend (reference model/frontend/stft_frontend.py:40-64).
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    n_mels: int = 80

    # Encoder (reference contextual_block_transformer_encoder.py:54-74).
    encoder_dim: int = 256
    encoder_heads: int = 4
    encoder_linear_units: int = 2048
    encoder_layers: int = 12
    input_layer: str = "conv2d"  # conv2d | conv2d6 | conv2d8 | linear
    normalize_before: bool = True
    block_size: int = 40
    hop_size: int = 16
    look_ahead: int = 16
    init_average: bool = True
    ctx_pos_enc: bool = True
    pos_enc_max_len: int = 5000
    encoder_type: str = "transformer"  # transformer | conformer

    # Conformer extras (reference model/layers/convolution.py:16-120).
    conformer_kernel_size: int = 31

    # Decoder (reference model/decoder/transformer_decoder.py:85-152).
    decoder_dim: int = 256  # == encoder_dim for the zoo models
    decoder_heads: int = 4
    decoder_linear_units: int = 2048
    decoder_layers: int = 6

    # Joint scoring (reference speechcatcher.py:221, beam_search.py:76).
    ctc_weight: float = 0.3
    pre_beam_size: int = 40

    # Streaming capacity limits (compile-time shapes for device state).
    max_enc_frames: int = 2048   # encoder-output ring capacity (~82 s audio)
    max_tokens: int = 500        # matches reference max_length beam_search.py:49

    # Attention KV-cache storage dtype ("float32" | "bfloat16"). bf16 halves
    # the dominant HBM footprint/traffic of serving (decoder self/cross KV);
    # matmuls still accumulate in fp32 on the MXU. CTC state stays fp32.
    cache_dtype: str = "float32"

    # CTC log-prob ring storage dtype ("float32" | "bfloat16"). The ring is
    # the largest per-stream buffer after the KV caches ((V, Tcap) ≈ 3.1 MB
    # fp32 at the flagship serving config) and every beam step streams
    # candidate rows out of it; bf16 halves both. Scores, forward variables
    # and every reduction stay fp32 — consumers upcast at the gather.
    ctc_ring_dtype: str = "float32"

    # Emitted-encoder-frame ring storage dtype ("float32" | "bfloat16").
    # The serving engine's enc_out ring is BOTH the CTC head's input and
    # the decoder's cross-attention memory (rematerialized per beam step,
    # models/decoder.py) — bf16 halves its footprint AND the per-step raw-
    # frame reads of the rematerialization. The CTC log-softmax upcasts to
    # fp32 before normalizing; attention projections already run bf16.
    enc_ring_dtype: str = "float32"

    @property
    def cache_jnp_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.cache_dtype
        ]

    @property
    def ctc_ring_jnp_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.ctc_ring_dtype
        ]

    @property
    def enc_ring_jnp_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.enc_ring_dtype
        ]

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def subsample(self) -> int:
        return {"conv2d": 4, "conv2d6": 6, "conv2d8": 8, "linear": 1}[
            self.input_layer
        ]

    @property
    def head_dim(self) -> int:
        return self.encoder_dim // self.encoder_heads

    @classmethod
    def from_yaml(cls, config_path: Path, vocab_size: Optional[int] = None,
                  **overrides: Any) -> "ModelConfig":
        """Build from an ESPnet config.yaml (reference speech2text_streaming.py:209-232)."""
        import yaml

        with open(config_path) as f:
            cfg = yaml.safe_load(f) or {}
        return cls.from_espnet_dict(cfg, vocab_size=vocab_size, **overrides)

    @classmethod
    def from_espnet_dict(cls, cfg: Dict[str, Any],
                         vocab_size: Optional[int] = None,
                         **overrides: Any) -> "ModelConfig":
        enc = cfg.get("encoder_conf", {}) or {}
        dec = cfg.get("decoder_conf", {}) or {}
        fr = cfg.get("frontend_conf", {}) or {}
        if vocab_size is None:
            token_list = cfg.get("token_list")
            vocab_size = len(token_list) if token_list else 1024
        encoder_type = cfg.get("encoder", "contextual_block_transformer")
        kwargs: Dict[str, Any] = dict(
            vocab_size=vocab_size,
            n_fft=fr.get("n_fft", 512),
            hop_length=fr.get("hop_length", 160),
            win_length=fr.get("win_length", 400) or fr.get("n_fft", 512),
            encoder_dim=enc.get("output_size", 256),
            encoder_heads=enc.get("attention_heads", 4),
            encoder_linear_units=enc.get("linear_units", 2048),
            encoder_layers=enc.get("num_blocks", 12),
            input_layer=enc.get("input_layer", "conv2d"),
            block_size=enc.get("block_size", 40),
            hop_size=enc.get("hop_size", 16),
            look_ahead=enc.get("look_ahead", 16),
            init_average=enc.get("init_average", True),
            ctx_pos_enc=enc.get("ctx_pos_enc", True),
            encoder_type=(
                "conformer" if "conformer" in str(encoder_type) else "transformer"
            ),
            decoder_dim=enc.get("output_size", 256),
            decoder_heads=dec.get("attention_heads", 4),
            decoder_linear_units=dec.get("linear_units", 2048),
            decoder_layers=dec.get("num_blocks", 6),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(**overrides: Any) -> ModelConfig:
    """A miniature config for fast unit tests (CI needs no model download)."""
    kwargs: Dict[str, Any] = dict(
        vocab_size=32,
        encoder_dim=16,
        encoder_heads=2,
        encoder_linear_units=32,
        encoder_layers=2,
        decoder_dim=16,
        decoder_heads=2,
        decoder_linear_units=32,
        decoder_layers=2,
        block_size=8,
        hop_size=4,
        look_ahead=2,
        max_enc_frames=256,
        max_tokens=160,
    )
    kwargs.update(overrides)
    return ModelConfig(**kwargs)
