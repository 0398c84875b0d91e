"""Shared test utilities: build reference torch modules as golden references
and convert their random weights into our JAX pytrees (which also exercises
the checkpoint converter end-to-end)."""

from __future__ import annotations

import numpy as np

from speechcatcher_tpu.checkpoint import convert_state_dict
from speechcatcher_tpu.config import ModelConfig


def make_reference_modules(cfg: ModelConfig, seed: int = 0):
    """Instantiate the reference encoder/decoder/ctc (torch, eval mode)."""
    import torch

    from speechcatcher.model.encoder.contextual_block_transformer_encoder import (
        ContextualBlockTransformerEncoder,
    )
    from speechcatcher.model.decoder.transformer_decoder import TransformerDecoder
    from speechcatcher.model.ctc import CTC

    torch.manual_seed(seed)
    encoder = ContextualBlockTransformerEncoder(
        input_size=cfg.n_mels,
        output_size=cfg.encoder_dim,
        attention_heads=cfg.encoder_heads,
        linear_units=cfg.encoder_linear_units,
        num_blocks=cfg.encoder_layers,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        input_layer=cfg.input_layer,
        block_size=cfg.block_size,
        hop_size=cfg.hop_size,
        look_ahead=cfg.look_ahead,
    )
    decoder = TransformerDecoder(
        vocab_size=cfg.vocab_size,
        encoder_output_size=cfg.encoder_dim,
        attention_heads=cfg.decoder_heads,
        linear_units=cfg.decoder_linear_units,
        num_blocks=cfg.decoder_layers,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(vocab_size=cfg.vocab_size, encoder_output_size=cfg.encoder_dim)
    encoder.eval()
    decoder.eval()
    ctc.eval()

    # The reference StreamPositionalEncoding keeps a hidden position counter
    # that advances whenever forward() is called without an explicit offset
    # (positional_encoding.py:150-166). forward_train and the short-segment
    # infer path rely on it, which makes repeated calls non-deterministic.
    # Our implementation always uses explicit offsets (0 there); pin the
    # reference to the same semantics for apples-to-apples comparison.
    orig_forward = encoder.pos_enc.forward

    def deterministic_forward(x, offset=None):
        return orig_forward(x, 0 if offset is None else offset)

    encoder.pos_enc.forward = deterministic_forward
    return encoder, decoder, ctc


def reference_params_to_jax(encoder, decoder, ctc, cfg: ModelConfig):
    """torch modules → prefixed state_dict → our converter → JAX pytree."""
    sd = {}
    for prefix, module in (("encoder.", encoder), ("decoder.", decoder),
                           ("ctc.", ctc)):
        for k, v in module.state_dict().items():
            sd[prefix + k] = v.detach().cpu().numpy()
    return convert_state_dict(sd, cfg)


def rand_feats(rng: np.random.RandomState, b: int, t: int, f: int) -> np.ndarray:
    return rng.randn(b, t, f).astype(np.float32)
