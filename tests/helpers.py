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


# ---------------------------------------------------------------------------
# Flagship-dims golden tier (VERDICT r03 #7): the torch-parity tests above
# run at tiny_config; this builder reproduces the SERVING architecture
# (de_streaming_transformer_xl-class, d=512/18L/8H — __graft_entry__.py::
# _flagship_config) deterministically so a torch-golden decode blessed once
# (scripts/bless_flagship_golden.py) can be matched token-exactly in CI
# without rerunning the slow reference beam search.

FLAGSHIP_GOLDEN_SEED = 7
FLAGSHIP_GOLDEN_CHUNKS = 10      # feature chunks fed to process_block
FLAGSHIP_GOLDEN_CHUNK_T = 120    # frames per chunk (~1.2 s each)


def flagship_parity_config():
    from __graft_entry__ import _flagship_config

    # f32 caches: the golden tier pins exact token parity; reduced-precision
    # drift is bounded separately (tests/test_decoder.py bf16 test).
    return _flagship_config()


def make_flagship_parity_setup(seed: int = FLAGSHIP_GOLDEN_SEED,
                               eos_bias: float = 4.0,
                               blank_bias: float = 10.0):
    """(our_model, ref_model, chunks, finals) at flagship dims.

    The torch modules' EOS/blank logit biases are raised IN THE WEIGHTS
    (+4 on decoder output <sos/eos>, +10 on ctc_lo <blank>) before
    conversion, exactly like bench.py::_build_model: random weights never
    rank EOS otherwise, so every final would burst to the max_tokens step
    budget — a pathology real checkpoints don't have. Both sides decode
    the identical biased weights, so parity is unaffected. The audio-level
    engine golden (scripts/bless_engine_golden.py) passes different bias
    constants: real log-mel features of synth audio sit far from the N(0,1)
    feature stats this module's feature-level fixtures use, and the default
    biases make the empty hypothesis win outright (0-token golden)."""
    import types

    import torch

    import jax.numpy as jnp

    from speechcatcher_tpu.models.asr_model import ASRModel
    from speechcatcher_tpu.models.decoder import decoder_pe_table
    from speechcatcher_tpu.models.encoder import encoder_pe_table
    from speechcatcher_tpu.ops.frontend import Frontend
    from speechcatcher_tpu.tokenizer import Tokenizer

    cfg = flagship_parity_config()
    ref_enc, ref_dec, ref_ctc = make_reference_modules(cfg, seed=seed)
    with torch.no_grad():
        ref_dec.output_layer.bias[cfg.eos_id] += eos_bias
        ref_ctc.ctc_lo.bias[cfg.blank_id] += blank_bias
    params = reference_params_to_jax(ref_enc, ref_dec, ref_ctc, cfg)
    model = ASRModel(
        cfg=cfg,
        params=params,
        frontend=Frontend(n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                          win_length=cfg.win_length, n_mels=cfg.n_mels),
        tokenizer=Tokenizer.dummy(cfg.vocab_size),
        enc_pe=encoder_pe_table(cfg),
        dec_pe=decoder_pe_table(cfg),
    )
    ref_model = types.SimpleNamespace(
        encoder=ref_enc, decoder=ref_dec, ctc=ref_ctc,
        vocab_size=cfg.vocab_size,
    )
    rng = np.random.RandomState(seed)
    chunks = [rand_feats(rng, 1, FLAGSHIP_GOLDEN_CHUNK_T, cfg.n_mels)
              for _ in range(FLAGSHIP_GOLDEN_CHUNKS)]
    finals = [False] * (FLAGSHIP_GOLDEN_CHUNKS - 1) + [True]
    return model, ref_model, chunks, finals
