"""ASR model assembly: frontend + encoder + decoder + CTC.

Functional counterpart of /root/reference/speechcatcher/model/espnet_asr_model.py:
a parameter pytree plus a ModelConfig, with factories for random init
(tests/benchmarks) and for loading a real ESPnet model directory.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.ops.frontend import Frontend
from speechcatcher_tpu.models.encoder import (
    encoder_pe_table,
    init_encoder_params,
)
from speechcatcher_tpu.models.decoder import decoder_pe_table, init_decoder_params
from speechcatcher_tpu.models.ctc import init_ctc_params
from speechcatcher_tpu.tokenizer import Tokenizer, find_bpe_model

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ASRModel:
    """Bundle of everything a decoding session needs."""

    cfg: ModelConfig
    params: Dict[str, Any]          # {"encoder", "decoder", "ctc"}
    frontend: Frontend
    tokenizer: Tokenizer
    enc_pe: jnp.ndarray
    dec_pe: jnp.ndarray

    @classmethod
    def random_init(
        cls, cfg: ModelConfig, seed: int = 0,
        mean: Optional[np.ndarray] = None, std: Optional[np.ndarray] = None,
    ) -> "ASRModel":
        """Random-weight model (deterministic synthetic fixture for CI)."""
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": init_encoder_params(k1, cfg),
            "decoder": init_decoder_params(k2, cfg),
            "ctc": init_ctc_params(k3, cfg),
        }
        frontend = Frontend(
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            n_mels=cfg.n_mels,
            sample_rate=cfg.sample_rate,
            mean=mean,
            std=std,
        )
        return cls(
            cfg=cfg,
            params=params,
            frontend=frontend,
            tokenizer=Tokenizer.dummy(cfg.vocab_size),
            enc_pe=encoder_pe_table(cfg),
            dec_pe=decoder_pe_table(cfg),
        )

    @classmethod
    def from_directory(cls, model_dir: Path) -> "ASRModel":
        """Load an unpacked ESPnet model directory
        (config.yaml + *.pth + feats_stats.npz + bpe.model)."""
        from speechcatcher_tpu.checkpoint import (
            find_checkpoint,
            find_stats,
            load_espnet_checkpoint,
            load_normalization_stats,
        )

        model_dir = Path(model_dir)
        cfg = None
        config_path = model_dir / "config.yaml"
        if config_path.exists():
            cfg = ModelConfig.from_yaml(config_path)
        ckpt = find_checkpoint(model_dir)
        if ckpt is None:
            raise FileNotFoundError(f"No checkpoint found in {model_dir}")
        params, cfg, arch = load_espnet_checkpoint(ckpt, cfg)
        logger.info("Loaded %s with arch %s", ckpt, arch)

        mean = std = None
        stats_path = find_stats(model_dir)
        if stats_path is not None:
            mean, std = load_normalization_stats(stats_path)

        bpe_path = find_bpe_model(model_dir)
        if bpe_path is not None:
            tokenizer = Tokenizer.from_sentencepiece(bpe_path)
        else:
            logger.warning("No bpe.model found in %s; using dummy tokenizer",
                           model_dir)
            tokenizer = Tokenizer.dummy(cfg.vocab_size)

        frontend = Frontend(
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            n_mels=cfg.n_mels,
            sample_rate=cfg.sample_rate,
            mean=mean,
            std=std,
        )
        return cls(
            cfg=cfg,
            params=params,
            frontend=frontend,
            tokenizer=tokenizer,
            enc_pe=encoder_pe_table(cfg),
            dec_pe=decoder_pe_table(cfg),
        )
