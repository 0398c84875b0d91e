"""Joint CTC + attention training step, shardable over a device mesh.

The reference computes this loss but has no optimizer/trainer (models are
trained externally with ESPnet; /root/reference/README.md:238-244 and
espnet_asr_model.py:60-153 compute ctc_weight·L_ctc + (1-w)·L_att). This
module completes the loop: label-smoothed attention CE + optax CTC loss,
adamw updates, and dp×tp sharding via parallel/mesh.py — the multi-chip
training path exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.models.ctc import ctc_loss
from speechcatcher_tpu.models.decoder import decoder_forward_train
from speechcatcher_tpu.models.encoder import encoder_forward_train


class TrainBatch(NamedTuple):
    feats: jnp.ndarray       # (B, T, n_mels) normalized log-mel
    feat_lens: jnp.ndarray   # (B,)
    tokens: jnp.ndarray      # (B, U) target ids (0-padded)
    token_lens: jnp.ndarray  # (B,)


def label_smoothing_ce(
    logits: jnp.ndarray,   # (B, U, V)
    targets: jnp.ndarray,  # (B, U)
    lengths: jnp.ndarray,  # (B,)
    smoothing: float = 0.1,
) -> jnp.ndarray:
    """Label-smoothed cross entropy, padding masked by lengths."""
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, vocab)
    smoothed = onehot * (1.0 - smoothing) + smoothing / vocab
    nll = -jnp.sum(smoothed * logp, axis=-1)  # (B, U)
    mask = jnp.arange(targets.shape[1])[None, :] < lengths[:, None]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def joint_loss(
    params: Dict[str, Any],
    batch: TrainBatch,
    cfg: ModelConfig,
    smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """ctc_weight·L_ctc + (1-w)·L_att (reference espnet_asr_model.py:144-152)."""
    enc_out, enc_lens = encoder_forward_train(
        params["encoder"], batch.feats, batch.feat_lens, cfg
    )

    l_ctc = ctc_loss(
        params["ctc"], enc_out, enc_lens, batch.tokens, batch.token_lens,
        blank=cfg.blank_id,
    )

    # Teacher forcing: ys_in = [sos] + y ; ys_out = y + [eos].
    b, u = batch.tokens.shape
    sos_col = jnp.full((b, 1), cfg.sos_id, batch.tokens.dtype)
    ys_in = jnp.concatenate([sos_col, batch.tokens], axis=1)
    eos_onehot = jax.nn.one_hot(
        batch.token_lens, u + 1, dtype=batch.tokens.dtype
    )
    ys_out = (
        jnp.concatenate([batch.tokens, jnp.zeros((b, 1), batch.tokens.dtype)],
                        axis=1)
        + eos_onehot * cfg.eos_id
    )
    logits = decoder_forward_train(
        params["decoder"], enc_out, enc_lens, ys_in, batch.token_lens + 1, cfg
    )
    l_att = label_smoothing_ce(
        logits, ys_out, batch.token_lens + 1, smoothing
    )

    loss = cfg.ctc_weight * l_ctc + (1.0 - cfg.ctc_weight) * l_att
    return loss, {"loss": loss, "ctc": l_ctc, "att": l_att}


def make_optimizer(lr: float = 1e-3,
                   weight_decay: float = 1e-6) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"))
def train_step(
    params: Dict[str, Any],
    opt_state,
    batch: TrainBatch,
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
):
    """One update step. Under a Mesh with sharded params/batch, XLA inserts
    the dp gradient psums and tp collectives automatically."""
    (loss, metrics), grads = jax.value_and_grad(joint_loss, has_aux=True)(
        params, batch, cfg
    )
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, metrics
