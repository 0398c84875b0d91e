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


def main():
    """Minimal distributed training driver (smoke/scale harness).

    Single-host: `python -m speechcatcher_tpu.training --steps 10`.
    Multi-host over DCN: run one process per host with
    `--coordinator host0:1234 --num-processes N --process-id i`; the mesh
    spans every host's chips, dp gradient psums ride ICI within a host and
    DCN across hosts (tp groups never span hosts — see
    parallel.mesh.hybrid_device_grid).
    """
    import argparse

    import numpy as np

    parser = argparse.ArgumentParser(description="speechcatcher_tpu trainer")
    parser.add_argument("--model-dir", type=str, default=None,
                        help="ESPnet model dir to fine-tune (default: "
                        "random-init from the flagship config)")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8,
                        help="GLOBAL batch size (sharded over dp)")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 for multi-host DCN")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    from speechcatcher_tpu.parallel.mesh import (
        initialize_distributed, make_hybrid_mesh, shard_batch, shard_params,
    )

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    mesh = make_hybrid_mesh(tp=args.tp)

    if args.model_dir is not None:
        from pathlib import Path

        from speechcatcher_tpu.checkpoint import (
            find_checkpoint, load_espnet_checkpoint,
        )
        params, cfg, _ = load_espnet_checkpoint(
            find_checkpoint(Path(args.model_dir))
        )
    else:
        from speechcatcher_tpu.config import ModelConfig
        from speechcatcher_tpu.models.asr_model import ASRModel
        cfg = ModelConfig()
        params = ASRModel.random_init(cfg, seed=0).params

    params = shard_params(params, mesh)
    optimizer = make_optimizer(args.lr)
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(0)
    t_frames, u_tokens = 256, 24
    for step in range(args.steps):
        batch = TrainBatch(
            feats=jnp.asarray(
                rng.randn(args.batch, t_frames, cfg.n_mels), jnp.float32
            ),
            feat_lens=jnp.full((args.batch,), t_frames, jnp.int32),
            tokens=jnp.asarray(
                rng.randint(1, cfg.vocab_size - 1,
                            (args.batch, u_tokens)), jnp.int32
            ),
            token_lens=jnp.full((args.batch,), u_tokens, jnp.int32),
        )
        batch = TrainBatch(*shard_batch(tuple(batch), mesh))
        with mesh:
            params, opt_state, metrics = train_step(
                params, opt_state, batch, cfg, optimizer
            )
        if jax.process_index() == 0:
            print(f"step {step}: loss {float(metrics['loss']):.4f} "
                  f"(ctc {float(metrics['ctc']):.4f}, "
                  f"att {float(metrics['att']):.4f})")


if __name__ == "__main__":
    main()
