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
import numpy as np
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


def warmup_lr_schedule(peak_lr: float, warmup_steps: int):
    """ESPnet's WarmupLR: lr · warmup^0.5 · min(step^-0.5, step·warmup^-1.5).

    Linear ramp to peak_lr at `warmup_steps`, then inverse-sqrt decay —
    the schedule the reference's models were trained under (their
    config.yaml: scheduler warmuplr, warmup_steps 25000/30000).
    """
    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32)
                        if hasattr(step, "astype") else float(max(step, 1)),
                        1.0)
        return peak_lr * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5
        )
    return schedule


def make_optimizer(lr: float = 1e-3,
                   weight_decay: float = 1e-6,
                   warmup_steps: int = 0,
                   grad_clip: float = 0.0) -> optax.GradientTransformation:
    """adamw, optionally under WarmupLR and global-norm clipping
    (ESPnet trains these models with grad_clip 5.0)."""
    lr_or_sched = (warmup_lr_schedule(lr, warmup_steps)
                   if warmup_steps > 0 else lr)
    opt = optax.adamw(lr_or_sched, weight_decay=weight_decay)
    if grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


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


@functools.partial(jax.jit, static_argnames=("cfg",))
def _eval_metrics(params, batch: TrainBatch, cfg: ModelConfig):
    return joint_loss(params, batch, cfg)[1]


def evaluate(params, cfg: ModelConfig, batches, tokenizer=None):
    """Held-out evaluation: mean joint/CTC/attention loss, plus greedy-CTC
    WER when a tokenizer is given.

    `batches` yields (TrainBatch, ref_texts) pairs (BucketBatcher
    with_refs=True). Greedy CTC is the cheap during-training proxy the
    full beam decoder (decode/beam_search.py) refines at inference.
    """
    from speechcatcher_tpu.decode.greedy import _encode_and_collapse
    from speechcatcher_tpu.wer import word_error_rate

    sums = {"loss": 0.0, "ctc": 0.0, "att": 0.0}
    refs: list = []
    hyps: list = []
    n = 0
    for batch, texts in batches:
        m = _eval_metrics(params, batch, cfg)
        for k in sums:
            sums[k] += float(m[k])
        n += 1
        if tokenizer is not None:
            tokens, counts = _encode_and_collapse(
                params, batch.feats, batch.feat_lens, cfg
            )
            tokens, counts = np.asarray(tokens), np.asarray(counts)
            for i, text in enumerate(texts):
                refs.append(text)
                hyps.append(tokenizer.ids_to_text(
                    [int(t) for t in tokens[i, : counts[i]]]
                ))
    out = {k: v / max(n, 1) for k, v in sums.items()}
    if refs:
        wer_stats = word_error_rate(refs, hyps)
        out["wer"] = wer_stats["wer"]
        out["cer"] = wer_stats["cer"]
    return out


def main():
    """Distributed training/fine-tuning driver.

    Single-host smoke: `python -m speechcatcher_tpu.training --steps 10`
    (synthetic data). Real data: `--data-dir <kaldi dir>` (wav.scp +
    text). Multi-host over DCN: run one process per host with
    `--coordinator host0:1234 --num-processes N --process-id i`; the mesh
    spans every host's chips, dp gradient psums ride ICI within a host and
    DCN across hosts (tp groups never span hosts — see
    parallel.mesh.hybrid_device_grid).
    """
    import argparse
    from pathlib import Path

    parser = argparse.ArgumentParser(description="speechcatcher_tpu trainer")
    parser.add_argument("--model-dir", type=str, default=None,
                        help="ESPnet model dir to fine-tune (default: "
                        "random-init from the flagship config)")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="Kaldi-style data dir (wav.scp + text); "
                        "default: synthetic smoke data")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8,
                        help="GLOBAL batch size (sharded over dp)")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--warmup-steps", type=int, default=0,
                        help="WarmupLR ramp (ESPnet trains with 25-30k)")
    parser.add_argument("--grad-clip", type=float, default=5.0)
    parser.add_argument("--eval-frac", type=float, default=0.1)
    parser.add_argument("--eval-every", type=int, default=0,
                        help="evaluate every N steps (0 = only at end)")
    parser.add_argument("--save-dir", type=str, default=None,
                        help="orbax checkpoint dir (utils/save.py)")
    parser.add_argument("--save-every", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="resume params from --save-dir's latest step")
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

    from speechcatcher_tpu.models.asr_model import ASRModel

    if args.model_dir is not None:
        model = ASRModel.from_directory(Path(args.model_dir))
    else:
        from speechcatcher_tpu.config import ModelConfig
        model = ASRModel.random_init(ModelConfig(), seed=0)
    cfg, tokenizer, frontend = model.cfg, model.tokenizer, model.frontend
    params = model.params
    start_step = 0
    if args.resume and args.save_dir:
        from speechcatcher_tpu.utils.save import load_checkpoint
        params, cfg, start_step = load_checkpoint(Path(args.save_dir))
        print(f"resumed step {start_step} from {args.save_dir}")

    from speechcatcher_tpu.data import (
        BucketBatcher, read_kaldi_dir, synthetic_dataset, train_eval_split,
    )

    if args.data_dir is not None:
        utts = read_kaldi_dir(Path(args.data_dir))
    else:
        utts = synthetic_dataset(max(4 * args.batch, 32), cfg, tokenizer)
    train_utts, eval_utts = train_eval_split(utts, args.eval_frac)
    batcher = BucketBatcher(frontend, tokenizer, batch_size=args.batch,
                            input_layer=cfg.input_layer)
    print(f"{len(train_utts)} train / {len(eval_utts)} eval utterances")

    params = shard_params(params, mesh)
    optimizer = make_optimizer(args.lr, warmup_steps=args.warmup_steps,
                               grad_clip=args.grad_clip)
    opt_state = optimizer.init(params)

    def run_eval(step):
        if not eval_utts or jax.process_index() != 0:
            return
        m = evaluate(params, cfg,
                     batcher.batches(eval_utts, with_refs=True), tokenizer)
        wer = f" wer {m['wer']*100:.1f}%" if "wer" in m else ""
        print(f"eval @ step {step}: loss {m['loss']:.4f} "
              f"(ctc {m['ctc']:.4f}, att {m['att']:.4f}){wer}")

    def save(step):
        if args.save_dir and jax.process_index() == 0:
            from speechcatcher_tpu.utils.save import save_checkpoint
            save_checkpoint(Path(args.save_dir), jax.device_get(params),
                            cfg, step=step)
            print(f"saved step {step} -> {args.save_dir}")

    step = start_step
    epoch = 0
    while step < start_step + args.steps:
        for batch in batcher.batches(train_utts, shuffle_seed=epoch):
            if step >= start_step + args.steps:
                break
            batch = TrainBatch(*shard_batch(tuple(batch), mesh))
            with mesh:
                params, opt_state, metrics = train_step(
                    params, opt_state, batch, cfg, optimizer
                )
            step += 1
            if jax.process_index() == 0:
                print(f"step {step}: loss {float(metrics['loss']):.4f} "
                      f"(ctc {float(metrics['ctc']):.4f}, "
                      f"att {float(metrics['att']):.4f})")
            if args.eval_every and step % args.eval_every == 0:
                run_eval(step)
            if args.save_every and step % args.save_every == 0:
                save(step)
        epoch += 1
    run_eval(step)
    save(step)


if __name__ == "__main__":
    main()
