"""CTC head: projection, log-softmax, greedy decode, and training loss.

Mirrors /root/reference/speechcatcher/model/ctc.py. The projection fuses into
the encoder chunk step on TPU (one extra (T, d) @ (d, V) MXU matmul). The
loss path uses optax's native CTC loss (XLA-compiled forward-backward) in
place of torch.nn.functional.ctc_loss (reference ctc.py:105-113).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.ops.layers import Params, init_linear, linear


def init_ctc_params(key: jax.Array, cfg: ModelConfig) -> Params:
    return {"ctc_lo": init_linear(key, cfg.encoder_dim, cfg.vocab_size)}


def ctc_logits(params: Params, hs: jnp.ndarray) -> jnp.ndarray:
    """(B, T, d) encoder output → (B, T, vocab) logits."""
    return linear(params["ctc_lo"], hs)


def ctc_log_softmax(params: Params, hs: jnp.ndarray) -> jnp.ndarray:
    # fp32 normalization even when frames arrive from a bf16 ring
    # (config.enc_ring_dtype): a bf16 log-sum-exp over the 1024-way vocab
    # would cost ~2 decimal digits on every stored log-prob.
    return jax.nn.log_softmax(
        ctc_logits(params, hs).astype(jnp.float32), axis=-1
    )


def ctc_argmax(params: Params, hs: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(ctc_logits(params, hs), axis=-1)


@jax.jit
def ctc_greedy_collapse(
    predictions: jnp.ndarray,  # (B, T) argmax ids
    lengths: jnp.ndarray,      # (B,)
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized greedy collapse: drop repeats then blanks.

    Returns (tokens (B, T) left-packed with blank padding, counts (B,)).
    Matches reference ctc_greedy_decode (ctc.py:142-178) without the
    per-frame Python loop.
    """
    b, t = predictions.shape
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, predictions.dtype), predictions[:, :-1]], axis=1
    )
    keep = (predictions != blank) & (predictions != prev) & valid
    # Left-pack kept tokens via a stable sort on (not keep).
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(predictions, order, axis=1)
    counts = jnp.sum(keep, axis=1)
    packed = jnp.where(jnp.arange(t)[None, :] < counts[:, None], packed, blank)
    return packed, counts


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_loss(
    params: Params,
    hs: jnp.ndarray,          # (B, T, d)
    hlens: jnp.ndarray,       # (B,)
    ys: jnp.ndarray,          # (B, U) labels (0 = padding by convention)
    ylens: jnp.ndarray,       # (B,)
    blank: int = 0,
) -> jnp.ndarray:
    """Mean CTC loss (reference ctc.py:75-115) via optax's XLA kernel."""
    import optax

    logits = ctc_logits(params, hs)
    logit_paddings = (
        jnp.arange(logits.shape[1])[None, :] >= hlens[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(ys.shape[1])[None, :] >= ylens[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits, logit_paddings, ys, label_paddings, blank_id=blank
    )
    return jnp.mean(per_seq)
