"""Conformer building blocks: convolution module + relative-position MHA.

Functional counterparts of the reference modules
(/root/reference/speechcatcher/model/layers/convolution.py and
model/attention/multi_head_attention.py:261-378, the Transformer-XL style
"legacy" relative attention used by ESPnet conformers):

- ConvolutionModule: LN → pointwise(2x) → GLU → depthwise(k=31) → BatchNorm
  (inference: running-stats affine) → Swish → pointwise → (dropout).
- RelPositionMultiHeadedAttention: content/position score split with learned
  pos_bias_u/pos_bias_v and the rel_shift trick (reference :300-314).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from speechcatcher_tpu.ops.layers import (
    MASK_MIN,
    Params,
    init_linear,
    layer_norm,
    linear,
)


# ---------------------------------------------------------------------------
# Convolution module
# ---------------------------------------------------------------------------

def init_conv_module(key: jax.Array, channels: int,
                     kernel_size: int = 31) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    bound1 = 1.0 / math.sqrt(channels)
    boundd = 1.0 / math.sqrt(kernel_size)
    return {
        "pointwise_conv1": {
            "weight": jax.random.uniform(
                k1, (2 * channels, channels, 1), minval=-bound1, maxval=bound1
            ),
            "bias": jnp.zeros((2 * channels,)),
        },
        "depthwise_conv": {
            "weight": jax.random.uniform(
                k2, (channels, 1, kernel_size), minval=-boundd, maxval=boundd
            ),
            "bias": jnp.zeros((channels,)),
        },
        "batch_norm": {
            "weight": jnp.ones((channels,)),
            "bias": jnp.zeros((channels,)),
            "running_mean": jnp.zeros((channels,)),
            "running_var": jnp.ones((channels,)),
        },
        "pointwise_conv2": {
            "weight": jax.random.uniform(
                k3, (channels, channels, 1), minval=-bound1, maxval=bound1
            ),
            "bias": jnp.zeros((channels,)),
        },
    }


def conv_module(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """(B, T, C) → (B, T, C) (reference convolution.py:83-120, eval mode).

    torch Conv1d weights are (out, in/groups, k); inference BatchNorm is a
    per-channel affine from running stats. The in-repo reference module has
    an internal LayerNorm (convolution.py:50); ESPnet checkpoints don't
    (norm_conv lives in the layer), so it's applied only when present.
    """
    if "layernorm" in p:
        x = layer_norm(p["layernorm"], x, eps=1e-5)

    # Pointwise expansion: (B, T, C) @ (2C, C) — kernel size 1.
    w1 = p["pointwise_conv1"]["weight"][:, :, 0]  # (2C, C)
    h = jnp.einsum("btc,oc->bto", x, w1) + p["pointwise_conv1"]["bias"]

    # GLU along channels.
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)

    # Depthwise conv, 'same' padding.
    dw = p["depthwise_conv"]["weight"][:, 0, :]  # (C, k)
    k = dw.shape[1]
    pad = (k - 1) // 2
    hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
    # (B, T+2p, C) → windows (B, T, k, C) → sum_k window * dw[c, k]
    idx = jnp.arange(h.shape[1])[:, None] + jnp.arange(k)[None, :]
    windows = hp[:, idx, :]  # (B, T, k, C)
    h = jnp.einsum("btkc,ck->btc", windows, dw) + p["depthwise_conv"]["bias"]

    # BatchNorm (running stats) + Swish.
    bn = p["batch_norm"]
    h = (h - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + eps)
    h = h * bn["weight"] + bn["bias"]
    h = h * jax.nn.sigmoid(h)

    # Pointwise projection.
    w2 = p["pointwise_conv2"]["weight"][:, :, 0]
    return jnp.einsum("btc,oc->bto", h, w2) + p["pointwise_conv2"]["bias"]


# ---------------------------------------------------------------------------
# Relative-position multi-head attention
# ---------------------------------------------------------------------------

def init_rel_mha(key: jax.Array, d_model: int, n_head: int) -> Params:
    from speechcatcher_tpu.ops.layers import init_mha

    keys = jax.random.split(key, 3)
    p = init_mha(keys[0], d_model)
    p["linear_pos"] = init_linear(keys[1], d_model, d_model, bias=False)
    d_k = d_model // n_head
    # Xavier-uniform like the reference (:297-298).
    bound = math.sqrt(6.0 / (n_head + d_k))
    p["pos_bias_u"] = jax.random.uniform(
        keys[2], (n_head, d_k), minval=-bound, maxval=bound
    )
    p["pos_bias_v"] = jax.random.uniform(
        jax.random.fold_in(keys[2], 1), (n_head, d_k), minval=-bound,
        maxval=bound,
    )
    return p


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Legacy Transformer-XL relative shift (reference :300-314)."""
    b, h, tq, tk = x.shape
    zero_pad = jnp.zeros((b, h, tq, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, tk + 1, tq)
    return x_padded[:, :, 1:].reshape(b, h, tq, tk)


def rel_position_attention(
    p: Params,
    query: jnp.ndarray,    # (B, Tq, d)
    key: jnp.ndarray,      # (B, Tk, d)
    value: jnp.ndarray,    # (B, Tk, d)
    pos_emb: jnp.ndarray,  # (1 or B, Tk, d)
    mask: Optional[jnp.ndarray],
    n_head: int,
) -> jnp.ndarray:
    """Reference RelPositionMultiHeadedAttention.forward (:316-378)."""
    b, tq, d = query.shape
    dk = d // n_head

    def proj(name, x):
        y = linear(p[name], x)
        return y.reshape(x.shape[0], -1, n_head, dk).transpose(0, 2, 1, 3)

    q = proj("linear_q", query)
    k = proj("linear_k", key)
    v = proj("linear_v", value)
    pos = linear(p["linear_pos"], pos_emb)
    pos = pos.reshape(pos_emb.shape[0], -1, n_head, dk).transpose(0, 2, 1, 3)

    if (
        mask is not None
        and mask.ndim == 2
        and pos.shape[0] == 1
        and pos.shape[2] == key.shape[1]
        and tq == key.shape[1]
    ):
        # Shared static geometry mask (the streaming encoder's block mask)
        # with a shared position table: fused Pallas rel-pos attention on
        # TPU (scores + shift + softmax + AV stay in VMEM per tile).
        from speechcatcher_tpu.ops.pallas.rel_attention import (
            rel_block_attention,
        )
        from speechcatcher_tpu.ops.pallas.block_attention import use_pallas

        if use_pallas():
            out = rel_block_attention(
                q, k, v, pos[0], p["pos_bias_u"], p["pos_bias_v"], mask
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
            return linear(p["linear_out"], out)

    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                           preferred_element_type=jnp.float32)
    # Broadcast a shared (1, ...) position table across the batch; a
    # per-batch table stays per-batch. (A 'uhkd' contraction here would
    # SUM over the unmatched batch axis — silent corruption for B > 1.)
    pos_b = jnp.broadcast_to(pos, (q_v.shape[0],) + pos.shape[1:])
    matrix_bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, pos_b,
                           preferred_element_type=jnp.float32)
    matrix_bd = rel_shift(matrix_bd)
    scores = (matrix_ac + matrix_bd) / math.sqrt(dk)

    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None, :, :]
        keep = mask != 0
        scores = jnp.where(keep, scores, MASK_MIN)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(keep, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return linear(p["linear_out"], out)
