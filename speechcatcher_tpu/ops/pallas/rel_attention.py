"""Fused rel-pos masked block attention for the conformer encoder (Pallas).

Conformer counterpart of block_attention.py: the streaming conformer layer
attends inside (block_size+2)-wide windows with one fixed geometry mask and
Transformer-XL "legacy" relative position scores
(reference /root/reference/speechcatcher/model/attention/
multi_head_attention.py:261-378: content/position score split with learned
pos_bias_u/pos_bias_v and the rel_shift trick at :300-314). The XLA path
materializes FOUR (N, H, W, W) tensors in HBM between einsums (matrix_ac,
matrix_bd pre/post shift, the zero-filled attention weights); this kernel
keeps all of them in VMEM per tile.

The rel_shift is algebraic here, not a reshape trick: for tq == tk == W the
legacy shift is
    out[q, k] = raw[q, k - q + W - 1]   for k <= q
    out[q, q + 1] = 0
    out[q, k] = raw[q + 1, k - q - 2]   for k >= q + 2
(the k > q entries WRAP from the next query row — the documented quirk of
the legacy reshape trick, which the reference and the XLA path both keep).
Each branch is a fixed linear operator on the j axis per query row — passed
in as two static (W, W, W) one-hot tensors and applied as batched matmuls,
which Mosaic handles natively (no lane-crossing reshapes).

Numerics match ops/conformer.py::rel_position_attention exactly (same
MASK_MIN fill, fully-masked-row zeroing); parity test in
tests/test_pallas_kernels.py runs the kernel in interpreter mode on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from speechcatcher_tpu.ops.layers import MASK_MIN

TN = 8  # streams·blocks per program instance


def _kernel(q_ref, k_ref, v_ref, pos_ref, bu_ref, bv_ref, mask_ref,
            shift1_ref, shift2_ref, o_ref):
    tn, h, w, dk = q_ref.shape
    q = q_ref[:]
    k = k_ref[:].reshape(tn * h, w, dk)
    v = v_ref[:].reshape(tn * h, w, dk)
    pos = pos_ref[:]                               # (H, W, dk)
    bias_u = bu_ref[:]                             # (H, dk)
    bias_v = bv_ref[:]                             # (H, dk)

    # Content scores: (q + u) · kᵀ, (TN, H) folded into one batch dim.
    q_u = (q + bias_u[None, :, None, :]).reshape(tn * h, w, dk)
    ac = jax.lax.dot_general(
        q_u, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # (TN·H, W, W)

    # Position scores: (q + v) · posᵀ with pos shared across the tile.
    q_v = (q + bias_v[None, :, None, :]).transpose(1, 0, 2, 3)  # (H,TN,W,dk)
    raw = jax.lax.dot_general(
        q_v.reshape(h, tn * w, dk), pos,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # (H, TN·W, W_j)

    # Legacy rel_shift as two per-query-row linear maps over j: the k <= q
    # half reads row q, the k >= q+2 half wraps from row q+1.
    raw = raw.reshape(h, tn, w, w).transpose(2, 1, 0, 3)        # (Wq,TN,H,Wj)
    raw = raw.reshape(w, tn * h, w)
    raw_next = jnp.concatenate(
        [raw[1:], jnp.zeros_like(raw[:1])], axis=0
    )                                              # row q+1 (zero past end)
    dn = (((2,), (1,)), ((0,), (0,)))
    shifted = jax.lax.dot_general(
        raw, shift1_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        raw_next, shift2_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )                                              # (Wq, TN·H, Wk)
    bd = shifted.reshape(w, tn, h, w).transpose(1, 2, 0, 3)     # (TN,H,Wq,Wk)
    bd = bd.reshape(tn * h, w, w)

    scores = (ac + bd) / math.sqrt(dk)
    keep = mask_ref[:] != 0                        # (W, W) static geometry
    scores = jnp.where(keep[None], scores, MASK_MIN)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(keep[None], attn, 0.0)
    out = jax.lax.dot_general(
        attn, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(tn, h, w, dk)


def _xla_reference(q, k, v, pos, bias_u, bias_v, mask):
    """Kernel math via plain XLA ops — the autodiff anchor for the custom
    VJP (identical numerics to ops/conformer.py::rel_position_attention's
    XLA path at tq == tk with a shared position table)."""
    from speechcatcher_tpu.ops.conformer import rel_shift

    dk = q.shape[-1]
    q_u = q + bias_u[None, :, None, :]
    q_v = q + bias_v[None, :, None, :]
    ac = jnp.einsum("nhqd,nhkd->nhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("nhqd,hkd->nhqk", q_v, pos,
                    preferred_element_type=jnp.float32)
    bd = rel_shift(bd)
    scores = (ac + bd) / math.sqrt(dk)
    keep = mask != 0
    scores = jnp.where(keep[None, None], scores, MASK_MIN)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(keep[None, None], attn, 0.0)
    return jnp.einsum("nhqk,nhkd->nhqd", attn, v,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _rel_block_attention(q, k, v, pos, bias_u, bias_v, mask, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, dk = q.shape
    n_pad = -(-n // TN) * TN
    if n_pad != n:
        padw = ((0, n_pad - n), (0, 0), (0, 0), (0, 0))
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)

    # shift1[q, j, k] = 1 iff j == k - q + W - 1 (the k <= q half) and
    # shift2[q, j, k] = 1 iff j == k - q - 2 (the k >= q+2 half, applied to
    # query row q+1) — together the exact legacy rel_shift for tq == tk
    # (reference multi_head_attention.py:300-314, wrap quirk included).
    qi = jnp.arange(w)[:, None, None]
    ji = jnp.arange(w)[None, :, None]
    ki = jnp.arange(w)[None, None, :]
    shift1 = (ji == ki - qi + w - 1).astype(jnp.float32)
    shift2 = (ji == ki - qi - 2).astype(jnp.float32)

    qkv_spec = pl.BlockSpec(
        (TN, h, w, dk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    fixed = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, h, w, dk), jnp.float32),
        grid=(n_pad // TN,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            fixed(h, w, dk),
            fixed(h, dk),
            fixed(h, dk),
            fixed(w, w),
            fixed(w, w, w),
            fixed(w, w, w),
        ],
        out_specs=pl.BlockSpec(
            (TN, h, w, dk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      pos.astype(jnp.float32), bias_u.astype(jnp.float32),
      bias_v.astype(jnp.float32), mask.astype(jnp.float32), shift1, shift2)
    return out[:n]


def _rel_block_attention_fwd(q, k, v, pos, bias_u, bias_v, mask, interpret):
    out = _rel_block_attention(q, k, v, pos, bias_u, bias_v, mask, interpret)
    return out, (q, k, v, pos, bias_u, bias_v, mask)


def _rel_block_attention_bwd(interpret, res, g):
    q, k, v, pos, bias_u, bias_v, mask = res
    # pos/bias_u/bias_v are trainable (linear_pos projection and the
    # Transformer-XL biases), so they get real cotangents; only the static
    # geometry mask is zero.
    _, vjp = jax.vjp(
        lambda q_, k_, v_, p_, u_, v2_: _xla_reference(
            q_, k_, v_, p_, u_, v2_, mask
        ),
        q, k, v, pos, bias_u, bias_v,
    )
    dq, dk, dv, dpos, du, dbv = vjp(g.astype(jnp.float32))
    return dq, dk, dv, dpos, du, dbv, jnp.zeros_like(mask)


_rel_block_attention.defvjp(_rel_block_attention_fwd, _rel_block_attention_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rel_block_attention(
    q: jnp.ndarray,       # (N, H, W, dk)
    k: jnp.ndarray,       # (N, H, W, dk)
    v: jnp.ndarray,       # (N, H, W, dk)
    pos: jnp.ndarray,     # (H, W, dk) projected positional encodings
    bias_u: jnp.ndarray,  # (H, dk)
    bias_v: jnp.ndarray,  # (H, dk)
    mask: jnp.ndarray,    # (W, W) nonzero = attend
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax(mask((q+u)·kᵀ + shift((q+v)·posᵀ)))·V, rel-pos MHA.

    Differentiable via a custom VJP that rematerializes the attention
    through the XLA ops in the backward pass (pallas_call itself has no
    autodiff rule) — the conformer training path needs this on real TPUs.
    """
    return _rel_block_attention(q, k, v, pos, bias_u, bias_v, mask, interpret)
