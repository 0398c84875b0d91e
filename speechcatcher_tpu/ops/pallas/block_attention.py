"""Fused masked block attention for the streaming encoder (Pallas/TPU).

The contextual block encoder attends inside (block_size+2)-wide windows with
one fixed geometry mask (rows 1..bs+1 attend cols 0..bs — encoder
block_attention_mask; reference hook: multi_head_attention.py:9-14,165-177
keeps a flash-attn import for exactly this op). The XLA path materializes
Q·Kᵀ scores (N, H, W, W) and the zero-filled attention weights in HBM
between the two einsums; this kernel keeps scores/softmax/zero-fill/AV in
VMEM per tile — one HBM round trip for the whole attention instead of
three, and one fused kernel launch per layer.

Shapes: q/k/v (N, H, W, dk) with N = streams·blocks (large), W = bs+2 = 42
(small), dk = d/H. The grid tiles N; each program computes TN·H tiny
attentions batched through the MXU via dot_general batch dims.

Numerics match ops/layers.py::scaled_dot_attention exactly (same MASK_MIN
fill, same fully-masked-row zeroing) — parity test in
tests/test_pallas_kernels.py runs the kernel in interpreter mode on CPU.

Differentiable: pallas_call has no autodiff rule, so a custom VJP
recomputes the attention through the XLA ops in the backward pass
(rematerialization — nothing beyond q/k/v is saved from the forward). The
training path (encoder_forward_train under jax.grad) hits this on real
TPUs, where use_pallas() routes the forward here.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from speechcatcher_tpu.ops.layers import MASK_MIN

TN = 8  # streams·blocks per program instance


def use_pallas() -> bool:
    """Pallas kernels run on real TPUs; everywhere else the XLA path is
    used (CPU tests exercise the kernel via interpret mode)."""
    if os.environ.get("SPEECHCATCHER_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    tn, h, w, dk = q_ref.shape
    # Mosaic's tpu.matmul supports ONE batch dim: fold (TN, H) together
    # (a no-op relayout — the tiled trailing dims are untouched).
    q = q_ref[:].reshape(tn * h, w, dk)
    k = k_ref[:].reshape(tn * h, w, dk)
    v = v_ref[:].reshape(tn * h, w, dk)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(dk)                  # (TN·H, W, W)
    keep = mask_ref[:] != 0            # (W, W) static geometry
    scores = jnp.where(keep[None], scores, MASK_MIN)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(keep[None], attn, 0.0)
    out = jax.lax.dot_general(
        attn, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(tn, h, w, dk)


def _xla_reference(q, k, v, mask):
    """Same math as _kernel via plain XLA ops — the autodiff anchor for
    the custom VJP (numerically identical to the kernel)."""
    dk = q.shape[-1]
    scores = jnp.einsum(
        "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dk)
    keep = mask != 0
    scores = jnp.where(keep[None, None], scores, MASK_MIN)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(keep[None, None], attn, 0.0)
    return jnp.einsum(
        "nhqk,nhkd->nhqd", attn, v, preferred_element_type=jnp.float32
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _block_attention(q, k, v, mask, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, dk = q.shape
    n_pad = -(-n // TN) * TN
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qkv_spec = pl.BlockSpec(
        (TN, h, w, dk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, h, w, dk), jnp.float32),
        grid=(n_pad // TN,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TN, h, w, dk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      mask.astype(jnp.float32))
    return out[:n]


def _block_attention_fwd(q, k, v, mask, interpret):
    return _block_attention(q, k, v, mask, interpret), (q, k, v, mask)


def _block_attention_bwd(interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, mask), q, k, v
    )
    dq, dk, dv = vjp(g.astype(jnp.float32))
    return dq, dk, dv, jnp.zeros_like(mask)  # mask = static geometry


_block_attention.defvjp(_block_attention_fwd, _block_attention_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_attention(
    q: jnp.ndarray,     # (N, H, W, dk)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # (W, W) nonzero = attend
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(mask(Q·Kᵀ/√dk))·V with reference mask semantics, fused."""
    return _block_attention(q, k, v, mask, interpret)
