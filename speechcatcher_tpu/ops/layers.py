"""Functional transformer building blocks.

Pure functions over parameter pytrees (plain dicts of jnp arrays). Parameter
layouts intentionally follow torch conventions — Linear weights are (out, in),
Conv2d weights are (out_ch, in_ch, kh, kw) — so that the ESPnet checkpoint
converter (speechcatcher_tpu/checkpoint.py) is a near-identity mapping.

Behavioral contracts replicated from the reference:
- LayerNorm eps = 1e-12 (ESPnet convention,
  /root/reference/speechcatcher/model/layers/normalization.py).
- FFN = Linear→ReLU→Linear
  (/root/reference/speechcatcher/model/layers/feed_forward.py).
- MHA softmax with masked_fill(min) before and zero-fill after softmax so a
  fully-masked query row outputs exactly 0
  (/root/reference/speechcatcher/model/attention/multi_head_attention.py:113-133).
- Sinusoidal PE scaled by sqrt(d), table layout identical to
  /root/reference/speechcatcher/model/layers/positional_encoding.py:40-49.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

LAYERNORM_EPS = 1e-12
MASK_MIN = float(np.finfo(np.float32).min)


def cast_params(params, dtype=None):
    """Cast matmul weights to bf16 for mixed-precision inference; norms,
    biases, and embeddings stay fp32 (linear() upcasts outputs to fp32, so
    softmax/layernorm numerics remain fp32)."""
    import jax

    if dtype is None:
        dtype = jnp.bfloat16

    def cast(path, x):
        name = "/".join(str(p) for p in path)
        if (
            x.dtype == jnp.float32
            and x.ndim >= 2
            and "weight" in name
            and "norm" not in name
            and "batch_norm" not in name
            and not name.endswith("embed/weight")  # token embedding lookups
        ):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(
        lambda p, x: cast([getattr(k, "key", getattr(k, "idx", "")) for k in p], x),
        params,
    )


def onehot_contract(subscripts: str, values: jnp.ndarray,
                    onehot: jnp.ndarray, limbs: int = 3) -> jnp.ndarray:
    """Exact one-hot select/scatter einsum as fast bf16 MXU passes.

    Every output element of these contractions receives at most ONE nonzero
    product (the second operand is one-hot along the contracted axis), so
    exactness only needs each value·{0,1} product to be exact. The TPU
    DEFAULT matmul precision multiplies in bf16, which rounds f32 values
    (and corrupts integers above 256 — 257→256); Precision.HIGHEST is
    exact but its 6-pass f32 decomposition of these outer-product-shaped
    contractions (tiny contracted axis, huge output) compiles to a
    pathologically slow TPU program — observed taking S=32 serving ticks
    from ~100 ms to minutes inside _fused_encode.

    Instead: split the values into `limbs` bf16 limbs of 8 mantissa bits
    each. Each limb is exactly representable in bf16, each limb·{0,1}
    product is exact in ONE default-precision pass, the zero terms are
    exactly 0, and the f32 sum of the per-limb results reconstructs the
    full value (3 limbs cover all 24 f32 mantissa bits; 2 suffice for
    integers < 2^16). Exact AND fast — bf16 passes at DEFAULT speed.

    Returns float32; integer callers round-trip via .astype(jnp.int32).
    """
    if jax.default_backend() != "tpu":
        # Non-TPU backends multiply f32 exactly at DEFAULT precision (and
        # CPU's DotThunk rejects BF16xBF16=F32) — one plain pass is exact.
        return jnp.einsum(subscripts, values.astype(jnp.float32),
                          onehot.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    if values.dtype == jnp.bfloat16:
        return jnp.einsum(subscripts, values, oh,
                          preferred_element_type=jnp.float32)
    v = values.astype(jnp.float32)
    out = None
    for _ in range(limbs):
        limb = v.astype(jnp.bfloat16)
        v = v - limb.astype(jnp.float32)
        term = jnp.einsum(subscripts, limb, oh,
                          preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out


def quantize_params_int8(params, scope=("encoder",)):
    """Weight-only int8 quantization of linear weights (symmetric,
    per-output-channel): weight (…, out, in) → int8 plus an f32
    weight_scale (…, out). Halves weight HBM traffic vs bf16 — the serving
    bottleneck is memory bandwidth, and the encoder FFN/attention
    projection GEMMs dominate the per-tick weight reads. The reference
    ships its own reduced-precision attention fast path
    (/root/reference/speechcatcher/model/attention/multi_head_attention.py:135-177);
    this is the TPU-native analogue, opt-in (dtype="int8").

    Eligibility: dicts holding a 2-D/3-D float "weight" (3-D = layer-stacked
    linears; lax.scan slices both weight and weight_scale per layer) whose
    path avoids norm/embed/conv — normalization and the token-embedding
    lookup need full precision, and the conv modules consume raw weights
    directly. `scope` limits quantization to matching path components
    (default: encoder only; pass None for every eligible linear).

    int8→bf16 casts are exact (|q| ≤ 127 < 256), so linear()'s int8 path
    computes x_bf16 @ q_bf16 on the MXU and applies the per-channel scale
    as an f32 epilogue — accumulation and output stay f32."""
    def walk(node, path):
        if isinstance(node, dict):
            eligible = (
                "weight" in node
                and hasattr(node["weight"], "ndim")
                and node["weight"].ndim in (2, 3)
                and node["weight"].dtype in (jnp.float32, jnp.bfloat16)
                and not any(t in path for t in ("norm", "embed", "conv"))
                and (scope is None or any(s in path for s in scope))
            )
            out = {}
            for k, v in node.items():
                if k == "weight" and eligible:
                    w = v.astype(jnp.float32)
                    s = jnp.maximum(
                        jnp.max(jnp.abs(w), axis=-1) / 127.0, 1e-12
                    )
                    out["weight"] = jnp.clip(
                        jnp.round(w / s[..., None]), -127, 127
                    ).astype(jnp.int8)
                    out["weight_scale"] = s.astype(jnp.float32)
                else:
                    out[k] = walk(v, f"{path}/{k}")
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, f"{path}/{i}") for i, v in enumerate(node)
            )
        return node

    return walk(params, "")


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x @ W^T + b with torch-layout weight (out, in).

    Mixed precision: when the weight is stored bf16 (cast_params), the input
    casts to bf16 so the matmul takes the fast MXU path; accumulation and
    the output stay fp32. int8 weights (quantize_params_int8) multiply as
    exact bf16 casts with a per-output-channel f32 scale epilogue."""
    w = p["weight"]
    if w.dtype == jnp.int8:
        y = jnp.einsum(
            "...i,oi->...o", x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * p["weight_scale"]
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y
    xin = x.astype(w.dtype) if w.dtype == jnp.bfloat16 else x
    y = jnp.einsum("...i,oi->...o", xin, w,
                   preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y


def layer_norm(p: Params, x: jnp.ndarray, eps: float = LAYERNORM_EPS) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    return xhat * p["weight"] + p["bias"]


def feed_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Position-wise FFN: w_2(relu(w_1(x)))."""
    h = jax.nn.relu(linear(p["w_1"], x))
    return linear(p["w_2"], h)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------

def mha_project(p: Params, x: jnp.ndarray, name: str, n_head: int) -> jnp.ndarray:
    """(B, T, d) → (B, H, T, d_k) through a torch-layout Linear."""
    b, t, d = x.shape
    y = linear(p[name], x)
    return y.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """(B,H,Tq,dk) x (B,H,Tk,dk) attention with reference mask semantics.

    mask: broadcastable to (B, 1, Tq, Tk); nonzero = attend. Fully-masked
    rows produce exactly zero output (softmax then zero-fill), matching
    multi_head_attention.py:117-122.
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mask is not None:
        keep = mask != 0
        scores = jnp.where(keep, scores, MASK_MIN)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(keep, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32)


def multi_head_attention(
    p: Params,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    n_head: int,
) -> jnp.ndarray:
    """Full MHA: project, attend, merge heads, output projection.

    mask: (B, Tq, Tk) or (B, 1, Tk), nonzero = attend (reference semantics:
    the (batch, tq, tk) mask is unsqueezed to (batch, 1, tq, tk)).
    """
    b = query.shape[0]
    q = mha_project(p, query, "linear_q", n_head)
    k = mha_project(p, key, "linear_k", n_head)
    v = mha_project(p, value, "linear_v", n_head)
    if mask is not None and mask.ndim == 2:
        # Shared static geometry mask (the streaming encoder's block mask):
        # fused Pallas attention on TPU, broadcast XLA path elsewhere.
        from speechcatcher_tpu.ops.pallas.block_attention import (
            block_attention,
            use_pallas,
        )

        if use_pallas():
            x = block_attention(q, k, v, mask)
        else:
            x = scaled_dot_attention(q, k, v, mask[None, None, :, :])
    else:
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None, :, :]
        x = scaled_dot_attention(q, k, v, mask)
    x = x.transpose(0, 2, 1, 3).reshape(b, -1, p["linear_out"]["weight"].shape[1])
    return linear(p["linear_out"], x)


# ---------------------------------------------------------------------------
# Positional encoding
# ---------------------------------------------------------------------------

def sinusoidal_pe_table(d_model: int, max_len: int = 5000) -> np.ndarray:
    """(max_len, d_model) float32 PE table (positional_encoding.py:40-49)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def add_positional_encoding(
    x: jnp.ndarray, pe_table: jnp.ndarray, offset
) -> jnp.ndarray:
    """x * sqrt(d) + pe[offset : offset+T]; offset may be a traced scalar.

    Using lax.dynamic_slice keeps a changing stream offset from triggering
    recompilation.
    """
    d_model = x.shape[-1]
    t = x.shape[-2]
    pe = jax.lax.dynamic_slice_in_dim(pe_table, offset, t, axis=0)
    return x * math.sqrt(d_model) + pe


# ---------------------------------------------------------------------------
# Parameter initializers (for tests / random models; checkpoints override)
# ---------------------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {
        "weight": jax.random.uniform(
            k1, (d_out, d_in), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    }
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype=jnp.float32)
    return p


def init_layer_norm(d: int) -> Params:
    return {
        "weight": jnp.ones((d,), dtype=jnp.float32),
        "bias": jnp.zeros((d,), dtype=jnp.float32),
    }


def init_mha(key, d_model: int) -> Params:
    keys = jax.random.split(key, 4)
    return {
        "linear_q": init_linear(keys[0], d_model, d_model),
        "linear_k": init_linear(keys[1], d_model, d_model),
        "linear_v": init_linear(keys[2], d_model, d_model),
        "linear_out": init_linear(keys[3], d_model, d_model),
    }


def init_ffn(key, d_model: int, d_hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "w_1": init_linear(k1, d_model, d_hidden),
        "w_2": init_linear(k2, d_hidden, d_model),
    }
