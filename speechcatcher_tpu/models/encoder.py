"""Contextual Block Transformer Encoder — TPU-native streaming implementation.

Replicates the behavior of the reference encoder
(/root/reference/speechcatcher/model/encoder/contextual_block_transformer_encoder.py)
with a functional, batched design:

- Attention runs over (B·n_blocks, block_size+2, d) with ONE static mask
  (rows 1..bs+1 attend cols 0..bs — _create_block_mask, reference :524-528),
  shared across blocks and batch: a block-diagonal pattern XLA tiles onto the
  MXU without any dynamic shapes.
- Per-layer context carry (`past_encoder_ctx`) is a (B, L, d) array; the
  inter-block/inter-layer context shift (reference
  contextual_block_encoder_layer.py:253-267) is a pure roll/concat.
- The reference asserts batch_size==1 in streaming
  (encoder :276) — removed here: the batch axis carries concurrent streams.
- The chunk-buffering shape arithmetic (reference :279-341) runs on the host;
  all tensor compute is jit-compiled. With a fixed audio chunk size the shape
  signatures cycle through a small set, so compilation is amortized.

State layout (EncoderState): see reference :287-305,410-417.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.config import ModelConfig
from speechcatcher_tpu.ops.layers import (
    Params,
    add_positional_encoding,
    feed_forward,
    onehot_contract,
    init_ffn,
    init_layer_norm,
    init_linear,
    init_mha,
    layer_norm,
    multi_head_attention,
    sinusoidal_pe_table,
)

_CONV_SPECS = {
    "conv2d": ([3, 3], [2, 2]),
    "conv2d6": ([3, 5], [2, 3]),
    "conv2d8": ([3, 3, 3], [2, 2, 2]),
}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def _conv_len(n_in: int, input_layer: str) -> int:
    """Output length of the subsampling stack along one VALID-conv axis
    (time and frequency share kernels/strides). 'linear' keeps length."""
    if input_layer == "linear":
        return n_in
    kernels, strides = _CONV_SPECS[input_layer]
    out = n_in
    for k, s in zip(kernels, strides):
        out = math.floor((out - k) / s + 1)
    return out


def conv_output_feat_dim(input_dim: int, input_layer: str) -> int:
    return _conv_len(input_dim, input_layer)


def init_encoder_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Random-init encoder parameter pytree (checkpoints overwrite this)."""
    keys = jax.random.split(key, 8)
    d = cfg.encoder_dim
    if cfg.input_layer == "linear":
        embed: Dict = {
            "out": init_linear(keys[1], cfg.n_mels, d),
            "norm": init_layer_norm(d),
        }
    else:
        kernels, _ = _CONV_SPECS[cfg.input_layer]
        embed = {"convs": []}
        in_ch = 1
        kc = jax.random.split(keys[0], len(kernels))
        for i, k in enumerate(kernels):
            bound = 1.0 / math.sqrt(in_ch * k * k)
            embed["convs"].append(
                {
                    "weight": jax.random.uniform(
                        kc[i], (d, in_ch, k, k), minval=-bound, maxval=bound
                    ),
                    "bias": jnp.zeros((d,)),
                }
            )
            in_ch = d
        feat = conv_output_feat_dim(cfg.n_mels, cfg.input_layer)
        embed["out"] = init_linear(keys[1], d * feat, d)

    if cfg.encoder_type == "conformer":
        from speechcatcher_tpu.ops.conformer import (
            init_conv_module,
            init_rel_mha,
        )

        def one_layer(k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            return {
                "self_attn": init_rel_mha(k1, d, cfg.encoder_heads),
                "feed_forward": init_ffn(k2, d, cfg.encoder_linear_units),
                "feed_forward_macaron": init_ffn(
                    k3, d, cfg.encoder_linear_units
                ),
                "conv_module": init_conv_module(
                    k4, d, cfg.conformer_kernel_size
                ),
                "norm_ff": init_layer_norm(d),
                "norm_ff_macaron": init_layer_norm(d),
                "norm_mha": init_layer_norm(d),
                "norm_conv": init_layer_norm(d),
                "norm_final": init_layer_norm(d),
            }
    else:

        def one_layer(k):
            k1, k2 = jax.random.split(k)
            return {
                "self_attn": init_mha(k1, d),
                "feed_forward": init_ffn(k2, d, cfg.encoder_linear_units),
                "norm1": init_layer_norm(d),
                "norm2": init_layer_norm(d),
            }

    lkeys = jax.random.split(keys[2], cfg.encoder_layers)
    layers = [one_layer(k) for k in lkeys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    return {
        "embed": embed,
        "layers": stacked,
        "after_norm": init_layer_norm(d),
    }


def encoder_pe_table(cfg: ModelConfig) -> jnp.ndarray:
    """Sinusoidal PE table sized so streaming offsets can never clamp.

    add_positional_encoding's dynamic_slice SATURATES its start index, so
    an offset past the table end would silently reuse the final PE window
    instead of advancing positions. Utterance length is capacity-bounded
    (cfg.max_enc_frames emitted frames; decode/beam_search raises past
    it), so covering max_enc_frames + one block + the ctx row keeps the
    clamp unreachable for every supported stream length."""
    n = max(cfg.pos_enc_max_len,
            cfg.max_enc_frames + cfg.block_size + 2)
    return jnp.asarray(sinusoidal_pe_table(cfg.encoder_dim, n))


# ---------------------------------------------------------------------------
# Subsampling
# ---------------------------------------------------------------------------

def conv2d_subsample(p: Params, x: jnp.ndarray, input_layer: str) -> jnp.ndarray:
    """(B, T, feat) → (B, T', d) (reference model/encoder/subsampling.py:71-106).

    input_layer='linear': Linear → LayerNorm → ReLU per frame, no time
    reduction (reference contextual_block_transformer_encoder.py:81-88 —
    raw nn.LayerNorm there, so eps is torch's 1e-5 default, not the
    ESPnet 1e-12 wrapper; dropout is identity at inference)."""
    if input_layer == "linear":
        from speechcatcher_tpu.ops.layers import linear

        h = layer_norm(p["norm"], linear(p["out"], x), eps=1e-5)
        return jax.nn.relu(h)
    kernels, strides = _CONV_SPECS[input_layer]
    h = x[:, None, :, :]  # NCHW: (B, 1, T, feat)
    for conv, s in zip(p["convs"], strides):
        w = conv["weight"]
        h = jax.lax.conv_general_dilated(
            h.astype(w.dtype) if w.dtype == jnp.bfloat16 else h,
            w,
            window_strides=(s, s),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        h = h + conv["bias"][None, :, None, None]
        h = jax.nn.relu(h)
    b, c, t, f = h.shape
    h = h.transpose(0, 2, 1, 3).reshape(b, t, c * f)
    from speechcatcher_tpu.ops.layers import linear

    return linear(p["out"], h)


def subsampled_len(n_in: int, input_layer: str) -> int:
    return _conv_len(n_in, input_layer)


# ---------------------------------------------------------------------------
# Encoder layer stack (scan over stacked layer params)
# ---------------------------------------------------------------------------

def _attn_ffn(p_layer: Params, h: jnp.ndarray, mask: Optional[jnp.ndarray],
              n_head: int,
              pos_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pre-norm self-attention + FFN block (contextual_block_encoder_layer.py:215-243)."""
    residual = h
    hn = layer_norm(p_layer["norm1"], h)
    h = residual + multi_head_attention(
        p_layer["self_attn"], hn, hn, hn, mask, n_head
    )
    residual = h
    hn = layer_norm(p_layer["norm2"], h)
    return residual + feed_forward(p_layer["feed_forward"], hn)


def _conformer_block(p_layer: Params, h: jnp.ndarray,
                     mask: Optional[jnp.ndarray], n_head: int,
                     pos_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Macaron conformer layer: ½FFN → rel-pos MHSA → conv module → ½FFN →
    final LN (ESPnet conformer layer composition; conv/attention modules per
    the reference convolution.py and multi_head_attention.py:261-378)."""
    from speechcatcher_tpu.ops.conformer import (
        conv_module,
        rel_position_attention,
    )

    residual = h
    hn = layer_norm(p_layer["norm_ff_macaron"], h)
    h = residual + 0.5 * feed_forward(p_layer["feed_forward_macaron"], hn)

    residual = h
    hn = layer_norm(p_layer["norm_mha"], h)
    h = residual + rel_position_attention(
        p_layer["self_attn"], hn, hn, hn, pos_emb, mask, n_head
    )

    residual = h
    hn = layer_norm(p_layer["norm_conv"], h)
    h = residual + conv_module(p_layer["conv_module"], hn)

    residual = h
    hn = layer_norm(p_layer["norm_ff"], h)
    h = residual + 0.5 * feed_forward(p_layer["feed_forward"], hn)

    return layer_norm(p_layer["norm_final"], h)


def apply_layers_infer(
    params: Params,
    xs_chunk: jnp.ndarray,       # (B, bn, bs+2, d)
    mask: jnp.ndarray,           # (bs+2, bs+2) shared static mask
    past_ctx: jnp.ndarray,       # (B, L, d)
    has_past_ctx: jnp.ndarray,   # (B,) bool
    n_head: int,
    last_block: Optional[jnp.ndarray] = None,  # (B,) idx of last VALID block
    layer_kind: str = "transformer",
    pos_emb: Optional[jnp.ndarray] = None,     # (1, bs+2, d) for conformer
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming layer stack with context propagation.

    Returns (ys_chunk (B, bn, bs+2, d), next_ctx (B, L, d)).
    Context semantics per reference contextual_block_encoder_layer.py:253-267.
    `last_block` selects which block's last frame feeds the carried context
    (default: the last one; the batched engine passes per-stream bn-1 when
    trailing blocks are padding).
    """
    b, bn, w, d = xs_chunk.shape
    if last_block is None:
        last_block = jnp.full((b,), bn - 1, jnp.int32)
    layer_fn = _conformer_block if layer_kind == "conformer" else _attn_ffn

    def body(x, layer_in):
        p_layer, past_l = layer_in  # past_l: (B, d)
        h = x.reshape(b * bn, w, d)
        h = layer_fn(p_layer, h, mask, n_head, pos_emb=pos_emb)
        x = h.reshape(b, bn, w, d)
        # Context propagation: block 0 pos 0 ← past ctx (or own last frame on
        # the first chunk); block i pos 0 ← block i-1 last frame.
        first_ctx = jnp.where(has_past_ctx[:, None], past_l, x[:, 0, -1, :])
        shifted = jnp.concatenate([first_ctx[:, None, :], x[:, :-1, -1, :]], axis=1)
        x = x.at[:, :, 0, :].set(shifted)
        # One-hot contraction, not take_along_axis: the index-repeat gather
        # lowers to an element gather that profiled at ~0.9 ms per layer
        # (~16 ms/tick over 18 layers at S=176); the one-hot select of one
        # of bn (1-2) blocks is exact and fuses.
        oh_last = jax.nn.one_hot(last_block, bn, dtype=x.dtype)  # (B, bn)
        next_l = onehot_contract("bnd,bn->bd", x[:, :, -1, :], oh_last)
        return x, next_l

    # scan over layers: past_ctx axis 1 is the layer axis.
    ys, next_ctx = jax.lax.scan(
        body, xs_chunk, (params["layers"], past_ctx.transpose(1, 0, 2))
    )
    return ys, next_ctx.transpose(1, 0, 2)


def apply_layers_train(
    params: Params,
    xs_chunk: jnp.ndarray,  # (B, bn, bs+2, d)
    mask: jnp.ndarray,      # (bs+2, bs+2)
    n_head: int,
    layer_kind: str = "transformer",
    pos_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Training-mode layer stack (contextual_block_encoder_layer.py:92-176).

    Layer l>0 input position 0 of each block is the shifted last-frame output
    of layer l-1 (next_ctx chain); layer 0 keeps the addin context vectors
    placed by the driver.
    """
    b, bn, w, d = xs_chunk.shape
    layer_fn = _conformer_block if layer_kind == "conformer" else _attn_ffn

    def body(carry, p_layer):
        x, ctx, has_ctx = carry
        x = jnp.where(has_ctx, x.at[:, :, 0, :].set(ctx), x)
        h = x.reshape(b * bn, w, d)
        h = layer_fn(p_layer, h, mask, n_head, pos_emb=pos_emb)
        x = h.reshape(b, bn, w, d)
        # next_ctx shift: block 0 ← own last frame; block i ← block i-1.
        ctx = jnp.concatenate([x[:, 0:1, -1, :], x[:, :-1, -1, :]], axis=1)
        return (x, ctx, jnp.bool_(True)), None

    init_ctx = jnp.zeros((b, bn, d), xs_chunk.dtype)
    (ys, _, _), _ = jax.lax.scan(
        body, (xs_chunk, init_ctx, jnp.bool_(False)), params["layers"]
    )
    return ys


def apply_layers_plain(
    params: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray], n_head: int,
    layer_kind: str = "transformer", pos_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Layer stack without blocking/context (short-utterance path,
    reference encoder :530-536)."""
    layer_fn = _conformer_block if layer_kind == "conformer" else _attn_ffn

    def body(h, p_layer):
        return layer_fn(p_layer, h, mask, n_head, pos_emb=pos_emb), None

    ys, _ = jax.lax.scan(body, x, params["layers"])
    return ys


def block_attention_mask(block_size: int) -> np.ndarray:
    """(bs+2, bs+2) mask: rows 1..bs+1 attend cols 0..bs (encoder :524-528)."""
    m = np.zeros((block_size + 2, block_size + 2), dtype=np.float32)
    m[1 : block_size + 2, 0 : block_size + 1] = 1.0
    return m


# ---------------------------------------------------------------------------
# Block assembly + output extraction (jitted cores)
# ---------------------------------------------------------------------------

def _build_blocks(
    xs: jnp.ndarray,          # (B, T, d) subsampled features
    pe: jnp.ndarray,          # PE table
    prev_addin: jnp.ndarray,  # (B, 1, d)
    has_prev: jnp.ndarray,    # (B,) bool
    npb: jnp.ndarray,         # scalar int32: n_processed_blocks
    total_frame_num: int,     # static: frame count BEFORE narrowing
    block_num: int,           # static
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble (B, block_num, bs+2, d) chunks (reference encoder :353-380).

    Returns (xs_chunk, new_prev_addin).
    """
    b, t, d = xs.shape
    bs, hop = cfg.block_size, cfg.hop_size
    chunks: List[jnp.ndarray] = []
    addins: List[jnp.ndarray] = []
    for i in range(block_num):
        cur_hop = i * hop
        cl = min(bs, total_frame_num - cur_hop)
        chunk_data = xs[:, cur_hop : cur_hop + cl, :]
        if cfg.init_average:
            addin = jnp.mean(chunk_data, axis=1, keepdims=True)
        else:
            addin = jnp.max(chunk_data, axis=1, keepdims=True)
        if cfg.ctx_pos_enc:
            addin = add_positional_encoding(addin, pe, npb + i)
        addins.append(addin)
        chunk = add_positional_encoding(chunk_data, pe, cur_hop + hop * npb)
        if cl < bs:
            chunk = jnp.pad(chunk, ((0, 0), (0, bs - cl), (0, 0)))
        chunks.append(chunk)

    first_prev = jnp.where(has_prev[:, None, None], prev_addin, addins[0])
    prev_list = [first_prev] + addins[:-1]
    xs_chunk = jnp.stack(
        [
            jnp.concatenate([prev_list[i], chunks[i], addins[i]], axis=1)
            for i in range(block_num)
        ],
        axis=1,
    )  # (B, bn, bs+2, d)
    return xs_chunk, addins[-1]


def _extract_infer(
    ys_chunk: jnp.ndarray,  # (B, bn, bs, d) — context slots already dropped
    cfg: ModelConfig,
    first_chunk: bool,      # static: n_processed_blocks == 0
    is_final: bool,         # static
    y_length: int,          # static
) -> jnp.ndarray:
    """Emit-window extraction (reference encoder :500-522)."""
    bs, hop, la = cfg.block_size, cfg.hop_size, cfg.look_ahead
    offset = bs - la - hop
    bn = ys_chunk.shape[1]
    pieces: List[jnp.ndarray] = []
    emitted = 0
    if first_chunk:
        pieces.append(ys_chunk[:, 0, 0:offset, :])
        emitted = offset
    for i in range(bn):
        if i == bn - 1 and is_final:
            cl = min(bs - offset, y_length - emitted)
        else:
            cl = hop
        cl = max(cl, 0)
        if cl:
            pieces.append(ys_chunk[:, i, offset : offset + cl, :])
            emitted += cl
    ys = jnp.concatenate(pieces, axis=1)
    assert ys.shape[1] == y_length, (ys.shape, y_length)
    return ys


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "total_frame_num", "block_num", "first_chunk",
                     "is_final", "y_length"),
)
def _infer_core(
    params: Params,
    pe: jnp.ndarray,
    xs: jnp.ndarray,          # (B, T, d) subsampled frames incl. carry buffer
    prev_addin: jnp.ndarray,
    has_prev: jnp.ndarray,
    past_ctx: jnp.ndarray,
    has_past_ctx: jnp.ndarray,
    npb: jnp.ndarray,
    cfg: ModelConfig,
    total_frame_num: int,
    block_num: int,
    first_chunk: bool,
    is_final: bool,
    y_length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One streaming encoder step over assembled blocks (jit-compiled)."""
    xs_chunk, new_prev_addin = _build_blocks(
        xs, pe, prev_addin, has_prev, npb, total_frame_num, block_num, cfg
    )
    mask = jnp.asarray(block_attention_mask(cfg.block_size))
    pos_emb = pe[None, : cfg.block_size + 2, :]
    ys_chunk, next_ctx = apply_layers_infer(
        params, xs_chunk, mask, past_ctx, has_past_ctx, cfg.encoder_heads,
        layer_kind=cfg.encoder_type, pos_emb=pos_emb,
    )
    ys_chunk = ys_chunk[:, :, 1 : cfg.block_size + 1, :]
    ys = _extract_infer(ys_chunk, cfg, first_chunk, is_final, y_length)
    if cfg.normalize_before:
        ys = layer_norm(params["after_norm"], ys)
    return ys, new_prev_addin, next_ctx


@functools.partial(jax.jit, static_argnames=("cfg",))
def _infer_short(params: Params, pe: jnp.ndarray, xs: jnp.ndarray,
                 cfg: ModelConfig) -> jnp.ndarray:
    """Short-segment path: whole segment, no blocking, no mask
    (reference encoder :345-351)."""
    x = add_positional_encoding(xs, pe, jnp.int32(0))
    x = apply_layers_plain(
        params, x, None, cfg.encoder_heads, layer_kind=cfg.encoder_type,
        pos_emb=pe[None, : xs.shape[1], :],
    )
    if cfg.normalize_before:
        x = layer_norm(params["after_norm"], x)
    return x


@functools.partial(jax.jit, static_argnames=("input_layer",))
def _subsample_jit(p_embed: Params, x: jnp.ndarray, input_layer: str) -> jnp.ndarray:
    return conv2d_subsample(p_embed, x, input_layer)


# ---------------------------------------------------------------------------
# Streaming state + host-orchestrated chunk step
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EncoderState:
    """Streaming carry, one entry per reference state field (encoder :287-305).

    Uniform across the batch: all streams in one EncoderState share chunk
    cadence (the per-tick batching contract of the serving engine).
    """

    prev_addin: Optional[jnp.ndarray] = None        # (B, 1, d)
    buf_before: Optional[jnp.ndarray] = None        # (B, t0, n_mels)
    buf_after: Optional[jnp.ndarray] = None         # (B, t1, d)
    n_processed_blocks: int = 0
    past_ctx: Optional[jnp.ndarray] = None          # (B, L, d)


class StreamingEncoder:
    """Functional driver replicating forward_infer (reference encoder :241-419)."""

    def __init__(self, params: Params, cfg: ModelConfig,
                 pe_table: Optional[jnp.ndarray] = None):
        self.params = params
        self.cfg = cfg
        self.pe = pe_table if pe_table is not None else encoder_pe_table(cfg)

    def init_state(self) -> EncoderState:
        return EncoderState()

    def step(
        self,
        feats: jnp.ndarray,  # (B, T, n_mels)
        state: EncoderState,
        is_final: bool,
    ) -> Tuple[jnp.ndarray, Optional[EncoderState]]:
        """One streaming chunk → (encoder_out (B, T', d), next_state).

        Returns a zero-length output when buffering (reference :289-298,
        :325-335). next_state is None after the final chunk.
        """
        cfg = self.cfg
        b = feats.shape[0]
        d = cfg.encoder_dim
        sub = cfg.subsample

        xs = feats
        if state.buf_before is not None:
            xs = jnp.concatenate([state.buf_before, xs], axis=1)

        buf_before = None
        if not is_final:
            n_samples = xs.shape[1] // sub - 1
            if n_samples < 2:
                new_state = dataclasses.replace(state, buf_before=xs)
                return jnp.zeros((b, 0, d)), new_state
            n_res = xs.shape[1] % sub + sub * 2
            buf_before = xs[:, xs.shape[1] - n_res :, :]
            xs = xs[:, : n_samples * sub, :]

        if subsampled_len(xs.shape[1], cfg.input_layer) > 0:
            xs = _subsample_jit(self.params["embed"], xs, cfg.input_layer)
        else:
            # Final flush with a sub-kernel-size tail: the conv would have
            # a negative output dimension — nothing new to subsample.
            xs = jnp.zeros((b, 0, d))

        if state.buf_after is not None:
            xs = jnp.concatenate([state.buf_after, xs], axis=1)

        total_frame_num = xs.shape[1]
        past_size = cfg.block_size - cfg.hop_size - cfg.look_ahead

        buf_after = None
        if is_final:
            if total_frame_num == 0:
                # Pure flush of a state with no carried frames: nothing to
                # emit (degenerate; the decode drain handles the rest).
                return jnp.zeros((b, 0, d)), None
            block_num = math.ceil(
                float(total_frame_num - past_size - cfg.look_ahead)
                / float(cfg.hop_size)
            )
        else:
            if total_frame_num <= cfg.block_size:
                new_state = dataclasses.replace(
                    state, buf_before=buf_before, buf_after=xs
                )
                return jnp.zeros((b, 0, d)), new_state
            overlap = cfg.block_size - cfg.hop_size
            block_num = max(0, xs.shape[1] - overlap) // cfg.hop_size
            res = xs.shape[1] - cfg.hop_size * block_num
            buf_after = xs[:, xs.shape[1] - res :, :]
            xs = xs[:, : block_num * cfg.hop_size + overlap, :]

        npb = state.n_processed_blocks
        if npb == 0 and total_frame_num <= cfg.block_size and is_final:
            return _infer_short(self.params, self.pe, xs, cfg), None

        # Guard degenerate finals (tiny residual): cover with one block.
        block_num = max(block_num, 1)

        offset = cfg.block_size - cfg.look_ahead - cfg.hop_size
        if is_final:
            y_length = xs.shape[1] if npb == 0 else xs.shape[1] - offset
        else:
            y_length = block_num * cfg.hop_size
            if npb == 0:
                y_length += offset

        prev_addin = (
            state.prev_addin
            if state.prev_addin is not None
            else jnp.zeros((b, 1, d))
        )
        has_prev = jnp.full((b,), state.prev_addin is not None)
        past_ctx = (
            state.past_ctx
            if state.past_ctx is not None
            else jnp.zeros((b, cfg.encoder_layers, d))
        )
        has_past = jnp.full((b,), state.past_ctx is not None)

        ys, new_prev_addin, next_ctx = _infer_core(
            self.params,
            self.pe,
            xs,
            prev_addin,
            has_prev,
            past_ctx,
            has_past,
            jnp.int32(npb),
            cfg,
            total_frame_num,
            block_num,
            npb == 0,
            is_final,
            y_length,
        )

        if is_final:
            return ys, None
        new_state = EncoderState(
            prev_addin=new_prev_addin,
            buf_before=buf_before,
            buf_after=buf_after,
            n_processed_blocks=npb + block_num,
            past_ctx=next_ctx,
        )
        return ys, new_state


# ---------------------------------------------------------------------------
# Whole-utterance (training-mode) forward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def encoder_forward_train(
    params: Params,
    feats: jnp.ndarray,   # (B, T, n_mels)
    ilens: jnp.ndarray,   # (B,)
    cfg: ModelConfig,
    pe: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-utterance block-simulated forward (reference encoder :169-239).

    Returns (ys (B, T', d), olens (B,)).
    """
    if pe is None:
        pe = encoder_pe_table(cfg)
    b = feats.shape[0]
    xs = conv2d_subsample(params["embed"], feats, cfg.input_layer)
    # Mask subsampling (reference subsampling.py:101-105).
    if cfg.input_layer == "linear":
        olens = ilens
    else:
        kernels, strides = _CONV_SPECS[cfg.input_layer]
        lens = ilens
        for k, s in zip(kernels, strides):
            lens = (lens - k) // s + 1
        olens = lens

    total = xs.shape[1]
    bs, hop, la = cfg.block_size, cfg.hop_size, cfg.look_ahead
    past_size = bs - hop - la

    if total <= bs:
        x = add_positional_encoding(xs, pe, jnp.int32(0))
        pad_mask = (
            jnp.arange(total)[None, :] < olens[:, None]
        ).astype(jnp.float32)[:, None, :]
        x = apply_layers_plain(
            params, x, pad_mask, cfg.encoder_heads,
            layer_kind=cfg.encoder_type, pos_emb=pe[None, :total, :],
        )
        if cfg.normalize_before:
            x = layer_norm(params["after_norm"], x)
        return x, olens

    block_num = math.ceil(float(total - past_size - la) / float(hop))

    # Context vectors per block (reference encoder :430-446).
    addins = []
    for i in range(block_num):
        cl = min(bs, total - i * hop)
        chunk = xs[:, i * hop : i * hop + cl, :]
        a = jnp.mean(chunk, axis=1) if cfg.init_average else jnp.max(chunk, axis=1)
        addins.append(a)
    addin = jnp.stack(addins, axis=1)  # (B, bn, d)
    if cfg.ctx_pos_enc:
        addin = add_positional_encoding(addin, pe, jnp.int32(0))
    xs_pe = add_positional_encoding(xs, pe, jnp.int32(0))

    # Assemble chunks (reference encoder :448-474).
    chunks = []
    for i in range(block_num):
        cl = min(bs, total - i * hop)
        c = xs_pe[:, i * hop : i * hop + cl, :]
        if cl < bs:
            c = jnp.pad(c, ((0, 0), (0, bs - cl), (0, 0)))
        chunks.append(c)
    prev = jnp.concatenate([addin[:, 0:1], addin[:, : block_num - 1]], axis=1)
    xs_chunk = jnp.stack(
        [
            jnp.concatenate(
                [prev[:, i : i + 1], chunks[i], addin[:, i : i + 1]], axis=1
            )
            for i in range(block_num)
        ],
        axis=1,
    )

    mask = jnp.asarray(block_attention_mask(bs))
    ys_chunk = apply_layers_train(
        params, xs_chunk, mask, cfg.encoder_heads,
        layer_kind=cfg.encoder_type, pos_emb=pe[None, : bs + 2, :],
    )
    ys_chunk = ys_chunk[:, :, 1:, :]  # drop prev-ctx slot (train offset +1)

    # Extraction (reference encoder :476-498), on post-slice frame indexing.
    offset = bs - la - hop
    pieces = [ys_chunk[:, 0, 0 : bs - la, :]]
    emitted = bs - la
    for i in range(1, block_num - 1):
        pieces.append(ys_chunk[:, i, offset : offset + hop, :])
        emitted += hop
    if block_num > 1:
        last = total - emitted
        pieces.append(ys_chunk[:, block_num - 1, offset : offset + last, :])
    ys = jnp.concatenate(pieces, axis=1)

    if cfg.normalize_before:
        ys = layer_norm(params["after_norm"], ys)
    return ys, olens
