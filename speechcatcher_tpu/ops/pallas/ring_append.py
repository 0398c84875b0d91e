"""Pallas ring-append: write a per-stream span of new rows into a large
ring buffer IN PLACE, touching only the written window.

The serving engine appends each round's newly visible encoder frames into
two per-stream rings: the cross-attention K/V cache (L, S, Tmax, d) and
the CTC log-prob ring (S, V, Tcap). Streams sit at different fill levels,
so the write offset is per-stream and dynamic. The XLA-expressible
formulations all rewrite the ENTIRE ring per append:

- one-hot contraction (`cache*keep + einsum(new, onehot)`): 3 full-ring
  passes — measured 16.1 ms/append at the flagship serving shape
  (6,288,768,512) bf16 on v5e, ~20 ms/tick in the xplane profile;
- `.at[rows].set(..., mode="drop")` scatter: 18.7 ms (TPU scatters
  serialize);
- fori_loop of per-stream dynamic_update_slice: 9.1 ms (loop overhead).

This kernel makes the append cost proportional to the WRITTEN rows: the
ring aliases in/out (`input_output_aliases`), the grid walks (stream,
window) pairs, and each step reads+writes only the BT-row blocks the
span [start_s, start_s + n_s) overlaps — 0.2 ms at the same shape, ~80x
less traffic. Scalar-prefetched offsets drive the BlockSpec index_map
(the DMA engine needs them before the body runs).

No reference counterpart: the reference keeps per-utterance Python state
and concatenates tensors per chunk (e.g. extend_prob at
/root/reference/speechcatcher/beam_search/ctc_prefix_score_full.py:293-324);
fixed-capacity device rings with in-place appends are the TPU-native
replacement for that growth.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def ring_append_enabled() -> bool:
    """Kernel eligibility gate for the engine call sites: real TPUs, or
    any backend with SC_RING_APPEND_INTERPRET=1 — the interpret-mode
    escape hatch lets CPU tests drive the REAL call-site wiring (offset
    arithmetic, axis swaps, dtype casts, capacity rounding) through the
    kernel instead of only unit-testing it in isolation."""
    if os.environ.get("SC_RING_APPEND_INTERPRET"):
        return True
    from speechcatcher_tpu.ops.pallas.block_attention import use_pallas

    return use_pallas()


def ring_append_interpret() -> bool:
    """True when call sites should pass interpret=True (CPU test mode)."""
    return bool(os.environ.get("SC_RING_APPEND_INTERPRET"))


def _append_rows_kernel(T, BT, TN, start_ref, n_ref, new_ref, cache_ref,
                        out_ref):
    """One (stream, window) step: out block = cache block with the rows
    covered by [start, start+n) replaced by the matching new rows."""
    s = pl.program_id(0)
    j = pl.program_id(1)
    start = start_ref[s]
    n = jnp.minimum(n_ref[s], TN)
    # The actual block this step landed on (index_map clamps at the ring
    # end; recomputing bt the same way keeps t-coordinates consistent —
    # a clamped duplicate window then just rewrites identical values).
    bt = jnp.minimum(start // BT + j, T // BT - 1)
    t0 = bt * BT
    # Shift the padded new rows so shifted[r] = new[t0 + r - start]:
    # buf[i] = new[i - BT] (BT zero rows on both sides), rolled so buf
    # row (r + BT + t0 - start) lands at r; valid rows never read the
    # roll's wraparound (their buf index is in [BT, BT+TN)), and invalid
    # rows are masked below. pltpu.roll takes a dynamic shift —
    # lax.dynamic_slice has no Mosaic lowering.
    from jax.experimental.pallas import tpu as pltpu

    zeros = jnp.zeros(
        (new_ref.shape[0], 1, BT, new_ref.shape[3]), new_ref.dtype
    )
    buf = jnp.concatenate([zeros, new_ref[...], zeros], axis=2)
    shift = jnp.mod(start - t0 - BT, buf.shape[2])
    # Mosaic's dynamic rotate handles 32-bit data only; round-trip
    # narrower dtypes through f32 (a few-KB VMEM value, cost is noise).
    if buf.dtype.itemsize < 4:
        shifted = pltpu.roll(buf.astype(jnp.float32), shift, axis=2)[
            :, :, :BT, :
        ].astype(buf.dtype)
    else:
        shifted = pltpu.roll(buf, shift, axis=2)[:, :, :BT, :]
    idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, BT, 1), 2) - start
    valid = (idx >= 0) & (idx < n)
    out_ref[...] = jnp.where(valid, shifted, cache_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0,))
def ring_append_rows(
    cache: jnp.ndarray,   # (L, S, T, D) — donated by callers
    new: jnp.ndarray,     # (L, S, TN, D) new rows (garbage past n_new)
    start: jnp.ndarray,   # (S,) int32 write offset per stream
    n_new: jnp.ndarray,   # (S,) int32 valid new rows per stream
    interpret: bool = False,
) -> jnp.ndarray:
    """cache[l, s, start[s]+i, :] = new[l, s, i, :] for i < n_new[s].

    Rows falling outside [0, T) are dropped. start must satisfy
    start + n_new <= T (engine rings guarantee this; offsets are clipped
    defensively). Only the touched BT-row windows move through VMEM."""
    from jax.experimental.pallas import tpu as pltpu

    L, S, T, D = cache.shape
    # 64-row windows: a 40-row append spans ≤2 of them at any alignment,
    # and grid-step overhead (~5 µs/step) dominates traffic here — fewer,
    # fatter steps win over tighter windows.
    BT = 64
    assert T % BT == 0, f"ring length {T} not a multiple of {BT}"
    TN = new.shape[2]
    tn_pad = -(-TN // BT) * BT
    if tn_pad != TN:
        new = jnp.pad(new, ((0, 0), (0, 0), (0, tn_pad - TN), (0, 0)))
    n_windows = tn_pad // BT + 1
    start = jnp.clip(start.astype(jnp.int32), 0, T - 1)
    n_new = n_new.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, n_windows),
        in_specs=[
            pl.BlockSpec((L, 1, tn_pad, D),
                         lambda s, j, st, nn: (0, s, 0, 0)),
            pl.BlockSpec(
                (L, 1, BT, D),
                lambda s, j, st, nn: (
                    0, s, jnp.minimum(st[s] // BT + j, T // BT - 1), 0
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (L, 1, BT, D),
            lambda s, j, st, nn: (
                0, s, jnp.minimum(st[s] // BT + j, T // BT - 1), 0
            ),
        ),
    )
    kernel = functools.partial(_append_rows_kernel, T, BT, TN)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # cache (after 2 scalar-prefetch args)
        interpret=interpret,
    )(start, n_new, new.astype(cache.dtype), cache)


def _append_cols_kernel(T, BT, TN, start_ref, n_ref, new_ref, ring_ref,
                        out_ref):
    """Column variant: the span lives on the LAST (lane) axis."""
    s = pl.program_id(0)
    j = pl.program_id(1)
    start = start_ref[s]
    n = jnp.minimum(n_ref[s], TN)
    bt = jnp.minimum(start // BT + j, T // BT - 1)
    t0 = bt * BT
    from jax.experimental.pallas import tpu as pltpu

    zeros = jnp.zeros((1, new_ref.shape[1], BT), new_ref.dtype)
    buf = jnp.concatenate([zeros, new_ref[...], zeros], axis=2)
    shift = jnp.mod(start - t0 - BT, buf.shape[2])
    if buf.dtype.itemsize < 4:
        shifted = pltpu.roll(buf.astype(jnp.float32), shift, axis=2)[
            :, :, :BT
        ].astype(buf.dtype)
    else:
        shifted = pltpu.roll(buf, shift, axis=2)[:, :, :BT]
    idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, BT), 2) - start
    valid = (idx >= 0) & (idx < n)
    out_ref[...] = jnp.where(valid, shifted, ring_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0,))
def ring_append_cols(
    ring: jnp.ndarray,    # (S, V, T) — donated by callers
    new: jnp.ndarray,     # (S, V, TN) new columns (garbage past n_new)
    start: jnp.ndarray,   # (S,) int32 write offset per stream
    n_new: jnp.ndarray,   # (S,) int32 valid new columns per stream
    interpret: bool = False,
) -> jnp.ndarray:
    """ring[s, :, start[s]+i] = new[s, :, i] for i < n_new[s] (drop OOB).

    Time-minor twin of ring_append_rows for the CTC log-prob ring, whose
    layout keeps time on lanes so candidate gathers are contiguous."""
    from jax.experimental.pallas import tpu as pltpu

    S, V, T = ring.shape
    BT = 128  # lane-axis windows: one full lane tile
    assert T % BT == 0, f"ring length {T} not a multiple of {BT}"
    TN = new.shape[2]
    tn_pad = -(-TN // BT) * BT
    if tn_pad != TN:
        new = jnp.pad(new, ((0, 0), (0, 0), (0, tn_pad - TN)))
    n_windows = tn_pad // BT + 1
    start = jnp.clip(start.astype(jnp.int32), 0, T - 1)
    n_new = n_new.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, n_windows),
        in_specs=[
            pl.BlockSpec((1, V, tn_pad), lambda s, j, st, nn: (s, 0, 0)),
            pl.BlockSpec(
                (1, V, BT),
                lambda s, j, st, nn: (
                    s, 0, jnp.minimum(st[s] // BT + j, T // BT - 1)
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, V, BT),
            lambda s, j, st, nn: (
                s, 0, jnp.minimum(st[s] // BT + j, T // BT - 1)
            ),
        ),
    )
    kernel = functools.partial(_append_cols_kernel, T, BT, TN)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(ring.shape, ring.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        interpret=interpret,
    )(start, n_new, new.astype(ring.dtype), ring)
