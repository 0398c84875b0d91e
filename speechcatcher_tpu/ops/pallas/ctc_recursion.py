"""Pallas kernel: CTC prefix forward recursion, sequential in VMEM.

The recursion (reference ctc_prefix_score_full.py:229-246)

    r_n[t] = lse(r_n[t-1], phi[t-1]) + x_n[t]
    r_b[t] = lse(r_n[t-1], r_b[t-1]) + x_b[t]

is inherently sequential over frames. The XLA expression as a log-semiring
associative scan is O(log T) depth but materializes (…,3,3,T) matrices and
does ~27 logsumexps per combine; this kernel instead runs the exact
recursion with the whole (T, lanes) plane resident in VMEM — per step it is
two fused VPU ops over a 128-lane row, so 1024 frames cost ~1024 tiny steps
with zero HBM traffic.

Layout: hypotheses on the lane (minor) axis, time on the sublane axis.
Inputs are (T, N) planes per grid tile of N=128 hypotheses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGZERO = -1.0e10
LANES = 128


def _kernel(start_ref, end_ref, olen0_ref, xn_ref, xb_ref, phi_ref, r_ref):
    """One tile: xn/xb/phi (T, N) → r (2, T, N).

    start/end/olen0: (1, N) int32/float32 rows in VMEM.
    phi here is ALREADY shifted (phi_ref[t] = phi[t-1], LOGZERO at t=0).
    olen0: 1.0 where output_length == 0 (enables the r_n[0] = x_n[0] init).
    """
    t_cap = xn_ref.shape[0]
    start = start_ref[0, :]                       # (N,) int32
    end = end_ref[0, :]
    olen0 = olen0_ref[0, :]                       # (N,) float32 0/1

    # Initial "stored" values for t < start: logzero except r_n[0] when
    # olen == 0 (reference :179-188).
    init_rn0 = jnp.where(olen0 > 0.5, xn_ref[0, :], LOGZERO)

    def body(t, carry):
        rn_prev, rb_prev = carry                  # (N,), (N,)
        in_rec = (t >= start) & (t < end)

        # lse over two operands, numerically safe with LOGZERO sentinels.
        def lse2(a, b):
            mx = jnp.maximum(a, b)
            mn = jnp.minimum(a, b)
            return mx + jnp.log1p(jnp.exp(jnp.maximum(mn - mx, -30.0)))

        rn_rec = lse2(rn_prev, phi_ref[t, :]) + xn_ref[t, :]
        rb_rec = lse2(rn_prev, rb_prev) + xb_ref[t, :]

        init_rn = jnp.where((t == 0) & (olen0 > 0.5), init_rn0, LOGZERO)
        rn = jnp.where(in_rec, rn_rec, init_rn)
        rb = jnp.where(in_rec, rb_rec, LOGZERO)

        r_ref[0, t, :] = rn
        r_ref[1, t, :] = rb
        return (rn, rb)

    zeros = jnp.full((xn_ref.shape[1],), LOGZERO, jnp.float32)
    jax.lax.fori_loop(0, t_cap, body, (zeros, zeros))


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_forward_recursion(
    xn: jnp.ndarray,      # (T, N) candidate-token log-probs per frame
    xb: jnp.ndarray,      # (T, N) blank log-probs per frame
    phi_shift: jnp.ndarray,  # (T, N) phi[t-1] (LOGZERO at t=0)
    start: jnp.ndarray,   # (N,) int32 first recursion frame
    end: jnp.ndarray,     # (N,) int32 one past the last frame
    olen0: jnp.ndarray,   # (N,) float32 1.0 where output_length == 0
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns r (2, T, N): [r_n, r_b] trajectories."""
    t_cap, n = xn.shape
    assert n % LANES == 0, f"pad hypothesis axis to {LANES}: {n}"
    grid = (n // LANES,)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_cap, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_cap, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_cap, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, t_cap, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, t_cap, n), jnp.float32),
        interpret=interpret,
    )(
        start[None, :].astype(jnp.int32),
        end[None, :].astype(jnp.int32),
        olen0[None, :].astype(jnp.float32),
        xn.astype(jnp.float32),
        xb.astype(jnp.float32),
        phi_shift.astype(jnp.float32),
    )
