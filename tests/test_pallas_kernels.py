"""Pallas kernel correctness (interpret mode on CPU): the in-VMEM CTC
forward recursion must match a straightforward numpy recursion."""

import numpy as np

import jax.numpy as jnp

from speechcatcher_tpu.decode.ctc_prefix import LOGZERO
from speechcatcher_tpu.ops.pallas.ctc_recursion import (
    LANES,
    ctc_forward_recursion,
)


def _numpy_recursion(xn, xb, phi_shift, start, end, olen0):
    t_cap, n = xn.shape
    r = np.full((2, t_cap, n), LOGZERO, np.float64)

    def lse2(a, b):
        mx = np.maximum(a, b)
        mn = np.minimum(a, b)
        return mx + np.log1p(np.exp(np.maximum(mn - mx, -30.0)))

    rn = np.full(n, LOGZERO)
    rb = np.full(n, LOGZERO)
    for t in range(t_cap):
        in_rec = (t >= start) & (t < end)
        rn_rec = lse2(rn, phi_shift[t]) + xn[t]
        rb_rec = lse2(rn, rb) + xb[t]
        init_rn = np.where((t == 0) & (olen0 > 0.5), xn[0], LOGZERO)
        rn = np.where(in_rec, rn_rec, init_rn)
        rb = np.where(in_rec, rb_rec, LOGZERO)
        r[0, t] = rn
        r[1, t] = rb
    return r


def test_ctc_recursion_kernel_matches_numpy():
    rng = np.random.RandomState(0)
    t_cap, n = 32, LANES
    xn = np.log(rng.rand(t_cap, n).astype(np.float32) + 1e-3)
    xb = np.log(rng.rand(t_cap, n).astype(np.float32) + 1e-3)
    phi = np.log(rng.rand(t_cap, n).astype(np.float32) + 1e-3) * 3
    phi[0] = LOGZERO
    start = rng.randint(1, 5, size=n).astype(np.int32)
    end = rng.randint(8, t_cap, size=n).astype(np.int32)
    olen0 = (start == 1).astype(np.float32)

    ref = _numpy_recursion(xn, xb, phi, start, end, olen0)
    out = np.asarray(
        ctc_forward_recursion(
            jnp.asarray(xn), jnp.asarray(xb), jnp.asarray(phi),
            jnp.asarray(start), jnp.asarray(end), jnp.asarray(olen0),
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_ctc_recursion_kernel_multi_tile():
    rng = np.random.RandomState(1)
    t_cap, n = 16, 2 * LANES
    xn = np.log(rng.rand(t_cap, n).astype(np.float32) + 1e-3)
    xb = np.log(rng.rand(t_cap, n).astype(np.float32) + 1e-3)
    phi = np.full((t_cap, n), LOGZERO, np.float32)
    phi[1:] = np.log(rng.rand(t_cap - 1, n).astype(np.float32) + 1e-3)
    start = np.ones(n, np.int32)
    end = np.full(n, t_cap, np.int32)
    olen0 = np.ones(n, np.float32)

    ref = _numpy_recursion(xn, xb, phi, start, end, olen0)
    out = np.asarray(
        ctc_forward_recursion(
            jnp.asarray(xn), jnp.asarray(xb), jnp.asarray(phi),
            jnp.asarray(start), jnp.asarray(end), jnp.asarray(olen0),
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_block_attention_kernel_matches_xla():
    """Pallas fused block attention (interpret mode on CPU) must equal the
    XLA scaled_dot_attention with the same mask semantics, including the
    zero-filled fully-masked row (row 0 of the block mask)."""
    import numpy as np

    from speechcatcher_tpu.models.encoder import block_attention_mask
    from speechcatcher_tpu.ops.layers import scaled_dot_attention
    from speechcatcher_tpu.ops.pallas.block_attention import block_attention

    rng = np.random.RandomState(3)
    n, h, w, dk = 11, 4, 42, 16  # n deliberately not a multiple of TN
    q = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    mask = jnp.asarray(block_attention_mask(w - 2))

    ours = block_attention(q, k, v, mask, interpret=True)
    ref = scaled_dot_attention(q, k, v, mask[None, None, :, :])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # Fully-masked query row (row 0) must be exactly zero.
    assert np.all(np.asarray(ours)[:, :, 0, :] == 0.0)


def test_rel_block_attention_kernel_matches_xla():
    """Pallas fused rel-pos block attention (interpret mode on CPU) must
    equal the XLA rel_position_attention path: same pos_bias_u/v content/
    position score split, same legacy rel_shift, same mask semantics."""
    import numpy as np

    import os

    from speechcatcher_tpu.models.encoder import block_attention_mask
    from speechcatcher_tpu.ops.conformer import (
        init_rel_mha,
        rel_position_attention,
    )
    from speechcatcher_tpu.ops.layers import linear
    from speechcatcher_tpu.ops.pallas.rel_attention import rel_block_attention

    import jax

    rng = np.random.RandomState(7)
    n, h, w = 11, 4, 42  # n deliberately not a multiple of TN
    d = 64
    dk = d // h
    p = init_rel_mha(jax.random.PRNGKey(0), d, h)
    x = jnp.asarray(rng.randn(n, w, d).astype(np.float32))
    pos_emb = jnp.asarray(rng.randn(1, w, d).astype(np.float32))
    mask = jnp.asarray(block_attention_mask(w - 2))

    # XLA reference (the non-Pallas path of rel_position_attention).
    os.environ["SPEECHCATCHER_NO_PALLAS"] = "1"
    try:
        ref = rel_position_attention(p, x, x, x, pos_emb, mask, h)
    finally:
        del os.environ["SPEECHCATCHER_NO_PALLAS"]

    # Kernel operates post-projection: replicate the projections here.
    def proj(name):
        y = linear(p[name], x)
        return y.reshape(n, w, h, dk).transpose(0, 2, 1, 3)

    q, k, v = proj("linear_q"), proj("linear_k"), proj("linear_v")
    pos = linear(p["linear_pos"], pos_emb)
    pos = pos.reshape(1, w, h, dk).transpose(0, 2, 1, 3)[0]
    out = rel_block_attention(
        q, k, v, pos, p["pos_bias_u"], p["pos_bias_v"], mask, interpret=True
    )
    out = out.transpose(0, 2, 1, 3).reshape(n, w, d)
    ours = linear(p["linear_out"], out)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_block_attention_grad_matches_xla():
    """The kernel's custom VJP (XLA rematerialization backward) must give
    the same q/k/v gradients as differentiating the plain XLA attention —
    the training path hits this on real TPUs (pallas_call itself has no
    autodiff rule)."""
    import jax

    from speechcatcher_tpu.models.encoder import block_attention_mask
    from speechcatcher_tpu.ops.layers import scaled_dot_attention
    from speechcatcher_tpu.ops.pallas.block_attention import block_attention

    rng = np.random.RandomState(13)
    n, h, w, dk = 3, 2, 10, 8
    q = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    mask = jnp.asarray(block_attention_mask(w - 2))

    def loss_kernel(q, k, v):
        return jnp.sum(block_attention(q, k, v, mask, interpret=True) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(
            scaled_dot_attention(q, k, v, mask[None, None, :, :]) * cot
        )

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_kernel, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_rel_block_attention_grad_matches_xla():
    """Custom-VJP gradients through the fused rel-pos kernel — including
    the trainable pos/bias_u/bias_v cotangents — must match differentiating
    an independently assembled XLA rel-attention (same math as the
    conformer module's non-Pallas path at tq == tk, shared pos table)."""
    import math

    import jax

    from speechcatcher_tpu.models.encoder import block_attention_mask
    from speechcatcher_tpu.ops.conformer import rel_shift
    from speechcatcher_tpu.ops.layers import MASK_MIN
    from speechcatcher_tpu.ops.pallas.rel_attention import rel_block_attention

    rng = np.random.RandomState(17)
    n, h, w, dk = 3, 2, 10, 8
    q = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    pos = jnp.asarray(rng.randn(h, w, dk).astype(np.float32))
    bu = jnp.asarray(rng.randn(h, dk).astype(np.float32))
    bv = jnp.asarray(rng.randn(h, dk).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, h, w, dk).astype(np.float32))
    mask = jnp.asarray(block_attention_mask(w - 2))

    def xla_rel_attention(q, k, v, pos, bu, bv):
        ac = jnp.einsum("nhqd,nhkd->nhqk", q + bu[None, :, None, :], k)
        bd = rel_shift(
            jnp.einsum("nhqd,hkd->nhqk", q + bv[None, :, None, :], pos)
        )
        scores = (ac + bd) / math.sqrt(dk)
        keep = mask != 0
        scores = jnp.where(keep[None, None], scores, MASK_MIN)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(keep[None, None], attn, 0.0)
        return jnp.einsum("nhqk,nhkd->nhqd", attn, v)

    args = (q, k, v, pos, bu, bv)

    def loss_kernel(*a):
        return jnp.sum(rel_block_attention(*a, mask, interpret=True) * cot)

    def loss_xla(*a):
        return jnp.sum(xla_rel_attention(*a) * cot)

    g_kernel = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(6)))(*args)
    for a, b, name in zip(g_kernel, g_xla,
                          ["q", "k", "v", "pos", "bias_u", "bias_v"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_ring_append_rows_matches_numpy():
    """In-place windowed append (rows variant): exact vs a numpy loop at
    awkward offsets/validities, including zero-length and ring-end spans."""
    import jax
    from speechcatcher_tpu.ops.pallas.ring_append import ring_append_rows

    rng = np.random.default_rng(0)
    L, S, T, D, TN = 2, 9, 128, 8, 5
    cache = rng.standard_normal((L, S, T, D)).astype(np.float32)
    new = rng.standard_normal((L, S, TN, D)).astype(np.float32)
    start = rng.integers(0, T, size=S).astype(np.int32)
    start[0], start[1] = 0, T - TN          # edges
    n_new = rng.integers(0, TN + 1, size=S).astype(np.int32)
    n_new[2] = 0                            # no-op stream
    ref = cache.copy()
    for s in range(S):
        for i in range(int(n_new[s])):
            p = int(start[s]) + i
            if p < T:
                ref[:, s, p, :] = new[:, s, i, :]
    out = np.asarray(ring_append_rows(
        jnp.array(cache), jnp.array(new), jnp.array(start),
        jnp.array(n_new), interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_ring_append_cols_matches_numpy():
    """Time-minor (CTC log-prob ring) variant: exact vs a numpy loop."""
    from speechcatcher_tpu.ops.pallas.ring_append import ring_append_cols

    rng = np.random.default_rng(1)
    S, V, T, TN = 5, 16, 256, 40
    ring = rng.standard_normal((S, V, T)).astype(np.float32)
    new = rng.standard_normal((S, V, TN)).astype(np.float32)
    start = rng.integers(0, T, size=S).astype(np.int32)
    start[0] = T - 7                        # span hangs off the ring end
    n_new = rng.integers(0, TN + 1, size=S).astype(np.int32)
    ref = ring.copy()
    for s in range(S):
        for i in range(int(n_new[s])):
            p = int(start[s]) + i
            if p < T:
                ref[s, :, p] = new[s, :, i]
    out = np.asarray(ring_append_cols(
        jnp.array(ring), jnp.array(new), jnp.array(start),
        jnp.array(n_new), interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_ring_append_call_site_wiring_matches_xla(monkeypatch):
    """Drive the REAL engine call sites (ctc_extend, _scatter_append)
    through the interpret-mode kernel and compare against
    the XLA one-hot fallback — covers the offset arithmetic, axis swaps,
    dtype casts, and eligibility gating that kernel-only unit tests miss.
    (The third historical call site, extend_memory_cache, was retired:
    cross K/V are rematerialized per step, models/decoder.py.)"""
    import jax
    from speechcatcher_tpu.decode.ctc_prefix import (
        CTCScorerState, ctc_extend, init_ctc_state,
    )
    from speechcatcher_tpu.serve.engine import _scatter_append

    S, V, TCAP, B = 3, 8, 256, 2       # TCAP % 128 == 0 -> cols kernel
    TMAX, D, TNEW = 128, 16, 6         # TMAX % 64 == 0 -> rows kernel

    def run_all():
        rng = np.random.default_rng(7)  # identical inputs for both runs
        # ctc_extend: ring append of new frame log-probs.
        st = init_ctc_state(S, B, TCAP, V)
        st = st._replace(
            logp=jnp.array(rng.standard_normal((S, V, TCAP)), jnp.float32),
            enc_len=jnp.array([5, 250, 0], jnp.int32),
        )
        new_logp = jnp.array(rng.standard_normal((S, TNEW, V)), jnp.float32)
        st2 = ctc_extend(st, new_logp, jnp.array([4, 6, 0], jnp.int32))

        # _scatter_append: enc_out-style ring (cap % 64 == 0).
        buf = jnp.array(rng.standard_normal((S, TMAX, D)), jnp.float32)
        new = jnp.array(rng.standard_normal((S, TNEW, D)), jnp.float32)
        out = _scatter_append(
            buf, new, jnp.array([10, 122, 0], jnp.int32),
            jnp.array([6, 6, 0], jnp.int32),
        )
        return st2.logp, st2.r, out

    monkeypatch.delenv("SC_RING_APPEND_INTERPRET", raising=False)
    ref = run_all()
    monkeypatch.setenv("SC_RING_APPEND_INTERPRET", "1")
    got = run_all()
    for r, g, name in zip(ref, got, ["logp", "r", "scatter"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=0, atol=0, err_msg=name)
