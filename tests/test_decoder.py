"""Decoder parity: full teacher-forcing forward and incremental KV-cached
beam stepping vs the reference torch decoder (output-prefix cache)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.decoder import (
    decoder_forward_train,
    decoder_pe_table,
    decoder_step,
    init_decoder_cache,
)

from helpers import make_reference_modules, reference_params_to_jax, rand_feats

torch = pytest.importorskip("torch")
# Parity tests need the reference implementation (mounted read-only
# at /root/reference in the dev environment; absent in CI).
pytest.importorskip("speechcatcher")

CFG = tiny_config(n_mels=20)


@pytest.fixture(scope="module")
def setup():
    encoder, decoder, ctc = make_reference_modules(CFG, seed=7)
    params = reference_params_to_jax(encoder, decoder, ctc, CFG)
    return decoder, params


def test_forward_train_parity(setup):
    ref_decoder, params = setup
    rng = np.random.RandomState(0)
    b, tm, l = 2, 12, 7
    memory = rand_feats(rng, b, tm, CFG.encoder_dim)
    mem_lens = np.array([12, 9], dtype=np.int64)
    ys = rng.randint(0, CFG.vocab_size, size=(b, l)).astype(np.int64)
    ylens = np.array([7, 5], dtype=np.int64)

    with torch.no_grad():
        ref_logits, _ = ref_decoder(
            torch.from_numpy(memory),
            torch.from_numpy(mem_lens),
            torch.from_numpy(ys),
            torch.from_numpy(ylens),
        )

    ours = decoder_forward_train(
        params["decoder"],
        jnp.asarray(memory),
        jnp.asarray(mem_lens),
        jnp.asarray(ys),
        jnp.asarray(ylens),
        CFG,
    )
    # Positions beyond ys_in_lens attend garbage in both; compare valid only.
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(ours)[i, : ylens[i]],
            ref_logits.numpy()[i, : ylens[i]],
            rtol=2e-4,
            atol=2e-4,
        )


def _reference_batch_score(ref_decoder, yseqs, states, memory):
    import torch

    with torch.no_grad():
        logp, new_states = ref_decoder.batch_score(
            torch.from_numpy(yseqs), states, torch.from_numpy(memory)
        )
    return logp.numpy(), new_states


def test_incremental_step_parity_with_reorder(setup):
    """Step the decoder 4 times with beam reordering between steps; our
    lazily-reordered KV-cache path (lane map, rows never permuted) must
    match the reference output-prefix-cache path."""
    ref_decoder, params = setup
    rng = np.random.RandomState(1)
    n = 3  # hypotheses
    tm = 10
    memory_np = rand_feats(rng, 1, tm, CFG.encoder_dim)
    memory = np.repeat(memory_np, n, axis=0)

    pe = decoder_pe_table(CFG)
    cache = init_decoder_cache(CFG, n)
    # Raw-frame memory ring (capacity-padded): decoder_step rematerializes
    # cross K/V from it each step; rows past enc_len are garbage-masked.
    memory_ring = jnp.zeros((1, CFG.max_enc_frames, CFG.encoder_dim))
    memory_ring = memory_ring.at[:, :tm].set(jnp.asarray(memory_np))

    sos = CFG.sos_id
    yseqs = np.full((n, 1), sos, dtype=np.int64)
    ref_states = [None] * n
    enc_len = jnp.full((1,), tm, jnp.int32)  # one stream, n beam hyps
    lane = jnp.zeros((1, n, CFG.max_tokens), jnp.int32)

    for step in range(4):
        ref_logp, ref_states = _reference_batch_score(
            ref_decoder, yseqs, ref_states, memory
        )
        our_logp, cache = decoder_step(
            params["decoder"],
            pe,
            cache,
            memory_ring,
            jnp.asarray(yseqs[:, -1].astype(np.int32)),
            jnp.full((n,), yseqs.shape[1] - 1, jnp.int32),
            enc_len,
            lane,
            jnp.ones((n,), bool),
            CFG,
            n,
        )
        np.testing.assert_allclose(
            np.asarray(our_logp), ref_logp, rtol=2e-4, atol=2e-4,
            err_msg=f"step {step}",
        )

        # Simulate beam pruning: pick random source hyps + random tokens.
        # The cache is never permuted — only the lane map is: position
        # `step`'s rows (written by this call) live at the parents' lanes.
        src = rng.randint(0, n, size=n)
        toks = rng.randint(2, CFG.vocab_size - 1, size=n)
        yseqs = np.concatenate(
            [yseqs[src], toks[:, None].astype(np.int64)], axis=1
        )
        ref_states = [
            [ref_states[s][layer] for layer in range(CFG.decoder_layers)]
            for s in src
        ]
        lane = lane[:, jnp.asarray(src)]
        lane = lane.at[:, :, step].set(jnp.asarray(src, jnp.int32))


def test_cross_commuted_equals_blocked():
    """The commuted cross-attention (fold W_k into the query, defer W_v
    onto the weighted sum — the SC_TPU_CROSS=commuted A/B control) must
    match the textbook formulation (project K/V explicitly — the default
    remat hot path) on the same inputs."""
    from speechcatcher_tpu.models.decoder import (
        _attend_cross_blocked,
        _attend_cross_commuted,
    )
    from speechcatcher_tpu.ops.layers import init_mha, linear

    import jax

    rng = np.random.RandomState(3)
    s, b, t, d, h = 2, 3, 11, 32, 4
    p_attn = init_mha(jax.random.PRNGKey(0), d)
    q = jnp.asarray(rng.randn(s * b, d).astype(np.float32))
    mem = jnp.asarray(rng.randn(s, t, d).astype(np.float32))
    # Stream 2 has ZERO visible frames (a padded/just-reset lane in the
    # fixed-shape batch): both formulations must return exactly 0 there —
    # the commute's Σw=1 assumption that lets b_v defer does not hold on
    # an all-masked row, so the bias must be suppressed.
    valid = jnp.asarray(np.arange(t)[None, :] < np.array([[11], [7], [0]]))
    s = valid.shape[0]
    q = jnp.asarray(rng.randn(s * b, d).astype(np.float32))
    mem = jnp.asarray(rng.randn(s, t, d).astype(np.float32))

    mk = linear(p_attn["linear_k"], mem)
    mv = linear(p_attn["linear_v"], mem)
    ref = _attend_cross_blocked(q, mk, mv, valid, h)
    got = _attend_cross_commuted(q, mem, p_attn, valid, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(got).reshape(s, b, d)[2], 0.0)


def test_bf16_cache_dtype_drift(setup):
    """Serving runs cache_dtype=bfloat16 (the activation cache, the
    sanitized memory cast, and the commuted-attention contractions all
    round through bf16) while the parity tier covers float32 only — bound
    the bf16 drift on the same inputs (ADVICE r03): log-probs stay close
    and the greedy token never flips over several reordered steps."""
    _, params = setup
    rng = np.random.RandomState(4)
    n, tm = 3, 10
    cfg16 = CFG.replace(cache_dtype="bfloat16")
    memory_np = rand_feats(rng, 1, tm, CFG.encoder_dim)
    pe = decoder_pe_table(CFG)
    ring = jnp.zeros((1, CFG.max_enc_frames, CFG.encoder_dim))
    ring = ring.at[:, :tm].set(jnp.asarray(memory_np))
    enc_len = jnp.full((1,), tm, jnp.int32)

    caches = {c: init_decoder_cache(c, n) for c in (CFG, cfg16)}
    lane = jnp.zeros((1, n, CFG.max_tokens), jnp.int32)
    yseqs = np.full((n, 1), CFG.sos_id, dtype=np.int64)
    for step in range(4):
        logps = {}
        for c in (CFG, cfg16):
            logps[c], caches[c] = decoder_step(
                params["decoder"], pe, caches[c], ring,
                jnp.asarray(yseqs[:, -1].astype(np.int32)),
                jnp.full((n,), yseqs.shape[1] - 1, jnp.int32),
                enc_len, lane, jnp.ones((n,), bool), c, n,
            )
        a, b16 = np.asarray(logps[CFG]), np.asarray(logps[cfg16])
        assert np.max(np.abs(a - b16)) < 0.08, np.max(np.abs(a - b16))
        np.testing.assert_array_equal(a.argmax(-1), b16.argmax(-1))
        src = rng.randint(0, n, size=n)
        toks = rng.randint(2, CFG.vocab_size - 1, size=n)
        yseqs = np.concatenate(
            [yseqs[src], toks[:, None].astype(np.int64)], axis=1
        )
        lane = lane[:, jnp.asarray(src)]
        lane = lane.at[:, :, step].set(jnp.asarray(src, jnp.int32))


def test_memory_padding_invariance(setup):
    """Rematerialized cross K/V must be enc_len-masked: a step over a
    capacity-padded ring whose tail holds garbage (incl. non-finite
    values) equals a step over the exact-length memory."""
    _, params = setup
    rng = np.random.RandomState(2)
    tm = 10
    memory_np = rand_feats(rng, 1, tm, CFG.encoder_dim)
    pe = decoder_pe_table(CFG)
    enc_len = jnp.full((1,), tm, jnp.int32)
    lane = jnp.zeros((1, 1, CFG.max_tokens), jnp.int32)
    tok = jnp.asarray([CFG.sos_id], jnp.int32)
    args = (tok, jnp.zeros((1,), jnp.int32), enc_len, lane,
            jnp.ones((1,), bool), CFG, 1)

    exact, _ = decoder_step(
        params["decoder"], pe, init_decoder_cache(CFG, 1),
        jnp.asarray(memory_np), *args
    )
    ring = jnp.full((1, CFG.max_enc_frames, CFG.encoder_dim), jnp.nan)
    ring = ring.at[:, :tm].set(jnp.asarray(memory_np))
    padded, _ = decoder_step(
        params["decoder"], pe, init_decoder_cache(CFG, 1), ring, *args
    )
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(exact), rtol=1e-5, atol=1e-5
    )
