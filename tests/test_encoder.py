"""Contextual-block encoder parity: whole-utterance (train mode) and true
streaming (forward_infer) against the reference torch implementation, plus
multi-stream batching invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.config import ModelConfig, tiny_config
from speechcatcher_tpu.models.encoder import (
    StreamingEncoder,
    encoder_forward_train,
    subsampled_len,
)

from helpers import make_reference_modules, reference_params_to_jax, rand_feats

torch = pytest.importorskip("torch")
# Parity tests need the reference implementation (mounted read-only
# at /root/reference in the dev environment; absent in CI).
pytest.importorskip("speechcatcher")

CFG = tiny_config(n_mels=20)


@pytest.fixture(scope="module")
def setup():
    encoder, decoder, ctc = make_reference_modules(CFG, seed=3)
    params = reference_params_to_jax(encoder, decoder, ctc, CFG)
    return encoder, params


def test_forward_train_parity(setup):
    ref_encoder, params = setup
    rng = np.random.RandomState(0)
    # Long enough to trigger block processing (> block_size after 4x conv).
    feats = rand_feats(rng, 2, 170, CFG.n_mels)
    ilens = np.array([170, 170], dtype=np.int64)

    with torch.no_grad():
        ref_out, ref_olens, _ = ref_encoder(
            torch.from_numpy(feats), torch.from_numpy(ilens), infer_mode=False
        )

    ours, olens = encoder_forward_train(
        params["encoder"], jnp.asarray(feats), jnp.asarray(ilens), CFG
    )
    assert ours.shape == tuple(ref_out.shape)
    np.testing.assert_array_equal(np.asarray(olens), ref_olens.numpy())
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=2e-4, atol=2e-4
    )


def test_forward_train_short_path(setup):
    ref_encoder, params = setup
    rng = np.random.RandomState(4)
    feats = rand_feats(rng, 1, 30, CFG.n_mels)  # subsampled ≤ block_size
    assert subsampled_len(30, CFG.input_layer) <= CFG.block_size
    ilens = np.array([30], dtype=np.int64)
    with torch.no_grad():
        ref_out, _, _ = ref_encoder(
            torch.from_numpy(feats), torch.from_numpy(ilens), infer_mode=False
        )
    ours, _ = encoder_forward_train(
        params["encoder"], jnp.asarray(feats), jnp.asarray(ilens), CFG
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=2e-4, atol=2e-4
    )


def _stream_reference(ref_encoder, chunks, finals):
    outs = []
    states = None
    for chunk, is_final in zip(chunks, finals):
        ilens = torch.tensor([chunk.shape[1]])
        with torch.no_grad():
            out, _, states = ref_encoder(
                torch.from_numpy(chunk), ilens, prev_states=states,
                is_final=is_final, infer_mode=True,
            )
        outs.append(out.numpy())
    return outs


def _stream_ours(params, cfg, chunks, finals):
    enc = StreamingEncoder(params["encoder"], cfg)
    state = enc.init_state()
    outs = []
    for chunk, is_final in zip(chunks, finals):
        out, state = enc.step(jnp.asarray(chunk), state, is_final)
        outs.append(np.asarray(out))
    return outs


def test_forward_infer_streaming_parity(setup):
    ref_encoder, params = setup
    rng = np.random.RandomState(1)
    # 5 chunks of 49 feature frames + final: mirrors the 8192-sample cadence.
    chunks = [rand_feats(rng, 1, 49, CFG.n_mels) for _ in range(6)]
    finals = [False] * 5 + [True]

    ref_outs = _stream_reference(ref_encoder, chunks, finals)
    our_outs = _stream_ours(params, CFG, chunks, finals)

    for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
        assert r.shape == o.shape, f"chunk {i}: {r.shape} vs {o.shape}"
        if r.size:
            np.testing.assert_allclose(o, r, rtol=2e-4, atol=2e-4,
                                       err_msg=f"chunk {i}")


def test_forward_infer_short_final_parity(setup):
    """Single short final chunk exercises the short-segment path
    (reference encoder :345-351)."""
    ref_encoder, params = setup
    rng = np.random.RandomState(2)
    chunks = [rand_feats(rng, 1, 30, CFG.n_mels)]
    ref_outs = _stream_reference(ref_encoder, chunks, [True])
    our_outs = _stream_ours(params, CFG, chunks, [True])
    np.testing.assert_allclose(our_outs[0], ref_outs[0], rtol=2e-4, atol=2e-4)


def test_streaming_batch_matches_single(setup):
    """N identical streams stacked on the batch axis must reproduce the
    single-stream output (the multi-stream batching contract)."""
    _, params = setup
    rng = np.random.RandomState(5)
    base = [rand_feats(rng, 1, 49, CFG.n_mels) for _ in range(4)]
    finals = [False, False, False, True]

    single = _stream_ours(params, CFG, base, finals)
    stacked = [np.concatenate([c, c, c], axis=0) for c in base]
    batched = _stream_ours(params, CFG, stacked, finals)

    for s, b in zip(single, batched):
        for i in range(3):
            np.testing.assert_allclose(b[i : i + 1], s, rtol=1e-4, atol=1e-4)


def test_streaming_matches_train_emissions(setup):
    """Streaming emits the same frames the train-mode simulation computes
    for the shared prefix (same context chain)."""
    _, params = setup
    rng = np.random.RandomState(6)
    chunks = [rand_feats(rng, 1, 49, CFG.n_mels) for _ in range(4)]
    finals = [False, False, False, True]
    our_outs = _stream_ours(params, CFG, chunks, finals)
    total = np.concatenate(our_outs, axis=1)
    assert total.shape[1] > 0
