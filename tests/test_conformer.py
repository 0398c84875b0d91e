"""Conformer variant tests: module-level parity vs the in-repo reference
(ConvolutionModule, RelPositionMultiHeadedAttention) + streaming conformer
encoder invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.ops.conformer import conv_module, rel_position_attention

torch = pytest.importorskip("torch")
# Parity tests need the reference implementation (mounted read-only
# at /root/reference in the dev environment; absent in CI).
pytest.importorskip("speechcatcher")

D, H = 16, 2


def test_conv_module_parity():
    from speechcatcher.model.layers.convolution import ConvolutionModule

    torch.manual_seed(0)
    ref = ConvolutionModule(channels=D, kernel_size=7, dropout_rate=0.0)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "layernorm": {
            "weight": jnp.asarray(sd["layernorm.weight"]),
            "bias": jnp.asarray(sd["layernorm.bias"]),
        },
        "pointwise_conv1": {
            "weight": jnp.asarray(sd["pointwise_conv1.weight"]),
            "bias": jnp.asarray(sd["pointwise_conv1.bias"]),
        },
        "depthwise_conv": {
            "weight": jnp.asarray(sd["depthwise_conv.weight"]),
            "bias": jnp.asarray(sd["depthwise_conv.bias"]),
        },
        "batch_norm": {
            "weight": jnp.asarray(sd["batch_norm.weight"]),
            "bias": jnp.asarray(sd["batch_norm.bias"]),
            "running_mean": jnp.asarray(sd["batch_norm.running_mean"]),
            "running_var": jnp.asarray(sd["batch_norm.running_var"]),
        },
        "pointwise_conv2": {
            "weight": jnp.asarray(sd["pointwise_conv2.weight"]),
            "bias": jnp.asarray(sd["pointwise_conv2.bias"]),
        },
    }

    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, D).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    ours = np.asarray(conv_module(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_rel_position_attention_parity():
    from speechcatcher.model.attention.multi_head_attention import (
        RelPositionMultiHeadedAttention,
    )

    torch.manual_seed(1)
    ref = RelPositionMultiHeadedAttention(H, D, dropout_rate=0.0)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        name: {
            "weight": jnp.asarray(sd[f"{name}.weight"]),
            **(
                {"bias": jnp.asarray(sd[f"{name}.bias"])}
                if f"{name}.bias" in sd
                else {}
            ),
        }
        for name in ("linear_q", "linear_k", "linear_v", "linear_out",
                     "linear_pos")
    }
    params["pos_bias_u"] = jnp.asarray(sd["pos_bias_u"])
    params["pos_bias_v"] = jnp.asarray(sd["pos_bias_v"])

    rng = np.random.RandomState(2)
    t = 9
    x = rng.randn(2, t, D).astype(np.float32)
    pos = rng.randn(1, t, D).astype(np.float32)
    mask = (rng.rand(2, t, t) > 0.2).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            torch.from_numpy(pos), torch.from_numpy(mask),
        ).numpy()
    ours = np.asarray(
        rel_position_attention(
            params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            jnp.asarray(pos), jnp.asarray(mask), H,
        )
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_conformer_streaming_engine_matches_single():
    """The conformer encoder runs through the same streaming machinery:
    batched engine == independent single-stream sessions."""
    from speechcatcher_tpu.models.asr_model import ASRModel
    from speechcatcher_tpu.serve.engine import StreamingEngine
    from speechcatcher_tpu.streaming import Speech2TextStreaming
    from test_engine import final_to_ids, synth_audio

    cfg = tiny_config(encoder_type="conformer", conformer_kernel_size=7)
    model = ASRModel.random_init(cfg, seed=4)
    chunk = 8192
    audio = synth_audio(2 * chunk / 16000 + 0.01, seed=5)

    s2t = Speech2TextStreaming(model=model, beam_size=2)
    res = []
    for i in range(2):
        res = s2t(audio[i * chunk : (i + 1) * chunk], is_final=(i == 1))
    assert res, "no final result from conformer session"
    golden = (res[0][2], res[0][3])

    engine = StreamingEngine(model, n_slots=2, beam_size=2,
                             chunk_samples=chunk)
    s = engine.acquire_slot()
    engine.tick({s: audio[:chunk]})
    f = engine.finalize(s, audio[chunk : 2 * chunk])
    assert tuple(final_to_ids(model, f[0], f[1])) == tuple(golden)


def test_conformer_forward_train_runs():
    from speechcatcher_tpu.models.asr_model import ASRModel
    from speechcatcher_tpu.models.encoder import encoder_forward_train

    cfg = tiny_config(n_mels=20, encoder_type="conformer",
                      conformer_kernel_size=7)
    model = ASRModel.random_init(cfg, seed=0)
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 170, 20).astype(np.float32)
    out, olens = encoder_forward_train(
        model.params["encoder"], jnp.asarray(feats),
        jnp.full((2,), 170, jnp.int32), cfg,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_rel_position_attention_batched_pos_emb():
    """A per-batch (B, Tk, d) pos_emb must act per batch row — the old
    'bhqd,uhkd->bhqk' einsum SUMMED over the unmatched pos batch axis,
    silently corrupting every batch element for B >= 2."""
    from speechcatcher_tpu.ops.conformer import init_rel_mha

    import jax

    params = init_rel_mha(jax.random.PRNGKey(0), D, H)
    rng = np.random.RandomState(5)
    t = 7
    x = rng.randn(2, t, D).astype(np.float32)
    pos = rng.randn(2, t, D).astype(np.float32)

    batched = np.asarray(
        rel_position_attention(
            params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            jnp.asarray(pos), None, H,
        )
    )
    for b in range(2):
        single = np.asarray(
            rel_position_attention(
                params,
                jnp.asarray(x[b : b + 1]), jnp.asarray(x[b : b + 1]),
                jnp.asarray(x[b : b + 1]), jnp.asarray(pos[b : b + 1]),
                None, H,
            )
        )
        np.testing.assert_allclose(batched[b : b + 1], single,
                                   rtol=1e-5, atol=1e-6)
