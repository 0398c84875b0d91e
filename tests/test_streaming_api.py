"""End-to-end streaming API tests on a tiny random model + synthetic audio
(deterministic, no model download — the CI-grade fixture)."""

import types

import numpy as np
import pytest

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.streaming import Speech2TextStreaming


def make_session(seed=0, **kw):
    cfg = tiny_config()  # full 80-mel frontend, tiny encoder/decoder
    model = ASRModel.random_init(cfg, seed=seed)
    return Speech2TextStreaming(model=model, beam_size=3, **kw)


def synth_audio(seconds=2.0, rate=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    tone = 0.3 * np.sin(2 * np.pi * 440 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return (tone + 0.05 * rng.randn(len(t))).astype(np.float32)


def test_whole_utterance_recognize():
    s2t = make_session()
    results = s2t.recognize(synth_audio(1.5))
    assert isinstance(results, list)
    if results:
        text, tokens, ids, pos = results[0]
        assert isinstance(text, str)
        assert len(tokens) == len(ids) == len(pos)


def test_chunked_streaming_emits_and_finalizes():
    s2t = make_session()
    audio = synth_audio(2.0)
    chunk = 8192
    results = []
    n_chunks = (len(audio) + chunk - 1) // chunk
    for i in range(n_chunks):
        is_final = i == n_chunks - 1
        results = s2t(audio[i * chunk : (i + 1) * chunk], is_final=is_final)
    assert isinstance(results, list)


def test_streaming_deterministic():
    audio = synth_audio(1.5)
    outs = []
    for _ in range(2):
        s2t = make_session()
        outs.append(s2t.recognize(audio))
    assert str(outs[0]) == str(outs[1])


def test_reset_between_utterances():
    s2t = make_session()
    audio = synth_audio(1.0)
    r1 = s2t.recognize(audio)
    r2 = s2t.recognize(audio)
    assert str(r1) == str(r2)


def test_apply_frontend_trimming_matches_reference():
    """Exact waveform-buffer/trim parity with the reference method
    (speech2text_streaming.py:278-400), invoked on a shell instance."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("speechcatcher")
    from speechcatcher.speech2text_streaming import (
        Speech2TextStreaming as RefS2T,
    )
    from speechcatcher.model.frontend.stft_frontend import STFTFrontend

    ours = make_session()
    mean = np.zeros(80, np.float32)
    std = np.ones(80, np.float32)

    ref = RefS2T.__new__(RefS2T)
    ref.win_length, ref.hop_length = 400, 160
    ref.dtype = torch.float32
    ref.device = "cpu"
    ref.use_amp = False
    ref.mean, ref.std = mean, std
    ref.model = types.SimpleNamespace(frontend=STFTFrontend())
    ref.normalize_features = lambda f: (f - ref.mean) / ref.std

    audio = synth_audio(2.0)
    chunk = 8192
    ref_states = None
    our_states = None
    n_chunks = (len(audio) + chunk - 1) // chunk
    for i in range(n_chunks):
        is_final = i == n_chunks - 1
        seg = audio[i * chunk : (i + 1) * chunk]
        with torch.no_grad():
            rf, _, ref_states = ref.apply_frontend(
                torch.from_numpy(seg), ref_states, is_final=is_final
            )
        of, our_states = ours.apply_frontend(seg, our_states, is_final)
        assert (rf is None) == (of is None), f"chunk {i}"
        if rf is not None:
            np.testing.assert_allclose(
                np.asarray(of), rf.numpy(), rtol=1e-4, atol=1e-4,
                err_msg=f"chunk {i}",
            )
        if ref_states is None:
            assert our_states is None
        else:
            np.testing.assert_allclose(
                np.asarray(our_states["waveform_buffer"]),
                ref_states["waveform_buffer"].numpy(),
                rtol=1e-6, atol=1e-6,
            )


def test_endpointing_segments_long_audio():
    from speechcatcher_tpu.endpointing import segment_speech

    rate = 16000
    rng = np.random.RandomState(0)
    # 90 s: speech-like noise with silent gaps every 20 s.
    audio = (rng.randn(90 * rate) * 6000).astype(np.int16)
    for k in range(1, 5):
        audio[k * 20 * rate : k * 20 * rate + rate] = 0
    segs = segment_speech(audio, rate)
    assert len(segs) >= 1
    assert segs[0][0] == 0
    for s, e in segs:
        assert e - s <= 180 * 100


def test_wer_module():
    from speechcatcher_tpu.wer import word_error_rate

    m = word_error_rate(["hello world foo"], ["hello world foo"])
    assert m["wer"] == 0.0
    m = word_error_rate(["a b c d"], ["a x c"])
    assert m["substitutions"] == 1 and m["deletions"] == 1
    assert m["wer"] == pytest.approx(0.5)


def test_bf16_session_runs():
    """dtype='bfloat16' casts matmul weights; the session still decodes."""
    cfg = tiny_config()
    model = ASRModel.random_init(cfg, seed=9)
    s2t = Speech2TextStreaming(model=model, beam_size=2, dtype="bfloat16")
    results = s2t.recognize(synth_audio(1.0, seed=9))
    assert isinstance(results, list)


def test_bf16_ctc_ring_token_parity():
    """ctc_ring_dtype='bfloat16' halves the ring's HBM footprint/traffic;
    the stored log-probs round to bf16 but scores/forward variables stay
    fp32, and the decoded tokens must not move on this fixture."""
    import dataclasses

    cfg = tiny_config()
    model32 = ASRModel.random_init(cfg, seed=4)
    model16 = dataclasses.replace(
        model32, cfg=dataclasses.replace(cfg, ctc_ring_dtype="bfloat16")
    )
    audio = synth_audio(1.5, seed=4)
    res32 = Speech2TextStreaming(model=model32, beam_size=3).recognize(audio)
    res16 = Speech2TextStreaming(model=model16, beam_size=3).recognize(audio)
    assert [r[2] for r in res32] == [r[2] for r in res16]  # token ids
    assert [r[3] for r in res32] == [r[3] for r in res16]  # positions


def test_int8_quantize_structure_and_exactness():
    """quantize_params_int8: only encoder linears (not norm/embed/conv)
    gain int8 weights + per-channel scales; a weight already on the int8
    grid must round-trip through linear() bit-exactly."""
    import jax.numpy as jnp

    from speechcatcher_tpu.ops.layers import linear, quantize_params_int8

    cfg = tiny_config()
    model = ASRModel.random_init(cfg, seed=5)
    q = quantize_params_int8(model.params)

    enc = q["encoder"]["layers"]
    assert enc["self_attn"]["linear_q"]["weight"].dtype == jnp.int8
    assert enc["feed_forward"]["w_1"]["weight"].dtype == jnp.int8
    # Stacked layer axis preserved; scale is per (layer, out_channel).
    lw = enc["feed_forward"]["w_1"]["weight"]
    assert enc["feed_forward"]["w_1"]["weight_scale"].shape == lw.shape[:2]
    # Untouched: norms, conv subsampling, decoder/CTC (default scope).
    assert enc["norm1"]["weight"].dtype == jnp.float32
    assert q["encoder"]["embed"]["convs"][0]["weight"].dtype != jnp.int8
    assert q["decoder"]["layers"]["self_attn"]["linear_q"]["weight"].dtype \
        != jnp.int8
    assert q["ctc"]["ctc_lo"]["weight"].dtype != jnp.int8

    # Grid weights quantize losslessly → identical linear output. Every
    # row carries a ±127 entry so the per-channel scale reproduces the
    # construction scale and round() recovers the integers exactly.
    rng = np.random.default_rng(0)
    ints = rng.integers(-127, 128, size=(8, 16)).astype(np.float32)
    ints[:, 0] = 127.0
    scale = np.float32(0.0123)
    p32 = {"weight": jnp.asarray(ints * scale),
           "bias": jnp.asarray(rng.standard_normal(8), jnp.float32)}
    p8 = quantize_params_int8({"enc_x": p32}, scope=("enc",))["enc_x"]
    assert p8["weight"].dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
    y32 = linear(p32, x.astype(jnp.bfloat16))
    y8 = linear(p8, x)
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y32),
                               rtol=2e-5, atol=2e-5)


def test_int8_session_runs_close_to_bf16():
    """dtype='int8' quantizes encoder linears; the session still decodes
    and the encoder output stays within quantization-error bounds."""
    import jax.numpy as jnp

    from speechcatcher_tpu.models.encoder import encoder_forward_train
    from speechcatcher_tpu.ops.layers import quantize_params_int8

    cfg = tiny_config()
    model = ASRModel.random_init(cfg, seed=9)
    s2t = Speech2TextStreaming(model=model, beam_size=2, dtype="int8")
    results = s2t.recognize(synth_audio(1.0, seed=9))
    assert isinstance(results, list)

    # Offline encoder forward: int8 output close to fp32 (weight-only
    # per-channel quantization, ≤0.5/127 relative weight error).
    model32 = ASRModel.random_init(cfg, seed=9)
    feats = jnp.asarray(
        np.random.RandomState(3).randn(1, 40, cfg.n_mels), jnp.float32
    )
    ilens = jnp.asarray([40])
    y32, _ = encoder_forward_train(model32.params["encoder"], feats, ilens,
                                   cfg)
    y8, _ = encoder_forward_train(
        quantize_params_int8(model32.params)["encoder"], feats, ilens, cfg)
    err = float(jnp.max(jnp.abs(y8 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert err < 0.05, f"int8 encoder deviates {err:.3f} from fp32"


def test_int8_all_quantizes_decoder_and_session_decodes():
    """dtype='int8-all' (scope=None) quantizes decoder/CTC/output linears
    too — every weight the drain beam step re-reads — and a session still
    decodes. Embeddings and norms stay full precision."""
    import jax.numpy as jnp

    from speechcatcher_tpu.ops.layers import quantize_params_int8

    cfg = tiny_config()
    model = ASRModel.random_init(cfg, seed=11)
    q = quantize_params_int8(model.params, scope=None)
    dec = q["decoder"]["layers"]
    assert dec["self_attn"]["linear_q"]["weight"].dtype == jnp.int8
    assert dec["src_attn"]["linear_k"]["weight"].dtype == jnp.int8
    assert q["decoder"]["output_layer"]["weight"].dtype == jnp.int8
    assert q["ctc"]["ctc_lo"]["weight"].dtype == jnp.int8
    # Full-precision islands survive: token embedding + norms.
    assert q["decoder"]["embed"]["weight"].dtype != jnp.int8
    assert q["encoder"]["layers"]["norm1"]["weight"].dtype == jnp.float32

    model11 = ASRModel.random_init(cfg, seed=11)
    audio = synth_audio(1.0, seed=11)
    res8 = Speech2TextStreaming(
        model=model11, beam_size=2, dtype="int8-all"
    ).recognize(audio)
    assert isinstance(res8, list)


def test_tiny_final_chunk_flushes_encoder_tail():
    """A final chunk under 3 feature frames (<48 ms) must still run the
    final encoder step (consume-all): the carried look-ahead/subsample
    buffers flush, so the transcript reaches the end of the audio like a
    session whose final chunk is full-sized. Exact token equality is NOT
    expected — a sub-win_length final is zero-padded before the STFT
    reflection (reference apply_frontend :308-315), which perturbs the
    last frames — but before the flush fix the tiny-final session lost a
    whole block: 6 of 31 tokens and 7 of 36 encoder frames on this
    fixture."""
    chunk = 8192
    audio = synth_audio(2.0)
    audio = audio[: 3 * chunk + 100]  # final remainder: 100 samples

    s2t = make_session(seed=4)
    for i in range(3):
        s2t(audio[i * chunk : (i + 1) * chunk], is_final=False)
    r_tiny = s2t(audio[3 * chunk :], is_final=True)

    s2t2 = make_session(seed=4)
    for i in range(2):
        s2t2(audio[i * chunk : (i + 1) * chunk], is_final=False)
    r_merged = s2t2(audio[2 * chunk :], is_final=True)

    assert r_tiny and r_merged
    ids_t, pos_t = r_tiny[0][2], r_tiny[0][3]
    ids_m, pos_m = r_merged[0][2], r_merged[0][3]
    # Same coverage: token count within 1 and final encoder position
    # within 2 frames (old code: 25 vs 31 tokens, frame 29 vs 36).
    assert abs(len(ids_t) - len(ids_m)) <= 1, (ids_t, ids_m)
    assert abs(max(pos_t) - max(pos_m)) <= 2, (pos_t, pos_m)
    # And identical transcription away from the padding-perturbed tail.
    n = max(len(ids_m) - 6, 0)
    assert ids_t[:n] == ids_m[:n]
