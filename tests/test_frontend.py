"""Frontend parity: our fused JAX STFT/log-mel/MVN vs the reference torch
pipeline (STFTFrontend + numpy MVN)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechcatcher_tpu.ops.frontend import Frontend
from speechcatcher_tpu.ops.mel import melscale_fbanks

torch = pytest.importorskip("torch")


def _reference_features(wave: np.ndarray, mean, std) -> np.ndarray:
    pytest.importorskip("speechcatcher")
    from speechcatcher.model.frontend.stft_frontend import STFTFrontend

    fe = STFTFrontend()
    fe.eval()
    with torch.no_grad():
        feats, _ = fe(torch.from_numpy(wave))
    out = feats.numpy()
    return (out - mean) / std


def test_logmel_parity_with_reference():
    rng = np.random.RandomState(0)
    wave = (rng.randn(1, 8192) * 0.1).astype(np.float32)
    mean = rng.randn(80).astype(np.float32)
    std = (0.5 + rng.rand(80)).astype(np.float32)

    ref = _reference_features(wave, mean, std)
    ours = np.asarray(Frontend(mean=mean, std=std)(jnp.asarray(wave)))

    assert ours.shape == ref.shape == (1, 1 + 8192 // 160, 80)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_logmel_batched_matches_single():
    rng = np.random.RandomState(1)
    wave = (rng.randn(3, 4096) * 0.1).astype(np.float32)
    fe = Frontend()
    batched = np.asarray(fe(jnp.asarray(wave)))
    for i in range(3):
        single = np.asarray(fe(jnp.asarray(wave[i])))
        np.testing.assert_allclose(batched[i], single[0], rtol=1e-5, atol=1e-5)


def test_melscale_fbanks_shape_and_coverage():
    fb = melscale_fbanks(257, 0.0, 8000.0, 80, 16000)
    assert fb.shape == (257, 80)
    assert fb.min() >= 0.0
    # Every filter has support.
    assert (fb.sum(axis=0) > 0).all()
