"""Fused STFT → power → mel → log → MVN frontend in JAX.

Behavioral contract (the reference pipeline, replicated bit-for-bit at fp32
tolerances):
  torch.stft(n_fft=512, hop=160, win=400, hann window, center=True,
  reflect padding, onesided)  → power (re^2+im^2) → mel matmul → clamp(1e-10)
  → log  (/root/reference/speechcatcher/model/frontend/stft_frontend.py:87-154),
  then per-dim (x-mean)/std global MVN
  (/root/reference/speechcatcher/speech2text_streaming.py:265-276).

TPU design: one jit'd function per waveform length; framing is an as_strided-
style gather folded into a matmul-friendly reshape; the rFFT runs as XLA's
native FFT; mel projection + log + MVN fuse into the surrounding elementwise
ops. The reference bounced features through CPU numpy on every chunk
(speech2text_streaming.py:356-358) — here the whole pipeline stays in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechcatcher_tpu.ops.mel import melscale_fbanks


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def make_frontend_constants(
    n_fft: int = 512,
    win_length: int = 400,
    n_mels: int = 80,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(padded window (n_fft,), mel matrix (n_fft//2+1, n_mels))."""
    if f_max is None:
        f_max = sample_rate / 2.0
    win = hann_window(win_length)
    # torch.stft centers a short window inside n_fft with zero padding.
    left = (n_fft - win_length) // 2
    window = np.zeros(n_fft, dtype=np.float32)
    window[left : left + win_length] = win
    mel_fb = melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
    return window, mel_fb


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, S) waveform → (B, frames, n_fft) with torch.stft center=True.

    Reflect-pads n_fft//2 on both sides; frames = 1 + S // hop. Frames are
    built from static slices (pure data movement) — the strided-index
    gather formulation lowers to a slow element gather on TPU.
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    return jnp.stack(
        [x[:, t * hop : t * hop + n_fft] for t in range(n_frames)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def logmel_frontend(
    waveform: jnp.ndarray,
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    n_fft: int = 512,
    hop: int = 160,
) -> jnp.ndarray:
    """(B, S) float32 waveform → (B, frames, n_mels) normalized log-mel."""
    frames = frame_signal(waveform, n_fft, hop) * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.einsum(
        "btf,fm->btm", power, mel_fb, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-f32 mel projection —
        # bf16 (TPU default) breaks the 1e-4 parity vs torch.stft features
    )
    logmel = jnp.log(jnp.clip(mel, min=1e-10))
    return (logmel - mean) * inv_std


class Frontend:
    """Stateless frontend op bundle (constants resident on device)."""

    def __init__(
        self,
        n_fft: int = 512,
        hop_length: int = 160,
        win_length: int = 400,
        n_mels: int = 80,
        sample_rate: int = 16000,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mels = n_mels
        window, mel_fb = make_frontend_constants(
            n_fft, win_length, n_mels, sample_rate
        )
        self.window = jnp.asarray(window)
        self.mel_fb = jnp.asarray(mel_fb)
        if mean is None:
            mean = np.zeros(n_mels, dtype=np.float32)
        if std is None:
            std = np.ones(n_mels, dtype=np.float32)
        self.mean = jnp.asarray(mean.astype(np.float32))
        self.inv_std = jnp.asarray((1.0 / std).astype(np.float32))

    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(B, S) or (S,) waveform → (B, frames, n_mels) normalized log-mel."""
        if waveform.ndim == 1:
            waveform = waveform[None, :]
        return logmel_frontend(
            waveform,
            self.window,
            self.mel_fb,
            self.mean,
            self.inv_std,
            n_fft=self.n_fft,
            hop=self.hop_length,
        )

    def normalize_only(self, feats: jnp.ndarray) -> jnp.ndarray:
        """MVN for pre-computed features (T, n_mels) → (1, T, n_mels)."""
        if feats.ndim == 2:
            feats = feats[None, :, :]
        return (feats - self.mean) * self.inv_std

    def n_frames(self, n_samples: int) -> int:
        return 1 + n_samples // self.hop_length
