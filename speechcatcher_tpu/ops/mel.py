"""Slaney-style mel filterbank matrix, computed once at load time in numpy.

Replaces torchaudio.functional.melscale_fbanks(norm='slaney',
mel_scale='slaney') used by the reference frontend
(/root/reference/speechcatcher/model/frontend/stft_frontend.py:73-85).
The matrix is a constant that lives in HBM; the mel projection itself is a
single (frames, n_freqs) @ (n_freqs, n_mels) matmul on the MXU.
"""

from __future__ import annotations

import numpy as np

# Slaney scale constants: linear below 1 kHz, logarithmic above.
_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = float(np.log(6.4) / 27.0)


def hz_to_mel(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    mel = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    freq = _F_SP * mel
    log_region = mel >= _MIN_LOG_MEL
    freq = np.where(
        log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), freq
    )
    return freq


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels), float32.

    Matches torchaudio's create_triangular_filterbank with slaney norm:
    each filter scaled by 2 / (f[i+2] - f[i]).
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    m_min = hz_to_mel(np.array(f_min))
    m_max = hz_to_mel(np.array(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts)  # (n_mels + 2,)

    # Triangles: up-slope into f_pts[i+1], down-slope out of it.
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]  # (n_freqs, n_mels)
    up_slopes = slopes[:, 2:] / f_diff[1:]  # (n_freqs, n_mels)
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # Slaney normalization (area normalization).
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]

    return fb.astype(np.float32)
