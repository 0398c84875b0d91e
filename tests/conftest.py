"""Test harness configuration.

- Forces JAX onto CPU with 8 virtual devices (multi-chip sharding tests run
  on a virtual mesh; real-TPU benchmarks live in bench.py).
- Installs a tiny torchaudio stub so the reference package at
  /root/reference (PUBLIC, read-only; used as a numerical golden reference,
  never copied) imports without the real torchaudio.
"""

import os
import sys
import types

# Force CPU: the parent environment pins JAX_PLATFORMS=axon (real TPU);
# unit tests run on a virtual 8-device CPU mesh instead. jax is pre-imported
# at interpreter startup here, so the env var alone is ignored — update the
# live config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def _install_torchaudio_stub():
    """Minimal torchaudio.functional.melscale_fbanks for the reference
    frontend (stft_frontend.py:73-85), backed by our numpy implementation."""
    if "torchaudio" in sys.modules:
        return
    try:
        import torch  # noqa: F401
    except ImportError:
        return
    import torch
    from speechcatcher_tpu.ops.mel import melscale_fbanks as np_fbanks

    functional = types.ModuleType("torchaudio.functional")

    def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                        norm=None, mel_scale="htk"):
        assert norm == "slaney" and mel_scale == "slaney", (
            "stub only implements the slaney/slaney variant the reference uses"
        )
        return torch.from_numpy(
            np_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate)
        )

    functional.melscale_fbanks = melscale_fbanks
    torchaudio = types.ModuleType("torchaudio")
    torchaudio.functional = functional
    sys.modules["torchaudio"] = torchaudio
    sys.modules["torchaudio.functional"] = functional


_install_torchaudio_stub()

if REFERENCE_ROOT not in sys.path and os.path.isdir(REFERENCE_ROOT):
    sys.path.append(REFERENCE_ROOT)

# Fixture-replay tests reuse the blessing scripts' decode drivers
# (scripts/bless_engine_golden.py) so CI replays EXACTLY what was blessed.
_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
if _SCRIPTS not in sys.path:
    sys.path.append(os.path.abspath(_SCRIPTS))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite compiles hundreds of distinct XLA:CPU programs in one
    process; past a certain accumulation the XLA CPU compiler has been
    observed to SEGFAULT on a later compilation (LLVM JIT state — crash
    in backend_compile_and_load with plenty of free RAM). Bounding the
    live executable set per module keeps the suite deterministic at the
    cost of recompiling shared tiny-model programs a few times."""
    yield
    jax.clear_caches()
