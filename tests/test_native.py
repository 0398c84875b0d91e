"""Native staging library: build, roundtrip parity with numpy, fallback."""

import numpy as np

from speechcatcher_tpu.utils.native import StagingRing, get_lib


def test_native_lib_builds():
    lib = get_lib()
    # g++ is present in this environment; the library must build.
    assert lib is not None


def test_ring_roundtrip_pcm16():
    ring = StagingRing(capacity=1 << 16)
    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32767, size=5000).astype(np.int16)
    ring.write_pcm16(pcm.tobytes())
    assert ring.available() == 5000
    out = ring.read(5000)
    np.testing.assert_allclose(
        out, pcm.astype(np.float32) / 32767.0, rtol=0, atol=1e-7
    )


def test_ring_chunked_read_write():
    ring = StagingRing(capacity=4096)
    rng = np.random.RandomState(1)
    total_in = []
    total_out = []
    for i in range(20):
        pcm = rng.randint(-1000, 1000, size=300).astype(np.int16)
        ring.write_pcm16(pcm.tobytes())
        total_in.append(pcm.astype(np.float32) / 32767.0)
        while ring.available() >= 256:
            total_out.append(ring.read(256))
    total_out.append(ring.drain())
    np.testing.assert_allclose(
        np.concatenate(total_out), np.concatenate(total_in), atol=1e-7
    )


def test_ring_underflow_returns_none():
    ring = StagingRing(capacity=1024)
    ring.write_f32(np.ones(10, np.float32))
    assert ring.read(11) is None
    assert ring.available() == 10
