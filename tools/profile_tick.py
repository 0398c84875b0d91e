"""Phase-level profile of the serving engine's steady-state tick.

Times the tick's device phases by blocking between them (dispatch overlap is
deliberately lost — the point is the relative cost of encode vs beam rounds
vs finalization, plus the host residue), and prints the per-stream HBM
budget. Run on the real chip:

    python tools/profile_tick.py [S] [ticks]

CPU smoke: JAX_PLATFORMS=cpu python tools/profile_tick.py 4 4 --tiny
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from speechcatcher_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

import bench  # noqa: E402
from speechcatcher_tpu.serve.engine import StreamingEngine  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    S = int(args[0]) if args else 256
    n_ticks = int(args[1]) if len(args) > 1 else 8
    tiny = "--tiny" in sys.argv
    on_acc = jax.devices()[0].platform not in ("cpu",) and not tiny

    model = bench._build_model(on_acc)
    beam = 5 if on_acc else 2
    engine = StreamingEngine(model, n_slots=S, beam_size=beam,
                             chunk_samples=bench.CHUNK)
    print("HBM per stream:", flush=True)
    for k, v in engine.hbm_bytes_per_stream().items():
        print(f"  {k:>18}: {v / 1e6:7.2f} MB")

    waves = [bench.synth_audio(64, seed=k) for k in range(S)]
    slots = [engine.acquire_slot() for _ in range(S)]
    A = bench.CHUNK

    def feed(i):
        return {s: waves[k][i * A : (i + 1) * A]
                for k, s in enumerate(slots)}

    # Warmup: compile + reach steady state (several blocks visible).
    warm = 12
    for i in range(warm):
        engine.tick(feed(i))
    jax.block_until_ready(engine.arrays.yseq)

    t_enc, t_rounds, t_host, t_full = [], [], [], []
    for i in range(warm, warm + n_ticks):
        audio = feed(i)
        # Unblocked full tick (what serving sees).
        t0 = time.perf_counter()
        engine.tick(audio)
        jax.block_until_ready(engine.arrays.yseq)
        t_full.append(time.perf_counter() - t0)

    for i in range(warm + n_ticks, warm + 2 * n_ticks):
        audio = feed(i)
        c = engine.c
        slots_l = sorted(k for k in audio if c.active[k])
        do = np.zeros(engine.S, bool)
        batch = np.zeros((engine.S, engine.A), np.float32)
        for s in slots_l:
            a = np.asarray(audio[s])
            # bench.synth_audio is int16 PCM; the engine only normalizes
            # int16/uint8 dtypes on device, so a float32 batch must carry
            # pre-normalized samples or the frontend sees ~1e4-amplitude
            # garbage and the phase profile measures a different workload
            # than the full-tick loop above.
            batch[s] = (a.astype(np.float32) / 32767.0
                        if a.dtype == np.int16 else a)
            do[s] = True
        # Phase split needs the UNFUSED tick (the default fused tick is one
        # indivisible program — there is no encode/rounds boundary to time).
        bk = engine._encode_bookkeeping(do)
        t0 = time.perf_counter()
        engine._dispatch_encode(batch, bk)
        jax.block_until_ready(engine.buffers.enc_out)
        t1 = time.perf_counter()
        engine._apply_encode_counters(bk)
        engine._run_rounds(do)
        jax.block_until_ready(engine.arrays.yseq)
        t2 = time.perf_counter()
        if engine._pending_packed is not None:
            engine._last_packed = np.array(engine._pending_packed)
            engine._pending_packed = None
        t3 = time.perf_counter()
        t_enc.append(t1 - t0)
        t_rounds.append(t2 - t1)
        t_host.append(t3 - t2)

    def ms(xs):
        return f"{1e3 * float(np.mean(xs)):8.1f} ms"

    print(f"S={S}, {n_ticks} ticks (phase-blocked):")
    print(f"  encode (frontend+subsample+blocks): {ms(t_enc)}")
    print(f"  beam rounds (extend+decode):        {ms(t_rounds)}")
    print(f"  packed readback:                    {ms(t_host)}")
    print(f"  FULL tick (unblocked, overlap on):  {ms(t_full)}")


if __name__ == "__main__":
    main()
