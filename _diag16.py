import time, numpy as np, jax, sys
from speechcatcher_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import bench
import speechcatcher_tpu.serve.engine as E
S = int(sys.argv[1]) if len(sys.argv) > 1 else 176
model = bench._build_model(True)
acc = {}
def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(out)
        acc.setdefault(name, []).append((time.perf_counter()-t0)*1000)
        return out
    return wrap
E._fused_encode = timed("encode", E._fused_encode)
E._fused_round = timed("round", E._fused_round)
engine = E.StreamingEngine(model, n_slots=S, beam_size=5, chunk_samples=8192)
waves=[bench.synth_audio(33, seed=k) for k in range(S)]
slots=[engine.acquire_slot() for _ in range(S)]
for i in range(30):
    engine.tick({s: waves[k][(i*8192)%(32*8192):(i*8192)%(32*8192)+8192] for k,s in enumerate(slots)})
for name, v in acc.items():
    v = v[12:]
    print(f"{name}: mean {np.mean(v):.0f} ms  (n={len(v)})", flush=True)
