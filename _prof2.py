import time, numpy as np, jax
from speechcatcher_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import bench
import speechcatcher_tpu.serve.engine as E
model = bench._build_model(True)
S=256
engine = E.StreamingEngine(model, n_slots=S, beam_size=5, chunk_samples=8192)
waves=[bench.synth_audio(34, seed=k) for k in range(S)]
slots=[engine.acquire_slot() for _ in range(S)]
for i in range(32):
    engine.tick({s: waves[k][i*8192:(i+1)*8192] for k,s in enumerate(slots)})
# finalize 32 slots (bucket 32), warm once with the first 32, trace the 2nd
t0=time.perf_counter()
engine.finalize_batch({slots[k]: waves[k][32*8192:33*8192] for k in range(32)})
print(f"warm flush: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
jax.block_until_ready(engine.arrays)
with jax.profiler.trace("/tmp/jaxtrace2"):
    t0=time.perf_counter()
    engine.finalize_batch({slots[k]: waves[k][32*8192:33*8192] for k in range(32,64)})
    jax.block_until_ready(engine.arrays)
    print(f"traced flush: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
