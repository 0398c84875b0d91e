import time, numpy as np, jax, sys
from speechcatcher_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import bench
S = int(sys.argv[1])
model = bench._build_model(True)
from speechcatcher_tpu.serve.engine import StreamingEngine
CH=32; FF=4
engine = StreamingEngine(model, n_slots=S, beam_size=5, chunk_samples=8192)
waves=[bench.synth_audio(CH+1, seed=k) for k in range(S)]
slots=[engine.acquire_slot() for _ in range(S)]
stream_of={s:k for k,s in enumerate(slots)}
age={s:0 for s in slots}
next_final={s:max(5,(k%CH)+1) for k,s in enumerate(slots)}
pending={}
tick_t=[]; flush_t=[]
for i in range(63):
    t0=time.perf_counter()
    batch={}
    for s in list(age):
        if s in pending: continue
        k=stream_of[s]; a=waves[k]
        pos=(age[s]*8192)%(len(a)-8192)
        c2=a[pos:pos+8192]
        if age[s]>=next_final[s]: pending[s]=c2
        else: batch[s]=c2; age[s]+=1
    if batch: engine.tick(batch)
    t1=time.perf_counter()
    nf=0
    if pending and i%FF==FF-1:
        nf=len(pending)
        engine.finalize_batch(pending)
        rejoin=[]
        for s in list(pending):
            rejoin.append(stream_of.pop(s)); del age[s]; del next_final[s]
        pending.clear()
        for k in rejoin:
            s2=engine.acquire_slot(); stream_of[s2]=k; age[s2]=0; next_final[s2]=CH
    t2=time.perf_counter()
    if i>=39:
        tick_t.append((t1-t0)*1000)
        if nf: flush_t.append((t2-t1)*1000)
        print(f"tick {i}: tick={1000*(t1-t0):.0f} n={len(batch)} flush={1000*(t2-t1):.0f} nf={nf}", flush=True)
print(f"S={S}: tick mean {np.mean(tick_t):.0f} ms; flush mean {np.mean(flush_t):.0f} ms over {len(flush_t)}; combined mean {(np.sum(tick_t)+np.sum(flush_t))/len(tick_t):.0f} ms")
