"""Device-op profile of the serving engine's steady-state tick.

Captures a jax.profiler trace of N steady-state ticks (with finalization
churn, like bench.py's measured window) and aggregates XLA op self-times
from the xplane proto, attributing each op to its HLO-module (= engine
program) and op category. This is the ground-truth "where do the
milliseconds go" tool — tools/profile_tick.py gives phase-level numbers
but loses dispatch overlap and double-pays axon-relay syncs.

    python tools/profile_xplane.py [S] [ticks]

CPU smoke: JAX_PLATFORMS=cpu python tools/profile_xplane.py 4 2 --tiny
"""

import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speechcatcher_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from speechcatcher_tpu.serve.engine import StreamingEngine  # noqa: E402


def aggregate(xspace_path):
    """Sum per-op device durations from one xplane.pb.

    Module attribution uses TIME CONTAINMENT against the "XLA Modules"
    line (one event per program execution) — op events carry no usable
    module stat on this TPU runtime. NB: while/scan op durations INCLUDE
    their body ops, which are also reported individually — per-module op
    sums therefore double-count loop bodies; the module wall times
    (by_module) are authoritative."""
    import bisect

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xspace_path, "rb") as f:
        xs.ParseFromString(f.read())

    by_op = collections.Counter()
    by_module = collections.Counter()
    by_category = collections.Counter()
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        mods = []
        op_line = None
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    mods.append(
                        (ev.offset_ps, ev.offset_ps + ev.duration_ps,
                         md.name)
                    )
            elif line.name == "XLA Ops":
                op_line = line
        mods.sort()
        starts = [m[0] for m in mods]
        for st0, en0, nm in mods:
            by_module[nm] += en0 - st0
        if op_line is None:
            continue
        for ev in op_line.events:
            md = plane.event_metadata[ev.metadata_id]
            dur = ev.duration_ps
            total_ps += dur
            cat = ""
            for st in list(ev.stats) + list(md.stats):
                nm = stat_names.get(st.metadata_id, "")
                if nm == "hlo_category" and st.str_value:
                    cat = st.str_value
            i = bisect.bisect_right(starts, ev.offset_ps) - 1
            owner = (
                mods[i][2]
                if 0 <= i < len(mods) and ev.offset_ps < mods[i][1]
                else "?"
            )
            by_op[(owner, md.name)] += dur
            by_category[cat] += dur
    return by_op, by_module, by_category, total_ps


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    S = int(args[0]) if args else 288
    n_ticks = int(args[1]) if len(args) > 1 else 8
    tiny = "--tiny" in sys.argv
    on_acc = jax.devices()[0].platform not in ("cpu",) and not tiny

    model = bench._build_model(on_acc)
    beam = 5 if on_acc else 2
    engine = StreamingEngine(model, n_slots=S, beam_size=beam,
                             chunk_samples=bench.CHUNK)
    churn = bench.CHURN_PERIOD if on_acc else 5
    waves = [bench.synth_audio(churn + 1, seed=k) for k in range(S)]
    slots = [engine.acquire_slot() for _ in range(S)]
    A = bench.CHUNK
    ages = [(k * churn) // max(S, 1) for k in range(S)]

    # Finals accumulate across ticks until a flush tick and the slot gets
    # no more audio meanwhile, exactly like bench.measure's `pending`
    # dict — dropping non-flush-tick finals would under-represent
    # finalize/drain load ~FINAL_FLUSHx and let never-finalized slots
    # grow into the capacity stall.
    pending_finals: dict = {}  # slot -> stream index, awaiting flush

    def tick(i):
        audio = {}
        for k, s in enumerate(slots):
            if s in pending_finals:
                continue  # awaiting the next finals flush
            age = ages[k]
            if age >= churn:  # utterance over: await the batched finalize
                pending_finals[s] = k
                continue
            audio[s] = waves[k][age * A:(age + 1) * A]
            ages[k] += 1
        if pending_finals and i % bench.FINAL_FLUSH == 0:
            # Mirror bench.measure: finalize with the utterance's last
            # chunk, no release_slot (finalize_batch frees the slots and
            # leaves them clean — release_slot would run an extra reset
            # program per slot and skew the trace).
            engine.finalize_batch(
                {s: waves[0][:bench.CHUNK] for s in pending_finals}
            )
            for s, k in pending_finals.items():
                engine.acquire_slot()
                ages[k] = 0
            pending_finals.clear()
        engine.tick(audio)

    warm = max(2 * bench.FINAL_FLUSH, 8)
    for i in range(warm):
        tick(i)
    jax.block_until_ready(engine.arrays.yseq)

    tracedir = tempfile.mkdtemp(prefix="xplane_")
    with jax.profiler.trace(tracedir):
        for i in range(warm, warm + n_ticks):
            tick(i)
        jax.block_until_ready(engine.arrays.yseq)

    pbs = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        print("no xplane.pb produced", file=sys.stderr)
        sys.exit(1)
    by_op, by_module, by_category, total_ps = aggregate(pbs[0])
    ms = 1e-9  # ps -> ms
    n = n_ticks
    print(f"S={S}, {n} traced ticks; device busy "
          f"{total_ps*ms:.1f} ms total = {total_ps*ms/n:.1f} ms/tick")
    print("\nBy HLO module (program):")
    for mod, ps in by_module.most_common(12):
        print(f"  {ps*ms/n:8.2f} ms/tick  {mod or '?'}")
    print("\nBy op category:")
    for cat, ps in by_category.most_common(15):
        print(f"  {ps*ms/n:8.2f} ms/tick  {cat or '?'}")
    print("\nTop ops (while/scan durations include their bodies):")
    for (mod, op), ps in by_op.most_common(30):
        print(f"  {ps*ms/n:8.2f} ms/tick  [{mod.split('(')[0][:24]}] "
              f"{op[:80]}")


if __name__ == "__main__":
    main()
