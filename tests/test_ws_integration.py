"""Full websocket integration smoke: real server + real client on localhost.

Opt-in (RUN_WS_SMOKE=1): first-tick compiles make it slow on CPU. Verified
behaviors: Vosk config message, PCM streaming, partial replies, eof →
final {"result": [...], "text": ...} with word timings, serving metrics.
"""

import asyncio
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_WS_SMOKE") != "1",
    reason="slow integration smoke; set RUN_WS_SMOKE=1",
)


def test_websocket_roundtrip():
    websockets = pytest.importorskip("websockets")

    from speechcatcher_tpu.config import tiny_config
    from speechcatcher_tpu.models.asr_model import ASRModel
    from speechcatcher_tpu.serve.engine import StreamingEngine
    from speechcatcher_tpu.serve.server import (
        SessionManager,
        _batcher,
        recognize_ws,
    )

    async def main():
        model = ASRModel.random_init(tiny_config(), seed=3)
        engine = StreamingEngine(model, n_slots=2, beam_size=2)
        manager = SessionManager(engine, finalize_update_iters=3)
        batch_task = asyncio.create_task(_batcher(manager, 0.01))

        async def handler(conn):
            await recognize_ws(conn, manager)

        async with websockets.serve(handler, "localhost", 27999):
            async with websockets.connect("ws://localhost:27999") as ws:
                await ws.send(json.dumps({"config": {"sample_rate": 16000}}))
                rng = np.random.RandomState(0)
                t = np.arange(32768) / 16000
                pcm = (
                    np.clip(
                        0.4 * np.sin(2 * np.pi * 280 * t)
                        + 0.05 * rng.randn(len(t)),
                        -1, 1,
                    ) * 30000
                ).astype(np.int16)
                msgs = []

                async def recv():
                    try:
                        async for m in ws:
                            msgs.append(json.loads(m))
                    except Exception:
                        pass

                rt = asyncio.create_task(recv())
                for i in range(0, len(pcm), 3200):
                    await ws.send(pcm[i : i + 3200].tobytes())
                    await asyncio.sleep(0.02)
                await ws.send(json.dumps({"eof": 1}))
                for _ in range(120):
                    await asyncio.sleep(1.0)
                    if any("result" in m for m in msgs):
                        break
                rt.cancel()

                finals = [m for m in msgs if "result" in m]
                assert finals, "no final result over the wire"
                for w in finals[-1]["result"]:
                    assert set(w) == {"conf", "start", "end", "word"}
                snap = manager.metrics.snapshot()
                assert snap["total_finals"] >= 1
        batch_task.cancel()

    asyncio.run(main())
