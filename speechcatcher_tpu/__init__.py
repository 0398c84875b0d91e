"""speechcatcher_tpu — a TPU-native streaming speech-recognition framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
speechcatcher (speechcatcher-asr/speechcatcher): streaming contextual-block
transformer ASR with blockwise synchronous beam search (joint CTC-prefix +
attention-decoder scoring), token-level timestamps, dynamic endpointing,
batch file decoding, live transcription, and a Vosk-compatible websocket
server — redesigned for TPU: fixed-shape jit-compiled chunk steps, device-
resident stream state, and batched multi-stream decoding on one chip.

Public API (mirrors the reference package surface,
/root/reference/speechcatcher/speechcatcher.py:50,126,358,414,682):

    load_model(tag, ...)            -> Speech2TextStreaming
    recognize(s2t, pcm, rate, ...)  -> (text, aux_info)
    recognize_file(s2t, path, ...)  -> dict
    Speech2TextStreaming(...)(speech, is_final) -> [(text, tokens, ids, pos)]
    tags                            -> model-zoo tag registry
"""

__version__ = "0.1.0"

from speechcatcher_tpu.config import ModelConfig  # noqa: F401

_LAZY = {
    "Speech2TextStreaming": "speechcatcher_tpu.streaming",
    "load_model": "speechcatcher_tpu.recognize",
    "recognize": "speechcatcher_tpu.recognize",
    "recognize_file": "speechcatcher_tpu.recognize",
    "tags": "speechcatcher_tpu.recognize",
}


def __getattr__(name):
    # Lazy imports keep `import speechcatcher_tpu` light (no JAX compile work)
    # and let submodules be developed/tested independently.
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
