"""Serving: batched multi-stream engine + Vosk-compatible websocket server."""
