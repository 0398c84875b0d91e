"""SentencePiece model reading + ESPnet token-list construction.

Inference only needs id→piece lookup and "▁"→space detokenization
(/root/reference/speechcatcher/speech2text_streaming.py:107-129,522-531).
A minimal protobuf wire-format reader extracts the pieces from bpe.model so
the C++ sentencepiece library is optional (used when importable).

ESPnet vocabulary layout (speech2text_streaming.py:116-123):
    ["<blank>", sp.IdToPiece(0), sp.IdToPiece(3..N-1), "<sos/eos>"]
(SentencePiece ids 1=<s> and 2=</s> are dropped.)
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import List, Optional, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:  # varint
        _, pos = _read_varint(buf, pos)
    elif wire_type == 1:  # 64-bit
        pos += 8
    elif wire_type == 2:  # length-delimited
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire_type == 5:  # 32-bit
        pos += 4
    else:
        raise ValueError(f"Unsupported protobuf wire type {wire_type}")
    return pos


def _parse_sentencepiece(buf: bytes) -> Tuple[str, float, int]:
    """Parse one SentencePiece message: piece(1)=string, score(2)=float,
    type(3)=enum (1=NORMAL, 2=UNKNOWN, 3=CONTROL, ...)."""
    pos = 0
    piece, score, ptype = "", 0.0, 1
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            n, pos = _read_varint(buf, pos)
            piece = buf[pos : pos + n].decode("utf-8")
            pos += n
        elif field == 2 and wt == 5:
            (score,) = struct.unpack("<f", buf[pos : pos + 4])
            pos += 4
        elif field == 3 and wt == 0:
            ptype, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wt)
    return piece, score, ptype


def read_sentencepiece_pieces(model_path: Path) -> List[str]:
    """Read the ordered piece table from a .model file (ModelProto field 1)."""
    buf = Path(model_path).read_bytes()
    pieces: List[str] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            n, pos = _read_varint(buf, pos)
            piece, _, _ = _parse_sentencepiece(buf[pos : pos + n])
            pieces.append(piece)
            pos += n
        else:
            pos = _skip_field(buf, pos, wt)
    return pieces


class Tokenizer:
    """ESPnet-vocabulary tokenizer over a SentencePiece model."""

    def __init__(self, token_list: List[str]):
        self.token_list = token_list
        self.vocab_size = len(token_list)
        self.blank_id = 0
        self.unk_id = 1
        self.sos_id = self.eos_id = self.vocab_size - 1
        self._piece_to_id = {p: i for i, p in enumerate(token_list)}

    @classmethod
    def from_sentencepiece(cls, model_path: Path) -> "Tokenizer":
        try:
            import sentencepiece as spm  # optional C++ library

            sp = spm.SentencePieceProcessor()
            sp.Load(str(model_path))
            pieces = [sp.IdToPiece(i) for i in range(sp.GetPieceSize())]
        except ImportError:
            pieces = read_sentencepiece_pieces(model_path)
        token_list = (
            ["<blank>", pieces[0]] + list(pieces[3:]) + ["<sos/eos>"]
        )
        return cls(token_list)

    @classmethod
    def dummy(cls, vocab_size: int) -> "Tokenizer":
        """Synthetic tokenizer for tests (no model file needed)."""
        n_pieces = vocab_size - 2
        pieces = ["<unk>"] + [f"▁t{i}" for i in range(n_pieces - 1)]
        return cls(["<blank>"] + pieces + ["<sos/eos>"])

    def ids_to_tokens(self, ids) -> List[str]:
        return [self.token_list[int(i)] for i in ids]

    def text_to_ids(self, text: str) -> List[int]:
        """Tokenize text → ESPnet-vocabulary ids (training targets).

        Inference never needs this; training does (reference trains via
        ESPnet externally, README.md:238-244). Exact SentencePiece
        segmentation needs the merge scores the wire-format reader drops,
        so this uses greedy longest-match over the piece table — for BPE
        vocabularies this matches SentencePiece on the vast majority of
        words and is deterministic, which is all the trainer requires.
        Characters no piece covers map to ``unk_id``.
        """
        text = " ".join(text.split())  # collapse whitespace
        spm_text = "▁" + text.replace(" ", "▁")
        ids: List[int] = []
        pos = 0
        max_piece = max((len(p) for p in self._piece_to_id), default=1)
        while pos < len(spm_text):
            for n in range(min(max_piece, len(spm_text) - pos), 0, -1):
                tid = self._piece_to_id.get(spm_text[pos : pos + n])
                if tid is not None:
                    ids.append(tid)
                    pos += n
                    break
            else:
                if spm_text[pos] != "▁":  # bare word-boundary: no piece —
                    ids.append(self.unk_id)  # skip silently like ESPnet
                pos += 1
        return ids

    def ids_to_text(self, ids) -> str:
        """Filtered detokenization (speech2text_streaming.py:513-531)."""
        special = {self.blank_id, self.unk_id, self.sos_id}
        toks = [self.token_list[int(i)] for i in ids if int(i) not in special]
        return "".join(toks).replace("▁", " ").strip()


def find_bpe_model(model_dir: Path) -> Optional[Path]:
    """bpe.model search list (reference speech2text_streaming.py:101-105)."""
    candidates = [
        model_dir / "bpe.model",
        *sorted(model_dir.parent.glob("data/*_token_list/**/bpe.model")),
        *sorted(model_dir.glob("**/bpe.model")),
    ]
    for p in candidates:
        if p.exists():
            return p
    return None
