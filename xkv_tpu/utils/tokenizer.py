"""Tokenizer shims.

The reference wraps NeMo-SP / HF / tiktoken / Gemini tokenizers behind a
uniform interface (`evaluate/data/ruler/tokenizer.py:25-35`). Here:

  * ``load_tokenizer(path)`` — HF AutoTokenizer from a local dir (no network).
  * ``ByteTokenizer`` — offline byte-level tokenizer for tests and synthetic
    benchmarks: encode = UTF-8 bytes (+0 reserved for pad/eos), decode =
    bytes back to text. vocab_size 258.
"""

from __future__ import annotations

from typing import List


class ByteTokenizer:
    """Deterministic offline tokenizer: one token per UTF-8 byte.

    ids: 0 = pad, 1 = bos, 2 = eos, byte b -> 3 + b.
    """

    pad_token_id = 0
    bos_token_id = 1
    eos_token_id = 2
    vocab_size = 259
    name_or_path = "byte-tokenizer"

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = [3 + b for b in text.encode("utf-8")]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, text: str, **kw):
        return {"input_ids": self.encode(text, kw.get("add_special_tokens", False))}

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        data = bytes(int(i) - 3 for i in ids if int(i) >= 3)
        return data.decode("utf-8", errors="ignore")


def load_tokenizer(name_or_path: str):
    if name_or_path in ("byte", "bytes", "byte-tokenizer"):
        return ByteTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(name_or_path, trust_remote_code=True)
