"""Byte-level tokenizer.

Contract of the reference `evo/tokenizer.py:12-58` (CharLevelTokenizer):
  - tokenize(text) = raw UTF-8 bytes (np.frombuffer of text.encode(), uint8)
  - detokenize clamps ids to [32, vocab) before chr()
  - special ids: eod_id = eos_id = 0, pad_id = 1
  - vocab_size = 512

Pure numpy — returns int32 arrays ready for device transfer (the reference
returns torch tensors; here the device boundary is owned by the caller).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class CharLevelTokenizer:
    def __init__(self, vocab_size: int = 512):
        self._vocab_size = vocab_size
        self.eod_id = 0
        self.eos_id = 0
        self.pad_id = 1

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    @property
    def vocab(self) -> int:  # reference exposes both spellings
        return self._vocab_size

    def clamp(self, n: int) -> int:
        return max(32, min(n, self._vocab_size))

    def tokenize(self, text: str) -> np.ndarray:
        return np.frombuffer(text.encode('utf-8'), dtype=np.uint8).astype(
            np.int32)

    def tokenize_batch(self, texts: Sequence[str]) -> List[np.ndarray]:
        return [self.tokenize(t) for t in texts]

    def detokenize(self, ids) -> str:
        ids = np.asarray(ids).reshape(-1)
        return ''.join(chr(self.clamp(int(t))) for t in ids)

    def detokenize_batch(self, batch) -> List[str]:
        return [self.detokenize(row) for row in np.asarray(batch)]
