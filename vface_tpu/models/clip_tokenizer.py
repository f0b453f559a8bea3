"""CLIP byte-level BPE tokenizer, re-derived from the published scheme.

Capability parity with the reference's text prompt path
(`/root/reference/REFace/ldm/modules/encoders/modules.py:178-207`
``FrozenCLIPTextEmbedder`` → HF ``CLIPTokenizer``): byte→printable-unicode
alphabet, rank-driven BPE with ``</w>`` word terminals, the CLIP word-split
pattern, and ``<|startoftext|>``/``<|endoftext|>`` specials with EOS doubling
as the pad token.

Text cleaning follows the tokenizer's no-ftfy path (ftfy is absent both here
and in the environment the oracle test runs in): control-char stripping, CJK
spacing, NFC normalisation, whitespace-collapse, lowercasing. The OpenAI
vocab/merges data files are not bundled in this environment — load them via
:meth:`CLIPBPETokenizer.from_files` when available; the algorithm itself is
pinned against the HF implementation with a synthetic vocab in
``tests/test_reference_parity.py``.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Dict, List, Sequence, Tuple

import regex as re

import numpy as np

_WORD_PATTERN = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    re.IGNORECASE,
)

BOS = "<|startoftext|>"
EOS = "<|endoftext|>"


def byte_alphabet() -> Dict[int, str]:
    """Reversible byte → printable-unicode map (the GPT-2/CLIP scheme):
    printable latin-1 bytes map to themselves, everything else to 0x100+n in
    increasing byte order, so no token string ever contains whitespace."""
    printable = (
        set(range(0x21, 0x7F)) | set(range(0xA1, 0xAD)) | set(range(0xAE, 0x100))
    )
    table: Dict[int, str] = {}
    shift = 0
    for b in range(256):
        if b in printable:
            table[b] = chr(b)
        else:
            table[b] = chr(0x100 + shift)
            shift += 1
    return table


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


def clean_text(text: str) -> str:
    """The no-ftfy cleaning chain (BasicTokenizer with strip_accents=False,
    do_split_on_punc=False, then whitespace-join): drop control chars, space
    out CJK codepoints, NFC-normalise, collapse whitespace, lowercase."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD:
            continue
        cat = unicodedata.category(ch)
        if cat.startswith("C") and ch not in ("\t", "\n", "\r"):
            continue
        if _is_cjk(cp):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    text = unicodedata.normalize("NFC", "".join(out))
    return " ".join(tok.lower() for tok in text.split())


class CLIPBPETokenizer:
    """Greedy rank-driven BPE over the byte alphabet with ``</w>`` terminals."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]]):
        self.vocab = dict(vocab)
        self.ids_to_tokens = {v: k for k, v in self.vocab.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_map = byte_alphabet()
        self.bos_id = self.vocab[BOS]
        self.eos_id = self.vocab[EOS]
        self.unk_id = self.eos_id  # HF: unk_token == "<|endoftext|>"
        self._cache: Dict[str, List[str]] = {BOS: [BOS], EOS: [EOS]}

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str) -> "CLIPBPETokenizer":
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().strip().split("\n")[1:]  # line 0 is a version header
        merges = [tuple(l.split()) for l in lines if l]
        return cls(vocab, merges)

    # ------------------------------------------------------------------ BPE
    def _bpe(self, word: str) -> List[str]:
        if word in self._cache:
            return self._cache[word]
        parts: List[str] = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            ranked = [(self.ranks[p], i) for i, p in enumerate(pairs) if p in self.ranks]
            if not ranked:
                break
            best_rank = min(r for r, _ in ranked)
            first, second = pairs[[i for r, i in ranked if r == best_rank][0]]
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and parts[i] == first
                    and parts[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._cache[word] = parts
        return parts

    def tokenize(self, text: str) -> List[str]:
        toks: List[str] = []
        for word in _WORD_PATTERN.findall(clean_text(text)):
            mapped = "".join(self.byte_map[b] for b in word.encode("utf-8"))
            toks.extend(self._bpe(mapped))
        return toks

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return [self.vocab.get(t, self.unk_id) for t in tokens]

    # ------------------------------------------------------------- batching
    def __call__(
        self,
        texts: Sequence[str] | str,
        max_length: int | None = None,
        padding: bool = True,
    ):
        """HF-call semantics: bos + tokens + eos per row, padded to the batch
        longest (pad id = eos id), plus the 1/0 attention mask. Returns
        ``{"input_ids": (B, L) int32, "attention_mask": (B, L) int32}``."""
        if isinstance(texts, str):
            texts = [texts]
        rows = []
        for t in texts:
            ids = [self.bos_id] + self.convert_tokens_to_ids(self.tokenize(t)) + [self.eos_id]
            if max_length is not None and len(ids) > max_length:
                ids = ids[: max_length - 1] + [self.eos_id]
            rows.append(ids)
        n = max(len(r) for r in rows)
        if max_length is not None and padding == "max_length":
            n = max_length
        ids_arr = np.full((len(rows), n), self.eos_id, np.int32)
        mask = np.zeros((len(rows), n), np.int32)
        for i, r in enumerate(rows):
            ids_arr[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids_arr, "attention_mask": mask}
