"""PTB-style caption tokenizer (pure Python 3).

The reference pipeline shells out to the Stanford PTBTokenizer Java jar
inside the vendored coco-caption tool (run.sh:95-98, SURVEY.md C14). This
image has no Java, so the tokenizer is reimplemented: lowercase, PTB-like
splitting of clitics/punctuation, then removal of the same punctuation
token list the COCO wrapper drops. DSTC7 text is already lowercase and
space-separated with punctuation as standalone tokens, so on this data
the approximation is essentially exact.
"""

from __future__ import annotations

import re
from typing import Dict, List

# the punctuation tokens the COCO PTBTokenizer wrapper removes
PUNCTUATIONS = {"''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"}

_CLITIC = re.compile(r"\b(can)(not)\b|(\w+)(n't)\b|(\w+)('(?:s|m|re|ve|ll|d))\b",
                     re.IGNORECASE)
_TOKEN = re.compile(r"\.\.\.|--|''|``|n't|'(?:s|m|re|ve|ll|d)\b"
                    r"|[\w$]+(?:[.-][\w$]+)*|\S", re.IGNORECASE)


def tokenize(text: str) -> List[str]:
    text = text.lower().strip()
    # split clitics the PTB way: don't -> do n't, man's -> man 's
    text = _CLITIC.sub(lambda m: " ".join(g for g in m.groups() if g), text)
    toks = _TOKEN.findall(text)
    return [t for t in toks if t not in PUNCTUATIONS]


def tokenize_corpus(captions: Dict[str, List[str]]) -> Dict[str, List[str]]:
    """{img_id: [sentence, ...]} -> {img_id: ['tok tok ...', ...]}."""
    return {k: [" ".join(tokenize(s)) for s in v]
            for k, v in captions.items()}
