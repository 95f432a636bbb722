"""Language identification — stateful actor-pool stage.

A fastText-style classifier is not available in the sandbox, so the
model is a deterministic function-word / script profile classifier
(the classic n-gram/stopword heuristic). What matters for the engine is
the *execution shape*, which follows the reference's documented
stateful-transform pattern (transformation/ray_transformation.py:30-74;
embedder actors feast/embedder.py:49-120): model tables are built ONCE
per actor in ``__init__`` and applied per batch in ``__call__`` —
``ds.map_batches(LangIdModel, concurrency=(lo,hi), batch_size=B)``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a and of to in is it that for on with as are this be at or from".split()
    ),
    "de": frozenset(
        "der die das und ist nicht ein eine zu den von mit sich auf für im".split()
    ),
    "fr": frozenset(
        "le la les et de des un une est pas que pour dans sur avec au du".split()
    ),
    "es": frozenset(
        "el la los las y de que en un una es no por con para su al como".split()
    ),
}
_CJK_RE = re.compile(r"[一-鿿]")
_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


class LangIdModel:
    """Callable class for an actor-pool ``map_batches`` stage.

    Emits ``lang_pred`` (one of en/de/fr/es/zh/und) and
    ``lang_conf`` in [0,1]. Deterministic: ties resolve in fixed
    profile order, zh wins on CJK-character ratio > 0.15.
    """

    CJK_THRESHOLD = 0.15

    def __init__(self, text_col: str = "text"):
        # once per actor: "load the model" (compile regexes, freeze
        # profile tables into fast lookup sets)
        self.text_col = text_col
        self.token_re = _TOKEN_RE
        self.cjk_re = _CJK_RE
        self.profiles = list(_PROFILES.items())

    def predict(self, text: str) -> tuple[str, float]:
        n_chars = len(text)
        if n_chars == 0:
            return "und", 0.0
        cjk = len(self.cjk_re.findall(text))
        if cjk / n_chars > self.CJK_THRESHOLD:
            return "zh", min(1.0, cjk / n_chars)
        toks = self.token_re.findall(text.lower())
        if not toks:
            return "und", 0.0
        best_lang, best = "und", 0
        for lang, prof in self.profiles:
            score = sum(1 for t in toks if t in prof)
            if score > best:
                best_lang, best = lang, score
        if best == 0:
            return "und", 0.0
        return best_lang, best / len(toks)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = [self.predict(t) for t in batch[self.text_col].tolist()]
        batch = batch.copy()
        batch["lang_pred"] = np.array([p[0] for p in preds], dtype=object)
        batch["lang_conf"] = np.array([p[1] for p in preds], dtype=np.float64)
        return batch
