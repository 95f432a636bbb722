"""PII / toxicity scrubbing — compiled-regex actor-pool stage.

The regex set is compiled once per actor in ``__init__`` (the
reference's stateful-transform pattern, ray_transformation.py:30-74)
and applied per batch. Patterns are RE2-compatible (no lookaround /
backrefs) so the DuckDB oracle (`regexp_replace(..., 'g')`) produces
byte-identical output — that equivalence is the scrub half of the
north rule's per-row invariant.

Pattern application order is part of the contract (EMAIL before PHONE
before IP before long digit runs) and must match the oracle SQL.
"""

from __future__ import annotations

import re

import pyarrow as pa

# (name, pattern, replacement) — ORDER MATTERS and is mirrored in SQL.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("longnum", r"\b[0-9]{9,}\b", "<NUM>"),
]

TOXIC_WORDS = ["badword1", "badword2", "slur1"]  # placeholder lexicon
_TOXIC_PATTERN = r"\b(" + "|".join(TOXIC_WORDS) + r")\b"


class Scrubber:
    """Callable actor class: rewrites ``text_col`` into ``out_col`` with
    PII masked and lexicon words redacted. Arrow in / Arrow out.

    ``only_where`` names a boolean column: rows where it is false get a
    null ``out_col`` (scrub effort is spent on kept docs only)."""

    def __init__(self, text_col: str = "text", out_col: str = "text_scrubbed",
                 include_toxic: bool = True, only_where: str | None = None):
        self.text_col = text_col
        self.out_col = out_col
        self.only_where = only_where
        self.patterns = [
            (re.compile(pat), repl) for _, pat, repl in PII_PATTERNS
        ]
        if include_toxic:
            self.patterns.append((re.compile(_TOXIC_PATTERN, re.IGNORECASE), "<TOX>"))
        # fast path: one combined scan decides whether ANY pattern can
        # match; clean documents (the common case) skip the per-pattern
        # passes entirely. Replacement still applies patterns
        # SEQUENTIALLY — that order is the contract the SQL oracle's
        # nested regexp_replace mirrors.
        parts = [p for _, p, _ in PII_PATTERNS]
        if include_toxic:
            parts.append(f"(?i:{_TOXIC_PATTERN})")
        self.prescan = re.compile("|".join(f"(?:{p})" for p in parts))

    def scrub(self, text: str) -> str:
        if self.prescan.search(text) is None:
            return text
        for rx, repl in self.patterns:
            text = rx.sub(repl, text)
        return text

    # every PII pattern requires a digit or '@'; toxic needs a lexicon
    # word — one vectorized RE2 kernel finds the candidate rows and
    # clean documents (the common case) never enter Python at all
    _CANDIDATE_RE = r"[0-9@]"

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow.compute as pc

        col = batch[self.text_col].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())
        cand = pc.match_substring_regex(col, self._CANDIDATE_RE).to_numpy(
            zero_copy_only=False
        )
        has_toxic = any(repl == "<TOX>" for _, repl in self.patterns)
        if has_toxic:
            cand = cand | pc.match_substring_regex(
                col, f"(?i:{_TOXIC_PATTERN})"
            ).to_numpy(zero_copy_only=False)
        # dirty-path VECTORIZED: take the candidate rows, run the
        # pattern chain as RE2 column kernels (same engine the DuckDB
        # oracle uses — byte-identity is exactly what the oracle
        # verifies), scatter back. Clean docs never leave the prescan;
        # no per-row Python on either path (the r2 shape ran re.sub
        # per candidate row — ~20% of the fused scorer's CPU on the
        # PII-decorated bench corpus where most docs carry digits).
        idx = np.flatnonzero(cand)
        if len(idx):
            sub = pc.take(col, pa.array(idx, pa.int64()))
            for _, pat, repl in PII_PATTERNS:
                sub = pc.replace_substring_regex(
                    sub, pattern=pat, replacement=repl
                )
            if has_toxic:
                sub = pc.replace_substring_regex(
                    sub, pattern=f"(?i:{_TOXIC_PATTERN})", replacement="<TOX>"
                )
            mask = np.zeros(len(col), dtype=bool)
            mask[idx] = True
            out = pc.replace_with_mask(
                col, pa.array(mask), sub.combine_chunks()
                if isinstance(sub, pa.ChunkedArray) else sub
            )
        else:
            out = col
        if self.only_where is not None:
            keep = batch[self.only_where]
            out = pc.if_else(keep, out, pa.scalar(None, pa.string()))
        return batch.append_column(self.out_col, out)
