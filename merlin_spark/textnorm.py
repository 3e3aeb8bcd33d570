r"""Deterministic text normalization — the one transform applied to
``text`` before MERGE (BASELINE.json:6: "vectorized Arrow/pandas UDFs
for text normalization (no per-row Python)").

The normalization spec is pinned here in ONE pure-Python function so the
Spark pandas UDF and the pandas/DuckDB convergence oracle (SURVEY.md §5.2)
apply byte-identical rules:

  1. Unicode NFC normalization.
  2. Strip C0 control characters (except \t \n \r which are folded by 3).
  3. Collapse every run of ASCII whitespace to a single space. (Pinned
     to the ASCII class — NOT python \s, which is unicode-aware — so
     the spec is byte-identical across Python re, RE2, and the DuckDB
     oracle's regexp_replace; unicode spaces are treated as content.)
  4. Strip leading/trailing ASCII whitespace.

Deterministic ⇒ replay converges regardless of batching (BASELINE.json:6).
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_WS_RE = re.compile(r"[ \t\n\r\x0b\x0c]+")
# C0 controls minus \t(09) \n(0a) \r(0d) which are whitespace (handled
# by the collapse step); those left are stripped outright.
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def normalize_str(s: str | None) -> str | None:
    """Pure-Python spec — imported by the oracle; keep in sync with
    ``_normalize_series`` below (they share the same regexes)."""
    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = _CTRL_RE.sub("", s)
    s = _WS_RE.sub(" ", s)
    return s.strip(" \t\n\r\x0b\x0c")


def _normalize_series(s: pd.Series) -> pd.Series:
    # Vectorized pandas string ops — no per-row Python in the UDF body
    # except the C-implemented unicodedata.normalize map (no pure-Python
    # loop; pandas .map dispatches to the C function per element, and
    # .str.* ops are vectorized).
    out = s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)
    out = out.str.replace(_CTRL_RE, "", regex=True)
    out = out.str.replace(_WS_RE, " ", regex=True)
    return out.str.strip(" \t\n\r\x0b\x0c")


@pandas_udf(StringType())
def normalize_text(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator-form scalar pandas UDF (amortizes per-batch setup;
    SURVEY.md §2.9). Arrow-batched, JVM↔Python transfer vectorized."""
    for s in it:
        yield _normalize_series(s)
