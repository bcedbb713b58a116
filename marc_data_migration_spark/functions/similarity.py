"""Normalized-text similarity — operators F3/A4 (SURVEY.md §2.6, §2.4).

The reference gates its field-level merge on fuzzywuzzy
``token_sort_ratio`` (fuzzy_match.py:21,38) with thresholds 100 /
fuzzy_match_ratio (record_update.py:352-443). fuzzywuzzy is not a
sandbox dependency, so we pin our own implementation:

- ``full_process``: lowercase, non-alphanumeric → space, trim
  (fuzzywuzzy.utils.full_process semantics).
- ``ratio``: int(round(100 * 2*M / (len_a + len_b))) where M is total
  matching-block length from difflib.SequenceMatcher(autojunk=False) —
  the classic Ratcliff/Obershelp ratio fuzzywuzzy falls back to without
  python-Levenshtein.
- ``token_sort_ratio``: ratio() over the space-joined sorted token
  lists of the processed strings.

Exposed to Spark as Arrow-vectorized pandas UDFs (batched transfer,
per-pair compute — there is no Catalyst built-in for edit ratio).
The Jaccard audit metric (A4, utils.py:244-254) IS expressible with
built-ins and stays JVM-side.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]+")


def full_process(s: str | None) -> str:
    if s is None:
        return ""
    return _NON_ALNUM.sub(" ", s).lower().strip()


def ratio_py(a: str | None, b: str | None) -> int:
    a, b = full_process(a), full_process(b)
    if not a and not b:
        return 0
    m = SequenceMatcher(None, a, b, autojunk=False)
    total = sum(bl.size for bl in m.get_matching_blocks())
    return int(round(200.0 * total / (len(a) + len(b)))) if (a or b) else 0


def token_sort_ratio_py(a: str | None, b: str | None) -> int:
    sa = " ".join(sorted(full_process(a).split()))
    sb = " ".join(sorted(full_process(b).split()))
    if not sa and not sb:
        return 0
    m = SequenceMatcher(None, sa, sb, autojunk=False)
    total = sum(bl.size for bl in m.get_matching_blocks())
    return int(round(200.0 * total / (len(sa) + len(sb))))


@F.pandas_udf(T.IntegerType())
def token_sort_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [token_sort_ratio_py(x, y) for x, y in zip(a, b)], dtype="int32"
    )


@F.pandas_udf(T.IntegerType())
def fuzz_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([ratio_py(x, y) for x, y in zip(a, b)], dtype="int32")


def jaccard_tokens(a: Column | str, b: Column | str) -> Column:
    """A4: word-set Jaccard similarity, pure built-ins (JVM-side):
    |tokens(a) ∩ tokens(b)| / |tokens(a) ∪ tokens(b)| (utils.py:244-254)."""
    ca = F.split(F.col(a) if isinstance(a, str) else a, r"\s+")
    cb = F.split(F.col(b) if isinstance(b, str) else b, r"\s+")
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(F.array_union(ca, cb))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
