"""Tokenizer (SURVEY §2.7 U1) — the reference's `split_words` UDTF
(function/SplitFunction.java:11-26, jieba-style segmentation via IK analyzer
in utils/KeywordUtil.java:11-14, used with LATERAL TABLE in
dws/KeywordStatsApp.java:40-45).

Spark-native rendering: an array-returning expression + ``explode`` — the
idiomatic table-function shape. The default path is a pure JVM regex split
(whole-stage codegen); a Python analyzer (jieba) can be plugged in as a
pandas UDF when the library is present, gated behind an import-try.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# word = run of letters/digits (BPE-ish fallback: CJK chars become
# single-char tokens since there is no dictionary segmentation JVM-side).
_WORD_RE = r"[^\p{L}\p{N}]+"


def tokenize_col(col: Column | str, lowercase: bool = True) -> Column:
    """String -> array<string> of tokens, empty tokens removed."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, _WORD_RE), lambda t: t != "")


def split_words(df: DataFrame, text_col: str, out_col: str = "word") -> DataFrame:
    """The LATERAL TABLE(split_words(text)) equivalent: one row per token.
    Implements the *intended* semantics — the reference's :19 collects the
    full string instead of each token (bug catalogued in SURVEY §5)."""
    return df.withColumn(out_col, F.explode(tokenize_col(text_col)))


def try_jieba_tokenizer():
    """Optional Chinese segmentation via jieba (not in this container —
    returns None; callers fall back to the regex tokenizer)."""
    try:
        import jieba  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def jieba_cut(s: pd.Series) -> pd.Series:
        import jieba

        return s.map(lambda x: [t for t in jieba.cut(x or "") if t.strip()])

    return jieba_cut
