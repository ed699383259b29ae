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


# ---------------------------------------------------------------------------
# Deterministic CJK segmentation — the U1 fallback when jieba is absent.
#
# The reference's KeywordUtil (utils/KeywordUtil.java:11-14) does DICTIONARY
# word segmentation (IK analyzer) over Chinese search keywords; the regex
# tokenizer above degrades CJK to per-character tokens. This is the
# deterministic middle path: forward maximum matching (FMM, 正向最大匹配)
# against a small bundled e-commerce lexicon — longest dictionary word wins
# at each position, unknown characters fall back to single-char tokens.
# The identical algorithm is expressible as a DuckDB recursive CTE, so the
# CJK keyword query is hash-checked by the driver like any exact operator.
# ---------------------------------------------------------------------------
CJK_LEXICON: frozenset[str] = frozenset(
    {
        # brands
        "小米", "华为", "苹果", "联想", "荣耀", "三星",
        # products (incl. nested entries so longest-match is observable:
        # 平板电脑 must win over 平板 + 电脑)
        "手机", "平板电脑", "平板", "电脑", "笔记本", "电视机", "电视",
        "耳机", "充电器", "数据线",
        # actions / query words a search box sees
        "购买", "优惠", "价格", "评价", "旗舰店",
    }
)
_CJK_MAXLEN = max(len(w) for w in CJK_LEXICON)
_CJK_RANGES = (
    (0x4E00, 0x9FFF),  # CJK unified
    (0x3400, 0x4DBF),  # ext A
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def fmm_segment(s: str) -> list[str]:
    """Forward maximum matching over a pure-CJK string. Mirrored exactly
    by the DuckDB recursive-CTE oracle in dws_keyword_stats_cjk — any
    change here must change that SQL too."""
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        for ln in range(min(_CJK_MAXLEN, n - i), 1, -1):
            w = s[i : i + ln]
            if w in CJK_LEXICON:
                out.append(w)
                i += ln
                break
        else:
            out.append(s[i])
            i += 1
    return out


def segment_mixed(s: str | None) -> list[str]:
    """Mixed-script tokenization: CJK runs go through FMM, everything else
    through the lowercase alnum-run split (same as tokenize_col)."""
    import re

    if not s:
        return []
    out: list[str] = []
    for run in re.findall(r"[㐀-䶿一-鿿]+|[^㐀-䶿一-鿿]+", s):
        if _is_cjk(run[0]):
            out.extend(fmm_segment(run))
        else:
            out.extend(t for t in re.split(r"[^a-z0-9]+", run.lower()) if t)
    return out


def cjk_tokens_udf():
    """Arrow-batched pandas UDF: string -> array<string> via segment_mixed.
    Python is unavoidable here (dictionary longest-match is not a built-in
    expression); the batch transfer keeps it off the per-row slow path.
    Prefers jieba when installed (same call surface), FMM otherwise."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    jieba = try_jieba_tokenizer()
    if jieba is not None:
        return jieba

    def cjk_cut(s):
        return s.map(segment_mixed)

    # real class objects, not strings: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's type inference rejects
    cjk_cut.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(cjk_cut, "array<string>")


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
