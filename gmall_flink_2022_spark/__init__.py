"""PySpark-native analytics engine with the query surface of
flickever/gmall-flink-2022 (a Flink 1.12 real-time e-commerce warehouse),
re-expressed Spark-first: DataFrame/SQL + Catalyst for batch, Structured
Streaming for streams.

Layout
------
- ``session``    : SparkSession factory with pinned, oracle-parity configs.
- ``schemas``    : every log/CDC/bean schema from the reference as StructType.
- ``sources``    : source/sink abstraction (parquet | kafka | memory | rate),
                   CDC envelope parsing, behavior-log parsing w/ dirty split.
- ``operators``  : DWD/DWM/DWS/ADS layer transformations (DataFrame -> DataFrame),
                   batch/stream agnostic where Spark allows.
- ``functions``  : scalar function surface (time helpers, tokenizer UDTF-style).
- ``streaming``  : stateful streaming variants (UV exact-TTL dedup, CEP bounce),
                   watermark helpers, multi-sink runner.
- ``plans``      : the query registry — each SURVEY.md §2 operator rendered over
                   the driver testdata, paired with a DuckDB oracle SQL string.
- ``llm``        : 100 TB-scale training-data pipeline extensions: dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
                   ANN similarity search, text analysis, multimodal columns.
"""

__version__ = "0.1.0"
