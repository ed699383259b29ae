from .timeutil import to_ts, date_str, hour_of, yyyymmdd_int, age_years  # noqa: F401
from .tokenize import tokenize_col, split_words  # noqa: F401
