from .registry import REGISTRY, QueryDef, register, queries, oracle_sql  # noqa: F401
from . import warehouse  # noqa: F401  (registers warehouse queries)
from . import analytics  # noqa: F401  (registers completeness/scale queries)
from . import scale_plans  # noqa: F401  (registers salted/windowed/UDF queries)
from . import llm_plans  # noqa: F401  (registers LLM-pipeline queries)
from . import streaming_plans  # noqa: F401  (registers streaming-mode queries)
