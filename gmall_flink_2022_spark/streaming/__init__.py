from .runner import run_stream_to_table  # noqa: F401
from .uv_state import unique_visit_stateful  # noqa: F401
from .bounce_state import bounce_detect_stateful  # noqa: F401
