from .dwd import split_streams, route_cdc, prune_columns  # noqa: F401
from .dwm import (  # noqa: F401
    first_event_per_key_per_day,
    bounce_detect_batch,
    interval_join,
    enrich_dims,
    sessionize_batch,
)
from .dws import tumbling_agg, window_bounds  # noqa: F401
