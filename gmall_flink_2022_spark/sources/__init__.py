from .io import read_table, read_stream_table, write_sink  # noqa: F401
from .logs import parse_logs, LOG_EVENT  # noqa: F401
from .cdc import parse_cdc  # noqa: F401
