from .windows import (  # noqa: F401
    events_stream,
    run_to_memory,
    session_agg,
    sliding_agg,
    stream_dedup,
    stream_static_join,
    tumbling_agg,
)
