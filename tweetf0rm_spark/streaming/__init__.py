from .stateful import lifetime_budget_stream  # noqa: F401
from .wave_driver import (  # noqa: F401
    frontier_stream,
    host_rate_telemetry,
    run_streaming_schedule,
    session_telemetry,
)
