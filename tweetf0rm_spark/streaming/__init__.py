from .wave_driver import (  # noqa: F401
    frontier_stream,
    host_rate_telemetry,
    run_streaming_schedule,
    session_telemetry,
)
