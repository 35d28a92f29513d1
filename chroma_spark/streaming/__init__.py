from .compactor import (  # noqa: F401
    AttachedFunction,
    read_function_output,
    read_state,
    stream_compact,
)
from .functions import record_counter, revision_history, statistics  # noqa: F401
from .windows import running_user_stats, windowed_counts  # noqa: F401
