from .runner import stream_events, windowed_trend  # noqa: F401
from .stateful import streaming_rising_edges  # noqa: F401
