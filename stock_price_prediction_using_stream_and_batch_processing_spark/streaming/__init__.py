from .pipeline import parse_ticks, run_tick_stream
from .metrics import BatchMetricsListener

__all__ = ["parse_ticks", "run_tick_stream", "BatchMetricsListener"]
