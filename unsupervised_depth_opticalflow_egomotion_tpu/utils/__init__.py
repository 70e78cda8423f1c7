from .checkpoint import CheckpointManager, graft_params
from .logging import MetricLogger
from .profiler import Profiler, device_trace

__all__ = ["CheckpointManager", "graft_params", "MetricLogger", "Profiler", "device_trace"]
