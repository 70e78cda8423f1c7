from .checkpoint import CheckpointManager, graft_params, opt_layout_tag
from .logging import MetricLogger
from .profiler import Profiler, device_trace

__all__ = ["CheckpointManager", "graft_params", "opt_layout_tag", "MetricLogger", "Profiler", "device_trace"]
