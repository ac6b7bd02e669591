from .profiling import StepTimer, MetricsLogger, trace_context

__all__ = ["StepTimer", "MetricsLogger", "trace_context"]
