from .profiling import (StepTimer, MetricsLogger, trace_context,
                        enable_compilation_cache)

__all__ = ["StepTimer", "MetricsLogger", "trace_context",
           "enable_compilation_cache"]
