"""Utilities: profiling/tracing, observability, seeding."""

from sparrowrecsys_tpu.utils.profiling import StepTimer, trace
from sparrowrecsys_tpu.utils.observability import MetricsRegistry, get_registry
