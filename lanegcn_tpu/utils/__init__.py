"""Runtime utilities: logging, profiling, throughput counters."""

from lanegcn_tpu.utils.logger import TeeLogger  # noqa: F401
from lanegcn_tpu.utils.profiling import StepTimer, trace_context  # noqa: F401
