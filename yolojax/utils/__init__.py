from yolojax.utils.metrics import MetricsLogger  # noqa: F401
from yolojax.utils.profiling import profile_trace, StepTimer  # noqa: F401
