from .logging import logger
from .checkpoint import save_state, load_state
from .profiling import device_sync, phase_timer, trace

__all__ = ["logger", "save_state", "load_state",
           "device_sync", "phase_timer", "trace"]
