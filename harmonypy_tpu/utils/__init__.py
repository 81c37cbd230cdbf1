from .logging import logger
from .checkpoint import save_state, load_state

__all__ = ["logger", "save_state", "load_state"]
