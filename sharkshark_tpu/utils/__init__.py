from .env import has_module, require_module, human_readable
from .logging import get_logger

__all__ = ["has_module", "require_module", "human_readable", "get_logger"]
