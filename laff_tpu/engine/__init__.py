from .prepare import Options, load_config, prepare
from .checkpoint import load_checkpoint, save_checkpoint_dance

__all__ = [
    "Options",
    "load_config",
    "prepare",
    "load_checkpoint",
    "save_checkpoint_dance",
]
