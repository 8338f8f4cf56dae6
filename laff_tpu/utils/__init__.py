from .misc import (
    ROOT_PATH,
    enable_compile_cache,
    AverageMeter,
    Progress,
    check_to_skip,
    get_logger,
    makedirs,
    makedirs_for_file,
    timer,
)

__all__ = [
    "ROOT_PATH",
    "enable_compile_cache",
    "AverageMeter",
    "Progress",
    "check_to_skip",
    "get_logger",
    "makedirs",
    "makedirs_for_file",
    "timer",
]
