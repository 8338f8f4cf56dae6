"""Shared sys.modules stubs for executing the reference tree as an oracle.

The reference imports ftfy / torchvision (not installed here) purely for
names it never exercises in the oracle paths. These stubs carry a proper
ModuleSpec — a bare ``types.ModuleType`` leaves ``__spec__`` None, which
poisons later ``import`` machinery in the same process (the round-1
full-suite skip flakiness). Install/remove in a fixture so the stubs never
leak past the module that needed them; installation is idempotent and
never replaces a real installed module.
"""

import importlib.machinery
import sys
import types

_INSTALLED: dict = {}


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def install_reference_stubs() -> None:
    if "ftfy" not in sys.modules:
        ftfy = _module("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = _INSTALLED["ftfy"] = ftfy
    if "regex" not in sys.modules:
        try:
            import regex  # noqa: F401
        except ImportError:
            import re as _re

            regex = _module("regex")
            regex.compile = _re.compile
            regex.IGNORECASE = _re.IGNORECASE
            regex.findall = _re.findall
            sys.modules["regex"] = _INSTALLED["regex"] = regex
    if "prefetch_generator" not in sys.modules:
        pg = _module("prefetch_generator")

        class BackgroundGenerator:  # plain pass-through iterator
            def __init__(self, generator, max_prefetch=1):
                self.generator = iter(generator)

            def __iter__(self):
                return self.generator

            def __next__(self):
                return next(self.generator)

        pg.BackgroundGenerator = BackgroundGenerator
        sys.modules["prefetch_generator"] = _INSTALLED["prefetch_generator"] = pg
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        transforms = _module("torchvision.transforms")
        for name in ("Compose", "Resize", "CenterCrop", "TenCrop", "Lambda",
                     "ToTensor", "Normalize", "RandomResizedCrop"):
            setattr(transforms, name, object)
        datasets = _module("torchvision.datasets")
        datasets.Kinetics400 = object
        tv.transforms = transforms
        tv.datasets = datasets
        sys.modules["torchvision"] = _INSTALLED["torchvision"] = tv
        sys.modules["torchvision.transforms"] = _INSTALLED[
            "torchvision.transforms"] = transforms
        sys.modules["torchvision.datasets"] = _INSTALLED[
            "torchvision.datasets"] = datasets


def remove_reference_stubs() -> None:
    """Remove exactly the stub instances we installed (already-imported
    reference modules keep their bound references, which is fine)."""
    for name, mod in list(_INSTALLED.items()):
        if sys.modules.get(name) is mod:
            del sys.modules[name]
        del _INSTALLED[name]
