"""Installed CLI entry points (console scripts in ``pyproject.toml``).

The repo root keeps thin uninstalled shims with the reference's script
names (``do_trainer.py`` etc., reference repo root) so shell orchestration
written against the reference runs unchanged from a checkout; installs get
only this package, avoiding generically-named top-level modules in
site-packages (ADVICE r3).
"""
