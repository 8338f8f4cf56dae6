"""Experiment configs.

Each module defines a ``config`` class; experiments subclass
``base_config.config`` and override attributes. ``adjust_parm`` decodes the
underscore-separated hyperparameter sweep strings used by the shell layer
(reference ``configs/`` package; attribute names preserved because they are
part of the sweep/checkpoint contract).
"""
