"""Modules whose import registers queries into the catalog."""

from . import behavioral, stat_features, window_features  # noqa: F401
