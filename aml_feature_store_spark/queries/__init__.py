"""Modules whose import registers queries into the catalog."""

from . import window_features  # noqa: F401
