from .tables import load_table, load_all  # noqa: F401
