from .registry import SOURCE_TABLES, register_sources  # noqa: F401
