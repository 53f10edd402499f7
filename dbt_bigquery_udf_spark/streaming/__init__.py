"""Structured Streaming surface of the engine (SURVEY.md §2.4 —
streaming constructs are absent from the reference, provided here as
part of the large-scale pipeline extension).

Importing :mod:`.pipelines` registers the streaming queries in the
driver-contract registry.
"""

from . import pipelines  # noqa: F401
