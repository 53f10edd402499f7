"""Extension operators (SURVEY.md §2.4): the large-scale data-pipeline
surface beyond the reference's own models — analytics, deduplication,
similarity search, text analysis, multimodal plumbing.

Importing this package registers every operator's driver-contract query
in :mod:`..queries`.
"""

from . import analytics  # noqa: F401
from . import bq_sql  # noqa: F401
from . import dedup  # noqa: F401
from . import extras  # noqa: F401
from . import graph  # noqa: F401
from . import multimodal  # noqa: F401
from . import profiling  # noqa: F401
from . import python_tvf  # noqa: F401
from . import similarity  # noqa: F401
from . import spark_native  # noqa: F401
from . import text  # noqa: F401
from . import tpch  # noqa: F401
