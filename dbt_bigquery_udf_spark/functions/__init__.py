from .dialect import (  # noqa: F401
    bq_format_to_spark,
    bq_format_to_duckdb,
    transpile_bq_expr,
    BQ_TYPE_MAP,
)
