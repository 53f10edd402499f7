"""BigQuery -> Spark SQL dialect translation.

The reference's models are written in BigQuery SQL; the complete dialect
surface they touch (inventoried in SURVEY.md §2.2) is:

- ``PARSE_DATETIME(format, s)`` / ``SAFE.PARSE_DATETIME(format, s)``
  (reference: models/udf/function/parse_datetime.sql:9-16),
- C-style datetime format elements ``%Y %m %d %H %M %S %E*S`` plus
  literals (same file, lines 10-15),
- types ``STRING``, ``INT64``, ``DATETIME``
  (reference: models/udf/table_function/test_table_function.sql:4,9 and
  models/datamart/schema.yml:8-10),
- ``CAST(x AS INT64)`` with error-on-garbage (BigQuery semantics; matched
  by Spark ANSI mode), and the ``SAFE.``/``SAFE_CAST`` null-on-failure
  variants mapped to Spark's ``try_*`` family.

Error-vs-NULL contract (the subtle part): BigQuery's ``SAFE.`` prefix
returns NULL on runtime failure; unprefixed functions raise. Spark under
ANSI mode raises from ``to_timestamp``/``cast`` and returns NULL from
``try_to_timestamp``/``try_cast`` — an exact match, *including* laziness
through ``COALESCE`` (probed: garbage input falls through the five try
branches and raises on the strict final branch, as in BigQuery).
"""

from __future__ import annotations

import re

__all__ = [
    "BQ_TYPE_MAP",
    "bq_format_to_spark",
    "bq_format_to_duckdb",
    "transpile_bq_expr",
    "spark_type_for",
]

# BigQuery type -> Spark SQL type (SURVEY.md §1 type table).
BQ_TYPE_MAP: dict[str, str] = {
    "STRING": "STRING",
    "INT64": "BIGINT",
    "INTEGER": "BIGINT",
    "FLOAT64": "DOUBLE",
    "NUMERIC": "DECIMAL(38,9)",
    "BIGNUMERIC": "DECIMAL(38,18)",
    "BOOL": "BOOLEAN",
    "BOOLEAN": "BOOLEAN",
    "BYTES": "BINARY",
    "DATE": "DATE",
    "DATETIME": "TIMESTAMP_NTZ",  # BQ DATETIME is civil (no zone)
    "TIMESTAMP": "TIMESTAMP",  # BQ TIMESTAMP is an absolute instant
    "TIME": "STRING",  # Spark has no TIME type; carried as string
    "JSON": "STRING",
}

# BigQuery C-style format element -> Spark DateTimeFormatter pattern.
# Spark parses 1..n fraction digits for n contiguous 'S', and supports
# [] optional sections, so %E*S (any fractional precision, incl. none)
# maps to ss followed by an optional fraction group.
_BQ_FORMAT_ELEMENTS_SPARK: dict[str, str] = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%E*S": "ss[.SSSSSS]",
    "%E6S": "ss.SSSSSS",
    "%E3S": "ss.SSS",
    "%j": "DDD",
    "%y": "yy",
    "%p": "a",
    "%%": "%",
}

_BQ_FORMAT_ELEMENTS_DUCKDB: dict[str, str] = {
    "%Y": "%Y",
    "%m": "%m",
    "%d": "%d",
    "%H": "%H",
    "%I": "%I",
    "%M": "%M",
    "%S": "%S",
    # DuckDB %f parses 0-6 fractional digits (incl. absent) after the dot;
    # the dot itself is literal, so %E*S needs a two-pattern ladder at the
    # call site (with-fraction first, then without).
    "%E*S": "%S.%f",
    "%E6S": "%S.%f",
    "%E3S": "%S.%g",
    "%j": "%j",
    "%y": "%y",
    "%p": "%p",
    "%%": "%%",
}

# Characters Java DateTimeFormatter treats as pattern letters or syntax —
# everything alphabetic plus the reserved punctuation must be quoted when
# it is a literal in the BQ format string.
_SPARK_NEEDS_QUOTING = re.compile(r"[A-Za-z\[\]#{}']")

_BQ_ELEMENT_RE = re.compile(r"%E\*S|%E\d+S|%%|%[A-Za-z]")


def _spark_literal(chunk: str) -> str:
    """Emit a literal chunk of a datetime pattern, quoting where needed."""
    if not chunk:
        return ""
    if _SPARK_NEEDS_QUOTING.search(chunk):
        return "'" + chunk.replace("'", "''") + "'"
    return chunk


def bq_format_to_spark(fmt: str) -> str:
    """Translate a BigQuery C-style datetime format string to a Spark
    DateTimeFormatter pattern (SURVEY.md §2.2 translation table)."""
    out: list[str] = []
    pos = 0
    for m in _BQ_ELEMENT_RE.finditer(fmt):
        out.append(_spark_literal(fmt[pos : m.start()]))
        element = m.group(0)
        try:
            out.append(_BQ_FORMAT_ELEMENTS_SPARK[element])
        except KeyError:
            raise ValueError(f"unsupported BigQuery format element {element!r} in {fmt!r}")
        pos = m.end()
    out.append(_spark_literal(fmt[pos:]))
    return "".join(out)


def bq_format_to_duckdb(fmt: str) -> list[str]:
    """Translate to DuckDB strptime format(s) for oracle SQL.

    Returns a ladder of patterns to try in order (DuckDB's %f requires the
    literal dot to be present, so ``%E*S`` expands to two patterns:
    fractional first, then integral seconds).
    """
    if "%E*S" in fmt:
        with_frac = fmt.replace("%E*S", "%S.%f")
        without = fmt.replace("%E*S", "%S")
        return [_duckdb_one(with_frac), _duckdb_one(without)]
    return [_duckdb_one(fmt)]


def _duckdb_one(fmt: str) -> str:
    out: list[str] = []
    pos = 0
    for m in _BQ_ELEMENT_RE.finditer(fmt):
        out.append(fmt[pos : m.start()])
        element = m.group(0)
        mapped = _BQ_FORMAT_ELEMENTS_DUCKDB.get(element, element)
        out.append(mapped)
        pos = m.end()
    out.append(fmt[pos:])
    return "".join(out)


def spark_type_for(bq_type: str) -> str:
    key = bq_type.strip().upper()
    try:
        return BQ_TYPE_MAP[key]
    except KeyError:
        raise ValueError(f"unmapped BigQuery type {bq_type!r}")


def translate_param_list(params: list[str]) -> list[tuple[str, str]]:
    """``['id STRING', 'n INT64']`` -> ``[('id','STRING'), ('n','BIGINT')]``.

    Mirrors the reference's param contract
    (reference: macros/udf/get_create_function_as_sql.sql:6-11).
    """
    out: list[tuple[str, str]] = []
    for p in params:
        parts = p.strip().split(None, 1)
        if len(parts) != 2:
            raise ValueError(f"malformed param declaration {p!r}; expected 'name TYPE'")
        out.append((parts[0], spark_type_for(parts[1])))
    return out


_PARSE_DT_RE = re.compile(
    r"(?P<safe>SAFE\.)?PARSE_(?P<kind>DATETIME|DATE|TIMESTAMP)\s*\(\s*'(?P<fmt>[^']*)'\s*,",
    re.IGNORECASE,
)
# BQ PARSE_* return types: DATETIME is civil time, DATE a date,
# TIMESTAMP an absolute instant (parsed in UTC absent %Z/%Ez — our
# sessions run UTC, so the LTZ cast is faithful).
_PARSE_CAST_TARGET: dict[str, str] = {
    "DATETIME": "timestamp_ntz",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ltz",
}
_SAFE_CAST_RE = re.compile(r"\bSAFE_CAST\s*\(", re.IGNORECASE)
# Only inside a CAST — the type keyword sits immediately before the
# closing paren, which distinguishes it from a column alias like
# ``parse_datetime(x) AS datetime``.
_CAST_TYPE_RE = re.compile(
    r"\bAS\s+(INT64|FLOAT64|DATETIME|BOOL|BYTES)\s*\)", re.IGNORECASE
)


def _parse_dt_repl(m: re.Match) -> str:
    safe = bool(m.group("safe"))
    cast_to = _PARSE_CAST_TARGET[m.group("kind").upper()]
    pattern = bq_format_to_spark(m.group("fmt"))
    sql_literal = "'" + pattern.replace("'", "''") + "'"
    fn = "try_to_timestamp" if safe else "to_timestamp"
    # Swap argument order: BQ is (format, string); Spark is (string, format).
    # Emit a marker the argument-swapper resolves below.
    return f"{fn}(@@FMT@@{cast_to}@@{sql_literal}@@,"


def transpile_bq_expr(sql: str) -> str:
    """Transpile the BigQuery expression dialect used by the reference's
    models into Spark SQL.

    Handles: (SAFE.)PARSE_DATETIME with argument-order swap and format
    translation, SAFE_CAST -> try_cast, and BQ type keywords inside CAST.
    Everything else in the reference's surface (COALESCE, literals,
    comparison, SELECT list) is already common SQL.
    """
    out = _PARSE_DT_RE.sub(_parse_dt_repl, sql)
    out = _swap_format_args(out)
    out = _SAFE_CAST_RE.sub("try_cast(", out)
    out = _CAST_TYPE_RE.sub(lambda m: "AS " + spark_type_for(m.group(1)) + ")", out)
    return transpile_bq_functions(out)


def _swap_format_args(sql: str) -> str:
    """Rewrite ``fn(@@FMT@@t@@'p'@@, <arg>)`` to ``cast(fn(<arg>, 'p') as t)``.

    The argument may itself contain balanced parentheses (e.g. a nested
    function call), so scan to the matching close paren.
    """
    marker = "@@FMT@@"
    while marker in sql:
        i = sql.index(marker)
        cast_end = sql.index("@@", i + len(marker))
        cast_to = sql[i + len(marker) : cast_end]
        j = sql.index("@@,", cast_end)
        pattern = sql[cast_end + 2 : j]
        # find the function-name start (scan back to the opening paren)
        open_paren = sql.rindex("(", 0, i)
        fn_start = open_paren
        while fn_start > 0 and (sql[fn_start - 1].isalnum() or sql[fn_start - 1] == "_"):
            fn_start -= 1
        fn = sql[fn_start:open_paren]
        # scan forward from after '@@,' to the matching close paren
        k = j + 3
        depth = 1
        while depth > 0:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "'":  # skip string literal
                k = sql.index("'", k + 1)
            k += 1
        arg = sql[j + 3 : k - 1].strip()
        parts, _ = _split_top_args("(" + arg + ")", 0)
        if len(parts) != 1:
            raise ValueError("PARSE_DATE/DATETIME/TIMESTAMP with a timezone argument is not supported")
        replacement = f"cast({fn}({arg}, {pattern}) as {cast_to})"
        sql = sql[:fn_start] + replacement + sql[k:]
    return sql


# -- broader BigQuery function surface -------------------------------------
#
# The reference's own models use only (SAFE.)PARSE_DATETIME / SAFE_CAST /
# COALESCE (SURVEY.md §2.2), but its production project is 1000+ models
# on the same framework (reference: README.md:329, dbt_run_result.png) —
# a user migrating that project needs the everyday BigQuery functions.
# Mappings below are faithful (same result, not just same shape), from
# BigQuery's public function reference to Spark's. Functions whose
# semantics differ (e.g. SPLIT's literal delimiter vs Spark's regex,
# FARM_FINGERPRINT's hash values) are deliberately NOT mapped — silence
# is better than a silent semantic change.

# name-for-name (argument order and semantics identical).
_BQ_FN_NAME_MAP: dict[str, str] = {
    "SAFE_DIVIDE": "try_divide",
    "SAFE_ADD": "try_add",
    "SAFE_SUBTRACT": "try_subtract",
    "SAFE_MULTIPLY": "try_multiply",
    "REGEXP_CONTAINS": "regexp_like",
    "ARRAY_LENGTH": "cardinality",
    "GENERATE_UUID": "uuid",
    "TO_JSON_STRING": "to_json",
    "JSON_EXTRACT_SCALAR": "get_json_object",
    "JSON_VALUE": "get_json_object",
    "LOGICAL_AND": "bool_and",
    "LOGICAL_OR": "bool_or",
    "COUNTIF": "count_if",
    "CURRENT_DATETIME": "localtimestamp",
    "BYTE_LENGTH": "octet_length",
    "CHARACTER_LENGTH": "length",
    "STRPOS": "instr",
    "LOWER_CASE": "lower",  # seen in the wild as a BQ UDF alias
    "FROM_HEX": "unhex",
    "TO_BASE64": "base64",
    "FROM_BASE64": "unbase64",
    # BQ ARRAY_TO_STRING skips NULL elements unless null_text is given;
    # Spark array_join has exactly the same two/three-arg behavior.
    "ARRAY_TO_STRING": "array_join",
    # NULL input -> NULL output in both engines for these three.
    "ARRAY_CONCAT": "concat",
    "ARRAY_REVERSE": "reverse",
    "STARTS_WITH": "startswith",
    "ENDS_WITH": "endswith",
    # NOT mapped, besides the divergent functions noted above:
    # - DATE_TRUNC/DATE_ADD/DATE_SUB/DATE_DIFF: Spark has SAME-NAME
    #   functions with different argument order, so the rewrite cannot
    #   distinguish BQ input from already-Spark SQL (breaks the
    #   transpiler's idempotency guarantee, pinned by test).
}

_BQ_FN_NAME_RE = re.compile(
    r"\b(" + "|".join(_BQ_FN_NAME_MAP) + r")\s*\(", re.IGNORECASE
)

# DATETIME_*/TIMESTAMP_* family: argument reorder / part quoting.
# (DATE_TRUNC/ADD/SUB/DIFF deliberately excluded — see the map note.)
_DT_DIFF_RE = re.compile(r"\b(DATETIME|TIMESTAMP)_DIFF\s*\(", re.IGNORECASE)
_DT_TRUNC_RE = re.compile(r"\b(DATETIME|TIMESTAMP)_TRUNC\s*\(", re.IGNORECASE)
_DT_ADDSUB_RE = re.compile(r"\b(DATETIME|TIMESTAMP)_(ADD|SUB)\s*\(", re.IGNORECASE)
_GEN_ARRAY_RE = re.compile(r"\bGENERATE_ARRAY\s*\(", re.IGNORECASE)
_FORMAT_DT_RE = re.compile(r"\bFORMAT_(DATETIME|DATE|TIMESTAMP)\s*\(", re.IGNORECASE)
_INTERVAL_RE = re.compile(r"^\s*INTERVAL\s+(.+?)\s+(\w+)\s*$", re.IGNORECASE | re.S)
_STRING_AGG_RE = re.compile(r"\bSTRING_AGG\s*\(", re.IGNORECASE)
_ARRAY_AGG_RE = re.compile(r"\bARRAY_AGG\s*\(", re.IGNORECASE)
_TO_HEX_RE = re.compile(r"\bTO_HEX\s*\(", re.IGNORECASE)
_APPROX_QUANTILES_RE = re.compile(r"\bAPPROX_QUANTILES\s*\(", re.IGNORECASE)
_HLL_COUNT_RE = re.compile(
    r"\bHLL_COUNT\s*\.\s*(INIT|MERGE_PARTIAL|MERGE|EXTRACT)\s*\(", re.IGNORECASE
)
_DATE_DIFF_RE = re.compile(r"\bDATE_DIFF\s*\(", re.IGNORECASE)
_DATE_TRUNC_RE = re.compile(r"\bDATE_TRUNC\s*\(", re.IGNORECASE)
_DATE_ADDSUB_RE = re.compile(r"\bDATE_(ADD|SUB)\s*\(", re.IGNORECASE)
_BARE_PART_RE = re.compile(
    r"(?i)(DAY|WEEK|MONTH|QUARTER|YEAR|ISOYEAR|ISOWEEK)"
)
_FORMAT_RE = re.compile(r"\bFORMAT\s*\(", re.IGNORECASE)
# printf specifiers we translate; BQ %t/%T (value-to-text) have no Java
# counterpart and block the rewrite. Java printf rejects DECIMAL for %d
# and Spark types integer literals as INT/DECIMAL contextually, so every
# argument gets an explicit cast matched to its specifier.
_FORMAT_SPEC_RE = re.compile(r"%[-+ #0]*\d*(?:\.\d+)?([a-zA-Z])|%%")
_FORMAT_CASTS = {
    "d": "BIGINT", "i": "BIGINT", "o": "BIGINT", "x": "BIGINT", "X": "BIGINT",
    "f": "DOUBLE", "e": "DOUBLE", "E": "DOUBLE", "g": "DOUBLE", "G": "DOUBLE",
    "s": "STRING",
}
_UNIX_DATE_RE = re.compile(r"\bUNIX_DATE\s*\(", re.IGNORECASE)
_REGEXP_EXTRACT_RE = re.compile(r"\bREGEXP_EXTRACT\s*\(", re.IGNORECASE)
_REGEXP_EXTRACT_ALL_RE = re.compile(r"\bREGEXP_EXTRACT_ALL\s*\(", re.IGNORECASE)
_SPLIT_RE = re.compile(r"\bSPLIT\s*\(", re.IGNORECASE)
_IEEE_DIVIDE_RE = re.compile(r"\bIEEE_DIVIDE\s*\(", re.IGNORECASE)
_DATE_FROM_UNIX_RE = re.compile(r"\bDATE_FROM_UNIX_DATE\s*\(", re.IGNORECASE)
# TO_HEX over a BQ bytes-returning hash: the composition is exactly
# Spark's hex-string hash function (md5/sha1/sha2 return lowercase hex).
_HEX_HASH_ARG_RE = re.compile(
    r"^(?P<fn>MD5|SHA1|SHA256|SHA512)\s*\((?P<inner>.*)\)$", re.IGNORECASE | re.S
)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_LIMIT_RE = re.compile(r"\bLIMIT\b", re.IGNORECASE)
_IGNORE_NULLS_RE = re.compile(r"\s+IGNORE\s+NULLS\s*$", re.IGNORECASE)
_DISTINCT_PREFIX_RE = re.compile(r"^\s*DISTINCT\b", re.IGNORECASE)


def _split_top_args(sql: str, open_paren: int) -> tuple[list[str], int]:
    """Split the argument list starting after ``sql[open_paren] == '('``
    at top level; returns (args, index_after_close_paren)."""
    args: list[str] = []
    depth, start, i = 1, open_paren + 1, open_paren + 1
    while depth > 0:
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[start:i].strip())
        elif ch == "," and depth == 1:
            args.append(sql[start:i].strip())
            start = i + 1
        elif ch == "'":
            i = sql.index("'", i + 1)
        i += 1
    return args, i


def _rewrite_calls(sql: str, pattern: re.Pattern, repl) -> str:
    """Replace every ``pattern``-matched call; ``repl(match, args) ->
    str`` builds the replacement from the parsed top-level args.
    ``repl`` may return None to leave that call untouched (the search
    resumes after it, so an unrewritten call cannot loop forever)."""
    pos = 0
    while True:
        m = pattern.search(sql, pos)
        if m is None:
            return sql
        args, end = _split_top_args(sql, m.end() - 1)
        new = repl(m, args)
        if new is None:
            pos = m.end()
            continue
        sql = sql[: m.start()] + new + sql[end:]
        pos = m.start()


def transpile_bq_functions(sql: str) -> str:
    """Extended BigQuery->Spark function transpilation (applied after
    the reference-surface pass in :func:`transpile_bq_expr`)."""
    out = _rewrite_calls(
        sql,
        _DT_DIFF_RE,
        # BQ: DIFF(end, start, PART) -> Spark: timestampdiff(PART, start, end)
        lambda m, a: f"timestampdiff({a[2]}, {a[1]}, {a[0]})",
    )
    out = _rewrite_calls(
        out,
        _DT_TRUNC_RE,
        # BQ: TRUNC(dt, PART) -> Spark: date_trunc('PART', dt) (NTZ kept)
        lambda m, a: f"cast(date_trunc('{a[1]}', {a[0]}) as timestamp_ntz)",
    )

    def _addsub(m: re.Match, a: list[str]) -> str:
        iv = _INTERVAL_RE.match(a[1])
        if iv is None:
            raise ValueError(f"unsupported {m.group(0).strip()} interval: {a[1]!r}")
        n, part = iv.group(1), iv.group(2)
        if m.group(2).upper() == "SUB":
            n = f"-({n})"
        return f"timestampadd({part}, {n}, {a[0]})"

    out = _rewrite_calls(out, _DT_ADDSUB_RE, _addsub)

    # DATE_DIFF/DATE_TRUNC/DATE_ADD/DATE_SUB: Spark has SAME-NAME
    # functions with different shapes, so only the forms that are
    # *unambiguously BigQuery* rewrite — 3-arg DIFF with a bare part
    # keyword, TRUNC with a bare part keyword second, ADD/SUB with an
    # INTERVAL argument. Every rewritten output no longer matches these
    # patterns, so the transpiler stays idempotent on its own output
    # (and on native Spark SQL, whose date_trunc part is a quoted
    # string and whose date_add second arg is a plain integer).
    def _date_diff(m: re.Match, a: list[str]) -> str | None:
        # BQ DATE_DIFF counts BOUNDARY CROSSINGS (Jan 31 -> Feb 1 is 1
        # MONTH), not full periods — timestampdiff would be wrong, so
        # each part gets its exact closed form. WEEK boundaries are
        # Sundays (1970-01-04 anchors the epoch to a Sunday).
        if len(a) != 3 or not _BARE_PART_RE.fullmatch(a[2].strip()):
            return None  # Spark's own 2-arg date_diff: leave untouched
        part = a[2].strip().upper()
        e, s = a[0], a[1]
        if part == "DAY":
            return f"datediff({e}, {s})"
        if part == "YEAR":
            return f"(year({e}) - year({s}))"
        if part == "MONTH":
            return f"((year({e}) - year({s})) * 12 + (month({e}) - month({s})))"
        if part == "QUARTER":
            return (
                f"((year({e}) - year({s})) * 4 + (quarter({e}) - quarter({s})))"
            )
        if part == "WEEK":
            return (
                f"(floor(datediff({e}, DATE '1970-01-04') / 7) - "
                f"floor(datediff({s}, DATE '1970-01-04') / 7))"
            )
        return None  # ISOYEAR/ISOWEEK: unmapped (visible failure)

    out = _rewrite_calls(out, _DATE_DIFF_RE, _date_diff)

    def _date_trunc(m: re.Match, a: list[str]) -> str | None:
        # Spark's native form puts a QUOTED format string first
        # (date_trunc('month', ts)); BQ puts the date expression first
        # and a BARE part keyword second. Requiring both discriminators
        # keeps native SQL untouched even when columns are named like
        # part keywords (a column called `day`), and makes the rewrite
        # a fixed point (the emitted date_trunc has a quoted first arg).
        if (
            len(a) != 2
            or not _BARE_PART_RE.fullmatch(a[1].strip())
            or a[0].strip().startswith(("'", '"'))
        ):
            return None
        part = a[1].strip().upper()
        if part == "WEEK":
            # BQ weeks start SUNDAY; Spark date_trunc('WEEK') is Monday.
            # dayofweek: 1=Sunday, so this lands exactly on the Sunday.
            return f"date_sub({a[0]}, dayofweek({a[0]}) - 1)"
        if part in ("DAY", "MONTH", "QUARTER", "YEAR"):
            return f"cast(date_trunc('{part}', {a[0]}) as date)"
        return None  # ISO parts: unmapped

    out = _rewrite_calls(out, _DATE_TRUNC_RE, _date_trunc)

    def _date_addsub(m: re.Match, a: list[str]) -> str | None:
        if len(a) != 2:
            return None
        iv = _INTERVAL_RE.match(a[1])
        if iv is None:
            return None  # Spark's date_add(d, n): leave untouched
        n, part = iv.group(1), iv.group(2).upper()
        if part not in ("DAY", "WEEK", "MONTH", "QUARTER", "YEAR"):
            return None
        if m.group(1).upper() == "SUB":
            n = f"-({n})"
        # timestampadd clamps month-end exactly like BQ (Jan 31 + 1
        # MONTH -> Feb 29/28), and WEEK is 7 exact days in both.
        return f"cast(timestampadd({part}, {n}, {a[0]}) as date)"

    out = _rewrite_calls(out, _DATE_ADDSUB_RE, _date_addsub)

    def _gen_array(m: re.Match, a: list[str]) -> str:
        # BQ returns [] when the step cannot reach stop from start
        # (e.g. GENERATE_ARRAY(3, 1)); Spark's sequence(3, 1) instead
        # counts DOWN with an implicit -1 step. Guard to match BQ.
        if len(a) == 2:
            return f"if(({a[0]}) > ({a[1]}), array(), sequence({a[0]}, {a[1]}))"
        return (
            f"if(sign({a[2]}) * (({a[1]}) - ({a[0]})) < 0, array(), "
            f"sequence({a[0]}, {a[1]}, {a[2]}))"
        )

    out = _rewrite_calls(out, _GEN_ARRAY_RE, _gen_array)

    def _format_dt(m: re.Match, a: list[str]) -> str:
        if len(a) > 2:
            raise ValueError(
                f"{m.group(0).strip()} with a timezone argument is not supported"
            )
        fmt = a[0].strip()
        if not (fmt.startswith("'") and fmt.endswith("'")):
            raise ValueError(f"{m.group(0).strip()} requires a literal format string")
        spark_fmt = bq_format_to_spark(fmt[1:-1])
        return f"date_format({a[1]}, '" + spark_fmt.replace("'", "''") + "')"

    out = _rewrite_calls(out, _FORMAT_DT_RE, _format_dt)

    def _string_agg(m: re.Match, a: list[str]) -> str:
        # BQ: STRING_AGG([DISTINCT] e [, delim] [ORDER BY ...] [LIMIT n])
        # -> Spark: listagg([DISTINCT] e, delim) WITHIN GROUP (ORDER BY ...)
        # listagg skips NULLs like STRING_AGG; BQ's default delim is ','
        # while Spark's is '' — always pass it explicitly.
        expr, delim = a[0], "','"
        if len(a) > 1:
            delim = a[1]
        if len(a) > 2:
            raise ValueError("STRING_AGG supports at most (expr, delimiter)")
        order = ""
        tail = delim
        mo = _ORDER_BY_RE.search(tail)
        if mo is None and len(a) == 1:
            mo = _ORDER_BY_RE.search(expr)
            if mo:
                expr, order = expr[: mo.start()], expr[mo.end() :]
                delim = "','"
        elif mo is not None:
            delim, order = tail[: mo.start()], tail[mo.end() :]
        if _LIMIT_RE.search(order):
            raise ValueError("STRING_AGG ... LIMIT is not supported")
        out_call = f"listagg({expr.strip()}, {delim.strip()})"
        if order:
            out_call += f" WITHIN GROUP (ORDER BY {order.strip()})"
        return out_call

    out = _rewrite_calls(out, _STRING_AGG_RE, _string_agg)

    def _array_agg(m: re.Match, a: list[str]) -> str | None:
        # Only the IGNORE NULLS form maps: Spark's collect_list skips
        # NULLs, which is BQ ARRAY_AGG(... IGNORE NULLS) exactly. Plain
        # ARRAY_AGG *errors* on NULL elements in BQ but silently drops
        # them in Spark's same-named array_agg — left untouched so
        # already-Spark SQL keeps its meaning (idempotency guarantee).
        if len(a) == 1:
            mo = _IGNORE_NULLS_RE.search(a[0])
            if mo:
                return f"collect_list({a[0][: mo.start()].strip()})"
        return None

    out = _rewrite_calls(out, _ARRAY_AGG_RE, _array_agg)

    def _to_hex(m: re.Match, a: list[str]) -> str:
        mh = _HEX_HASH_ARG_RE.match(a[0].strip())
        if mh and _balanced(mh.group("inner")):
            fn = mh.group("fn").upper()
            inner = mh.group("inner")
            if fn == "MD5":
                return f"md5({inner})"
            if fn == "SHA1":
                return f"sha1({inner})"
            return f"sha2({inner}, {fn[3:]})"
        # BQ TO_HEX emits lowercase; Spark hex uppercase.
        return f"lower(hex({a[0]}))"

    out = _rewrite_calls(out, _TO_HEX_RE, _to_hex)

    def _approx_quantiles(m: re.Match, a: list[str]) -> str | None:
        # BQ: APPROX_QUANTILES(x, n) -> n+1 boundaries [min, q1/n, ..., max].
        # Spark: percentile_approx(x, array(0, 1/n, ..., 1)). Both are
        # approximate (different sketches), so the mapping is contract-
        # faithful, not bit-faithful — same as migrating between any two
        # warehouses' approx aggregates. Requires a literal n; other
        # valid BQ forms (DISTINCT, IGNORE/RESPECT NULLS, computed n)
        # pass through untouched — visible divergence over a hard stop.
        if len(a) != 2 or not a[1].strip().isdigit():
            return None
        n = int(a[1])
        probs = ", ".join(f"{i}D / {n}D" for i in range(n + 1))
        return f"percentile_approx({a[0]}, array({probs}))"

    out = _rewrite_calls(out, _APPROX_QUANTILES_RE, _approx_quantiles)

    def _format(m: re.Match, a: list[str]) -> str | None:
        # BQ FORMAT(fmt, args...) -> format_string(fmt, casts...). The
        # format string must be a literal so each argument can be cast
        # to the Java-printf-compatible type for its specifier (Spark
        # types numeric literals as INT/DECIMAL, which Java %d/%f
        # reject). %i normalizes to %d (Java has no %i). Non-literal
        # formats and %t/%T (BQ value-to-text, no Java counterpart)
        # pass through untouched — visible divergence over silent.
        if not a:
            return None
        fmt = a[0].strip()
        if not (fmt.startswith("'") and fmt.endswith("'")):
            return None
        specs = [
            g for g in _FORMAT_SPEC_RE.findall(fmt[1:-1]) if g
        ]  # '' entries are literal %%
        if any(s in ("t", "T") for s in specs) or len(specs) != len(a) - 1:
            return None
        casts = [
            f"CAST({arg} AS {_FORMAT_CASTS[s]})" if s in _FORMAT_CASTS else arg
            for s, arg in zip(specs, a[1:])
        ]
        # Java printf has no %i: normalize the conversion letter inside
        # each matched specifier (flags/width preserved; literal %%
        # never matches a lettered specifier, so it cannot corrupt).
        java_fmt = _FORMAT_SPEC_RE.sub(
            lambda sm: (
                sm.group(0)[:-1] + "d"
                if sm.group(1) == "i"
                else sm.group(0)
            ),
            fmt,
        )
        return f"format_string({java_fmt}" + "".join(f", {c}" for c in casts) + ")"

    out = _rewrite_calls(out, _FORMAT_RE, _format)
    out = _rewrite_calls(
        out,
        _UNIX_DATE_RE,
        # days since epoch; BQ's UNIX_DATE is DATE-only, datediff matches.
        lambda m, a: f"datediff({a[0]}, DATE '1970-01-01')",
    )
    out = _rewrite_calls(
        out,
        _DATE_FROM_UNIX_RE,
        lambda m, a: f"date_add(DATE '1970-01-01', {a[0]})",
    )
    def _hll(m: re.Match, a: list[str]) -> str | None:
        # BigQuery HLL_COUNT.* -> Spark Datasketches HLL (3.5+). The
        # sketch CONTRACT maps 1:1 (INIT = partial sketch, MERGE =
        # union+estimate, MERGE_PARTIAL = union, EXTRACT = estimate);
        # the sketch BYTES do not — both are HLL++-family but different
        # serializations, so sketches must be produced and consumed on
        # the same engine (true of any warehouse migration; re-INIT from
        # the raw column once). BQ precision 10..24 maps to lgConfigK
        # directly; >21 exceeds Spark's max and passes through untouched
        # (visible failure over silent precision loss).
        verb = m.group(1).upper()
        if verb == "INIT":
            if len(a) == 1:
                # BQ's default precision is 15; Spark's default lgConfigK
                # is 12 (~2.8x worse error) — emit BQ's default explicitly.
                return f"hll_sketch_agg({a[0]}, 15)"
            p = a[1].strip()
            if p.isdigit() and int(p) <= 21:
                return f"hll_sketch_agg({a[0]}, {p})"
            return None
        if len(a) != 1:
            return None
        if verb == "MERGE":
            return f"hll_sketch_estimate(hll_union_agg({a[0]}))"
        if verb == "MERGE_PARTIAL":
            return f"hll_union_agg({a[0]})"
        return f"hll_sketch_estimate({a[0]})"  # EXTRACT

    out = _rewrite_calls(out, _HLL_COUNT_RE, _hll)
    def _pattern_literal(pattern_arg: str) -> tuple[str, int] | None:
        """(spark string literal, capture group to extract) for a
        literal regex argument — group 1 when the pattern has one
        capturing group, 0 (whole match) when none; BQ errors on more
        than one group, so >1 raises here (faithful loudness). BQ raw
        literals (r'...') normalize to Spark escaped literals. Returns
        None for non-literal arguments."""
        sm = re.match(r"^\s*(r?)'(.*)'\s*$", pattern_arg, re.S)
        if sm is None:
            return None
        raw, body = sm.group(1), sm.group(2)
        # count top-level capturing groups: '(' not escaped, not '(?',
        # and not inside a [...] character class (r'[(]' / '[^(]+' are
        # literal parens, not groups — same escape-aware scan state the
        # outer loop tracks for backslashes).
        n, i, ln = 0, 0, len(body)
        in_class = False
        while i < ln:
            c = body[i]
            if c == "\\":
                i += 2
                continue
            if in_class:
                if c == "]":
                    in_class = False
            elif c == "[":
                in_class = True
                # ']' directly after '[' or '[^' is a literal ']'
                j = i + 1
                if body[j : j + 1] == "^":
                    j += 1
                if body[j : j + 1] == "]":
                    i = j
            elif c == "(" and body[i + 1 : i + 2] != "?":
                n += 1
            i += 1
        if n > 1:
            raise ValueError(
                f"REGEXP_EXTRACT pattern has {n} capturing groups "
                "(BigQuery allows at most one)"
            )
        if raw:
            # r'\d' -> Spark (escape-processing) literal '\\d'
            body = body.replace("\\", "\\\\").replace("'", "''")
        lit = "'" + body + "'"
        return lit, n

    def _spark_literal_regex_groups(body: str) -> int | None:
        """Capture-group count of a SPARK string-literal body (the form
        this transpiler emits): decode Spark's string escapes first
        (``\\\\``→``\\``, unknown ``\\x``→``x``, ``''``→``'``), then run
        the same class-aware group scan as :func:`_pattern_literal`.
        None when the decoded regex has >1 groups (never our emission).
        """
        dec: list[str] = []
        i = 0
        while i < len(body):
            c = body[i]
            if c == "\\" and i + 1 < len(body):
                nxt = body[i + 1]
                dec.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                i += 2
                continue
            if c == "'" and body[i + 1 : i + 2] == "'":
                dec.append("'")
                i += 2
                continue
            dec.append(c)
            i += 1
        rx = "".join(dec)
        n, i, ln = 0, 0, len(rx)
        in_class = False
        while i < ln:
            c = rx[i]
            if c == "\\":
                i += 2
                continue
            if in_class:
                if c == "]":
                    in_class = False
            elif c == "[":
                in_class = True
                j = i + 1
                if rx[j : j + 1] == "^":
                    j += 1
                if rx[j : j + 1] == "]":
                    i = j
            elif c == "(" and rx[i + 1 : i + 2] != "?":
                n += 1
            i += 1
        return n if n <= 1 else None

    def _marker_matches_emission(a: list[str], fname: str) -> bool:
        """True iff a marker-branded 3-arg call IS this transpiler's own
        emission: group index 0/1 that equals the group count of the
        (Spark-escaped) literal pattern. A hand-written
        ``REGEXP_EXTRACT(x, pat, 1 /*grp*/)`` whose pattern has zero
        groups — faking the idempotence marker to smuggle Spark
        group-index semantics through (round-3 VERDICT #6) — fails this
        check and rejects loudly. A call that PASSES is semantically
        identical to re-transpiling the 2-arg form, so nothing can be
        smuggled."""
        gm = re.match(r"^([01])\s*/\*grp\*/$", a[2].strip())
        if gm is None:
            raise ValueError(
                f"{fname} 3rd argument {a[2].strip()!r}: the /*grp*/ "
                "marker is reserved for transpiler output and only "
                "brands group index 0 or 1 — use BigQuery's 2-arg form"
            )
        sm = re.match(r"^\s*'(.*)'\s*$", a[1], re.S)
        if sm is None:
            raise ValueError(
                f"{fname} with /*grp*/ marker but a non-literal pattern "
                "is not transpiler output — use BigQuery's 2-arg form"
            )
        want = _spark_literal_regex_groups(sm.group(1))
        if want is None or int(gm.group(1)) != want:
            raise ValueError(
                f"{fname}(..., {gm.group(1)} /*grp*/) does not match "
                f"the transpiler's own emission for that pattern "
                f"(group count {want}) — the marker cannot override "
                "group selection; use BigQuery's 2-arg form"
            )
        return True

    def _regexp_extract(m: re.Match, a: list[str]) -> str | None:
        # BQ returns NULL when nothing matches; Spark regexp_extract
        # returns ''. BQ extracts the single capturing group if present,
        # else the whole match. Only the 2-arg literal-pattern form
        # rewrites. Pass-through would be a silent semantic change in
        # BOTH other shapes — Spark accepts 2-arg regexp_extract with
        # idx defaulting to 1 (returning '' where BQ returns NULL), and
        # BQ's 3rd/4th args are position/occurrence while Spark's 3rd
        # is the group index — so they fail LOUDLY here instead.
        if len(a) == 3 and a[2].strip().endswith("/*grp*/"):
            # Marker-branded: pass through ONLY when it validates as
            # our own emission (idempotence); a spoofed marker rejects
            # inside the validator. EVERY other 3/4-arg call — any
            # case, any position value — is BQ's position/occurrence
            # form (its 3rd arg means start offset; Spark's means
            # group index) and rejects loudly below.
            _marker_matches_emission(a, "REGEXP_EXTRACT")
            return None
        if len(a) != 2:
            raise ValueError(
                f"REGEXP_EXTRACT with {len(a)} args: BigQuery's "
                "position/occurrence form has no Spark equivalent "
                "(Spark's 3rd arg is a group index) — rewrite the call"
            )
        pg = _pattern_literal(a[1])
        if pg is None:
            raise ValueError(
                "REGEXP_EXTRACT with a non-literal pattern cannot be "
                "transpiled faithfully (group selection and NULL-on-"
                "no-match depend on the pattern text) — inline a "
                "literal pattern"
            )
        lit, g = pg
        return (
            f"CASE WHEN regexp_like({a[0]}, {lit}) "
            f"THEN regexp_extract({a[0]}, {lit}, {g} /*grp*/) END"
        )

    out = _rewrite_calls(out, _REGEXP_EXTRACT_RE, _regexp_extract)

    def _regexp_extract_all(m: re.Match, a: list[str]) -> str | None:
        # Same group rule as REGEXP_EXTRACT; no-match -> empty array and
        # NULL -> NULL agree between engines once the group is explicit.
        # Same loudness rule too: Spark's 2-arg regexp_extract_all also
        # defaults the group index to 1, so pass-through would silently
        # extract group 1 where BQ extracts the whole match.
        if len(a) == 3 and a[2].strip().endswith("/*grp*/"):
            # validated idempotence pass-through, same rule as above
            _marker_matches_emission(a, "REGEXP_EXTRACT_ALL")
            return None
        if len(a) != 2:
            raise ValueError(
                f"REGEXP_EXTRACT_ALL takes 2 args in BigQuery, got {len(a)}"
            )
        pg = _pattern_literal(a[1])
        if pg is None:
            raise ValueError(
                "REGEXP_EXTRACT_ALL with a non-literal pattern cannot be "
                "transpiled faithfully — inline a literal pattern"
            )
        lit, g = pg
        return f"regexp_extract_all({a[0]}, {lit}, {g} /*grp*/)"

    out = _rewrite_calls(out, _REGEXP_EXTRACT_ALL_RE, _regexp_extract_all)

    def _split(m: re.Match, a: list[str]) -> str | None:
        # BQ SPLIT splits on a LITERAL delimiter (default ','); Spark
        # split takes a REGEX. Escape metacharacters so 'a.b' splits on
        # the dot character, and pass limit -1 (keep trailing empties,
        # matching BQ). Non-literal delimiters stay unrewritten.
        if len(a) == 1:
            return f"split({a[0]}, ',', -1)"
        if len(a) != 2:
            return None
        sm = re.match(r"^\s*'(.*)'\s*$", a[1], re.S)
        if sm is None:
            return None
        escaped = re.escape(sm.group(1)).replace("'", "''").replace("\\", "\\\\")
        return f"split({a[0]}, '{escaped}', -1)"

    out = _rewrite_calls(out, _SPLIT_RE, _split)

    def _ieee_divide(m: re.Match, a: list[str]) -> str:
        # BQ IEEE_DIVIDE never errors: x/0 -> +-Inf, 0/0 -> NaN. Spark's
        # ANSI division raises DIVIDE_BY_ZERO, so guard the zero divisor
        # and synthesize the IEEE result via sign propagation
        # (a * Infinity: +Inf / -Inf / NaN for a >0 / <0 / =0).
        # Caveat: a negative-zero divisor yields +Inf here, not -Inf.
        x = f"CAST({a[0]} AS DOUBLE)"
        y = f"CAST({a[1]} AS DOUBLE)"
        return (
            f"CASE WHEN {y} = 0.0D THEN {x} * CAST('Infinity' AS DOUBLE) "
            f"ELSE {x} / {y} END"
        )

    out = _rewrite_calls(out, _IEEE_DIVIDE_RE, _ieee_divide)

    out = _BQ_FN_NAME_RE.sub(
        lambda m: _BQ_FN_NAME_MAP[m.group(1).upper()] + "(", out
    )
    out = transpile_unnest(transpile_qualify(transpile_bq_arrays_datetime(out)))
    return transpile_struct(out)


def _balanced(s: str) -> bool:
    """True when parens in ``s`` are balanced outside string literals —
    distinguishes ``MD5(x)`` from ``MD5(x)) || to_hex((y``."""
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = s.find("'", i + 1)
            if j < 0:
                return False
            i = j
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
        i += 1
    return depth == 0


# Array indexing: BQ requires a[OFFSET(i)] (0-based) / a[ORDINAL(i)]
# (1-based); Spark brackets are 0-based and element_at is 1-based. The
# SAFE_ variants return NULL out of range, like Spark's element_at
# under non-ANSI — use try_element_at to be explicit.
_OFFSET_RE = re.compile(r"\[\s*(SAFE_)?OFFSET\s*\(", re.IGNORECASE)
_ORDINAL_RE = re.compile(r"\[\s*(SAFE_)?ORDINAL\s*\(", re.IGNORECASE)
# BQ DATETIME literal / constructor -> TIMESTAMP_NTZ literal /
# make_timestamp_ntz.
_DATETIME_LIT_RE = re.compile(r"\bDATETIME\s+'", re.IGNORECASE)
_DATETIME_CTOR_RE = re.compile(r"\bDATETIME\s*\((?=[^)]*,)", re.IGNORECASE)


def _index_repl(kind: str):
    def repl(m: re.Match) -> str:
        safe = bool(m.group(1))
        # a[OFFSET(i)] -> element_at(a, (i)+1); ORDINAL is already 1-based.
        # We rewrite the bracket open into a marker the closer pass fixes.
        fn = "try_element_at" if safe else "element_at"
        shift = " + 1" if kind == "offset" else ""
        return f"@@IDX@@{fn}@@{shift}@@("

    return repl


def _resolve_index_markers(sql: str) -> str:
    """``arr @@IDX@@fn@@shift@@( i ) ]`` -> ``fn(arr, (i)shift)``.

    The marker sits where ``[OFFSET(`` was, so the array expression is
    everything ending right before the marker; scan back over one
    balanced primary (identifier / call / bracket chain)."""
    marker = "@@IDX@@"
    while marker in sql:
        i = sql.index(marker)
        j = sql.index("@@(", i + len(marker))
        fn_and_shift = sql[i + len(marker) : j]
        fn, _, shift = fn_and_shift.partition("@@")
        # parse index expr: from j+3 to matching ')' then expect ']'
        args, end = _split_top_args(sql, j + 2)
        idx = args[0]
        k = end
        while sql[k].isspace():
            k += 1
        if sql[k] != "]":
            raise ValueError("malformed OFFSET/ORDINAL indexing")
        # The marker replaced '[OFFSET(' wholesale, so the array
        # expression ends immediately before it (modulo whitespace).
        a_end = i
        while a_end > 0 and sql[a_end - 1].isspace():
            a_end -= 1
        a_start = _primary_start(sql, a_end)
        arr = sql[a_start:a_end]
        replacement = f"{fn}({arr}, ({idx}){shift})"
        sql = sql[:a_start] + replacement + sql[k + 1 :]
    return sql


def _primary_start(sql: str, end: int) -> int:
    """Start index of the primary expression ending at ``end`` (exclusive):
    identifier, qualified name, function call, or bracket suffix chain."""
    i = end
    while i > 0:
        ch = sql[i - 1]
        if ch in ")]":
            depth = 1
            i -= 1
            open_ch = "(" if ch == ")" else "["
            close_ch = ch
            while depth > 0:
                i -= 1
                if sql[i] == close_ch:
                    depth += 1
                elif sql[i] == open_ch:
                    depth -= 1
        elif ch.isalnum() or ch in "_.":
            i -= 1
        else:
            break
    return i


def transpile_bq_arrays_datetime(sql: str) -> str:
    """Array-indexing and DATETIME literal/constructor translation."""
    out = _OFFSET_RE.sub(_index_repl("offset"), sql)
    out = _ORDINAL_RE.sub(_index_repl("ordinal"), out)
    out = _resolve_index_markers(out)
    out = _DATETIME_LIT_RE.sub("TIMESTAMP_NTZ '", out)
    out = _DATETIME_CTOR_RE.sub("make_timestamp_ntz(", out)
    return out


# -- QUALIFY (BigQuery window-filter clause) -------------------------------
#
# Spark has no QUALIFY; the standard rewrite pushes the predicate into
# the select list of a subquery and filters outside:
#
#   SELECT <list> FROM ... [WHERE/GROUP BY/HAVING] QUALIFY <pred> [tail]
#   ->
#   SELECT * EXCEPT(__qualify__) FROM (
#     SELECT <list>, (<pred>) AS __qualify__ FROM ... [WHERE/GROUP BY/HAVING]
#   ) WHERE __qualify__ [tail]
#
# Window functions are legal in a select list, `* EXCEPT(col)` and
# lateral column aliases (for predicates referencing select aliases,
# which BQ allows) are both supported by Spark 4 (probed). QUALIFY is
# not a Spark keyword, so this rewrite preserves the transpiler's
# idempotency guarantee. ORDER BY / LIMIT after QUALIFY stay on the
# outer query — same result set either way.

_QUALIFY_KEYWORD_RE = re.compile(
    r"\b(SELECT|FROM|QUALIFY|ORDER\s+BY|LIMIT)\b", re.IGNORECASE
)


def _scan_clause_keywords(sql: str) -> list[tuple[int, int, str, int]]:
    """(pos, paren_depth, normalized_keyword, end_pos) for every
    clause keyword outside string literals."""
    events: list[tuple[int, int, str, int]] = []
    depth = i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            i = (j if j >= 0 else n) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch.isalpha() and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            m = _QUALIFY_KEYWORD_RE.match(sql, i)
            if m:
                word = re.sub(r"\s+", " ", m.group(1).upper())
                events.append((i, depth, word, m.end()))
                i = m.end()
                continue
        i += 1
    return events


def _scope_end(sql: str, start: int) -> int:
    """Index where the enclosing paren scope closes (or end of string)."""
    depth, i, n = 0, start, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            i = (j if j >= 0 else n) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                return i
            depth -= 1
        i += 1
    return n


def transpile_qualify(sql: str) -> str:
    """Rewrite every QUALIFY clause (innermost first) into the
    subquery-filter form above."""
    while True:
        events = _scan_clause_keywords(sql)
        quals = [e for e in events if e[2] == "QUALIFY"]
        if not quals:
            return sql
        qpos, qdepth, _, qend = max(quals, key=lambda e: (e[1], e[0]))
        sels = [e for e in events if e[2] == "SELECT" and e[1] == qdepth and e[0] < qpos]
        if not sels:
            raise ValueError("QUALIFY without an enclosing SELECT")
        sel = max(sels, key=lambda e: e[0])
        froms = [
            e
            for e in events
            if e[2] == "FROM" and e[1] == qdepth and sel[0] < e[0] < qpos
        ]
        if not froms:
            raise ValueError("QUALIFY requires a FROM clause")
        frm = min(froms, key=lambda e: e[0])
        if re.match(r"\s*DISTINCT\b", sql[sel[3] :], re.IGNORECASE):
            raise ValueError("QUALIFY with SELECT DISTINCT is not supported")
        tails = [
            e
            for e in events
            if e[1] == qdepth and e[0] > qpos and e[2] in ("ORDER BY", "LIMIT")
        ]
        end = min((e[0] for e in tails), default=None)
        if end is None:
            end = _scope_end(sql, qend)
        pred = sql[qend:end].strip()
        select_list = sql[sel[3] : frm[0]].strip()
        body = sql[frm[0] : qpos].rstrip()
        inner = f"SELECT {select_list}, ({pred}) AS __qualify__ {body}"
        replacement = (
            f"SELECT * EXCEPT(__qualify__) FROM ( {inner} ) WHERE __qualify__ "
        )
        sql = sql[: sel[0]] + replacement + sql[end:]


# -- UNNEST (BQ array flattening) -> LATERAL VIEW (pos)explode -------------
#
# BigQuery flattens arrays with UNNEST in the FROM clause; Spark's
# equivalent is LATERAL VIEW explode (posexplode when BQ's WITH OFFSET
# ordinal is requested, OUTER for the LEFT JOIN ... ON TRUE form that
# keeps empty-array rows). Covered forms, each pinned by tests:
#
#   FROM t, UNNEST(e) AS x                  -> FROM t LATERAL VIEW explode(e) u AS x
#   FROM t CROSS JOIN UNNEST(e) AS x        -> same
#   FROM t LEFT JOIN UNNEST(e) AS x ON TRUE -> LATERAL VIEW OUTER explode(e) u AS x
#   ... UNNEST(e) AS x WITH OFFSET [AS] i   -> LATERAL VIEW posexplode(e) u AS i, x
#   FROM UNNEST(e) AS x  (standalone)       -> FROM (SELECT explode(e) AS x)
#
# Anything else (correlated UNNEST in subqueries works — it is just the
# comma form; UNNEST without an alias does not exist in the covered
# subset) passes through and fails loudly at analysis.

_UNNEST_JOIN_RE = re.compile(
    r"(,|\bCROSS\s+JOIN\b|\bLEFT\s+JOIN\b)\s*UNNEST\s*\(", re.IGNORECASE
)
_UNNEST_BARE_RE = re.compile(r"\bFROM\s+UNNEST\s*\(", re.IGNORECASE)
_UNNEST_ALIAS_RE = re.compile(
    r"\s*(?:AS\s+)?(\w+)(\s+WITH\s+OFFSET(?:\s+AS)?\s+(\w+))?", re.IGNORECASE
)
_UNNEST_ON_TRUE_RE = re.compile(r"\s*ON\s+TRUE", re.IGNORECASE)
# An alias-less UNNEST followed by a clause keyword must NOT treat the
# keyword as the alias — leave the call unrewritten (fails loudly).
_NOT_AN_ALIAS = frozenset(
    """where group order limit having qualify window on join left right
    inner outer cross full union intersect except as with select from""".split()
)


def transpile_unnest(sql: str) -> str:
    """Rewrite the covered UNNEST forms; idempotent (output contains no
    UNNEST)."""
    n = 0
    # standalone FROM UNNEST(...) AS x [WITH OFFSET [AS] i]
    pos = 0
    while True:
        m = _UNNEST_BARE_RE.search(sql, pos)
        if m is None:
            break
        args, end = _split_top_args(sql, m.end() - 1)
        am = _UNNEST_ALIAS_RE.match(sql, end)
        if am is None or not am.group(1) or am.group(1).lower() in _NOT_AN_ALIAS:
            pos = m.end()
            continue
        alias, off = am.group(1), am.group(3)
        inner = (
            f"(SELECT posexplode({args[0]}) AS ({off}, {alias}))"
            if off
            else f"(SELECT explode({args[0]}) AS {alias})"
        )
        sql = sql[: m.start()] + "FROM " + inner + sql[am.end() :]
        pos = m.start() + 1
    # joined forms
    pos = 0
    while True:
        m = _UNNEST_JOIN_RE.search(sql, pos)
        if m is None:
            return sql
        joiner = m.group(1).strip().upper()
        args, end = _split_top_args(sql, m.end() - 1)
        am = _UNNEST_ALIAS_RE.match(sql, end)
        if am is None or not am.group(1) or am.group(1).lower() in _NOT_AN_ALIAS:
            pos = m.end()
            continue
        alias, off = am.group(1), am.group(3)
        end2 = am.end()
        outer = ""
        if joiner.startswith("LEFT"):
            on = _UNNEST_ON_TRUE_RE.match(sql, end2)
            if on is None:
                pos = m.end()
                continue  # LEFT JOIN UNNEST without ON TRUE: leave loudly
            end2 = on.end()
            outer = "OUTER "
        n += 1
        fn = "posexplode" if off else "explode"
        cols = f"{off}, {alias}" if off else alias
        lateral = f" LATERAL VIEW {outer}{fn}({args[0]}) __unnest{n} AS {cols}"
        sql = sql[: m.start()] + lateral + sql[end2:]
        pos = m.start() + 1


# -- STRUCT constructor ----------------------------------------------------
#
# BQ builds typed structs with STRUCT(expr AS name, ...); Spark's named
# constructor is named_struct('name', expr, ...). Only the fully-named
# form rewrites (BQ infers names for bare columns, which Spark's struct()
# also does, so the all-bare form lowercases to struct(); a MIXED form's
# inferred names cannot be reproduced textually and passes through to
# fail loudly). Type syntax STRUCT<...> is untouched.

_STRUCT_CTOR_RE = re.compile(r"\bSTRUCT\s*\((?!\s*<)", re.IGNORECASE)
_STRUCT_AS_RE = re.compile(r"^(.*)\s+AS\s+(\w+)\s*$", re.IGNORECASE | re.S)


def _struct_arg_alias(arg: str) -> tuple[str, str] | None:
    """(expr, alias) when the argument ends in a top-level ``AS name``."""
    m = _STRUCT_AS_RE.match(arg)
    if m is None:
        return None
    expr = m.group(1)
    if _balanced(expr):
        return expr.strip(), m.group(2)
    return None


def transpile_struct(sql: str) -> str:
    pos = 0
    while True:
        m = _STRUCT_CTOR_RE.search(sql, pos)
        if m is None:
            return sql
        args, end = _split_top_args(sql, m.end() - 1)
        aliased = [_struct_arg_alias(a) for a in args]
        if args and all(a is not None for a in aliased):
            pairs = ", ".join(f"'{name}', {expr}" for expr, name in aliased)
            new = f"named_struct({pairs})"
        elif all(a is None for a in aliased):
            new = f"struct({', '.join(args)})"
        else:
            pos = m.end()
            continue  # mixed named/bare: leave loudly
        sql = sql[: m.start()] + new + sql[end:]
        pos = m.start() + 1
