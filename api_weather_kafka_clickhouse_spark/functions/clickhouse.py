"""ClickHouse function-name compatibility layer.

The reference's warehouse is ClickHouse (`app/clickhouse_ddl.sql`,
`app/clickhouse_db.py`), so its users write ClickHouse SQL. This
module maps the ClickHouse function vocabulary onto Spark Column
expressions one-for-one, so a query ported from the reference stack
reads the same: ``toYYYYMM(event_date)`` (the reference's partition
key, clickhouse_ddl.sql:31), ``countIf``, ``uniqExact``, ``argMax``,
``arrayJoin``, ``multiIf`` all work verbatim as Python calls.

Everything here is a THIN alias over built-in Catalyst expressions —
zero UDFs, zero plan cost; the point is vocabulary, not machinery.
Each function documents any semantic delta from ClickHouse (there are
few; the notable ones: ``uniq`` is HLL-approximate on both systems
but NOT the same sketch, so estimates differ; ``cityHash64`` has no
Spark twin — ``xxhash64`` fills the same role with a different
algorithm, so hashes do not match across systems).

Determinism note: ``argMax/argMin`` ties are arbitrary in ClickHouse
and in Spark's ``max_by/min_by``; oracle-checked queries must add a
total-order tiebreak exactly like the native operators do
(registry.py conventions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --------------------------------------------------------------- dates


def toYYYYMM(c: Column | str) -> Column:
    """ClickHouse toYYYYMM(date) -> UInt32 yyyyMM (ddl:31's partition
    key). Integer arithmetic, not a format call — prunable."""
    c = _col(c)
    return (F.year(c) * 100 + F.month(c)).cast("int")


def toYYYYMMDD(c: Column | str) -> Column:
    c = _col(c)
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def toDate(c: Column | str) -> Column:
    return _col(c).cast("date")


def toDateTime(c: Column | str) -> Column:
    return _col(c).cast("timestamp")


def toStartOfHour(c: Column | str) -> Column:
    return F.date_trunc("hour", _col(c))


def toStartOfDay(c: Column | str) -> Column:
    return F.date_trunc("day", _col(c))


def toStartOfMonth(c: Column | str) -> Column:
    return F.trunc(_col(c), "month")


def toStartOfWeek(c: Column | str) -> Column:
    """ClickHouse mode-1 week start (Monday), as a date. next_day is
    STRICTLY-after, so next_day(d,'Mon')-7 lands on d itself when d
    is a Monday and on the preceding Monday otherwise."""
    return F.date_sub(F.next_day(_col(c).cast("date"), "Mon"), 7)


def toUnixTimestamp(c: Column | str) -> Column:
    return F.unix_timestamp(_col(c)).cast("bigint")


def toHour(c: Column | str) -> Column:
    return F.hour(_col(c)).cast("int")


def toDayOfWeek(c: Column | str) -> Column:
    """ClickHouse: Monday=1..Sunday=7 (ISO). Spark dayofweek is
    Sunday=1, so shift."""
    return (((F.dayofweek(_col(c)) + 5) % 7) + 1).cast("int")


def dateDiff(unit: str, a: Column | str, b: Column | str) -> Column:
    """dateDiff('day'|'month'|'year', start, end) — integer deltas,
    matching ClickHouse's truncation semantics for these units."""
    a, b = _col(a), _col(b)
    if unit == "day":
        return F.datediff(b, a).cast("bigint")
    if unit == "month":
        return ((F.year(b) - F.year(a)) * 12 + (F.month(b) - F.month(a))).cast("bigint")
    if unit == "year":
        return (F.year(b) - F.year(a)).cast("bigint")
    raise ValueError(f"unsupported dateDiff unit {unit!r}")


# ------------------------------------------------------------- strings


def lengthUTF8(c: Column | str) -> Column:
    return F.length(_col(c)).cast("bigint")


def splitByChar(sep: str, c: Column | str) -> Column:
    # ClickHouse takes a single character; escape for the regex API
    import re as _re

    return F.split(_col(c), _re.escape(sep))


def replaceRegexpAll(c: Column | str, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(_col(c), pattern, replacement)


def extract(c: Column | str, pattern: str) -> Column:
    """ClickHouse extract(haystack, pattern): first match (group 1 if
    the pattern has one, else the whole match); '' when no match."""
    import re as _re

    group = 1 if _re.compile(pattern).groups else 0
    return F.regexp_extract(_col(c), pattern, group)


def startsWith(c: Column | str, prefix: str) -> Column:
    return F.startswith(_col(c), F.lit(prefix))


def endsWith(c: Column | str, suffix: str) -> Column:
    return F.endswith(_col(c), F.lit(suffix))


def empty(c: Column | str) -> Column:
    return F.length(_col(c)) == 0


def notEmpty(c: Column | str) -> Column:
    return F.length(_col(c)) > 0


def trimBoth(c: Column | str) -> Column:
    return F.trim(_col(c))


# -------------------------------------------------------------- arrays


def arrayJoin_explode(c: Column | str) -> Column:
    """ClickHouse arrayJoin — Spark's explode. Named with the suffix
    because arrayJoin changes row cardinality: it must sit in a
    select() the way explode does, not inside a scalar expression."""
    return F.explode(_col(c))


def arrayMap(fn, c: Column | str) -> Column:
    return F.transform(_col(c), fn)


def arrayFilter(fn, c: Column | str) -> Column:
    return F.filter(_col(c), fn)


def arrayExists(fn, c: Column | str) -> Column:
    return F.exists(_col(c), fn)


def arraySum(c: Column | str) -> Column:
    return F.aggregate(_col(c), F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def has(c: Column | str, value) -> Column:
    return F.array_contains(_col(c), value)


def arraySort(c: Column | str) -> Column:
    return F.sort_array(_col(c))


def arrayDistinct(c: Column | str) -> Column:
    return F.array_distinct(_col(c))


def arrayStringConcat(c: Column | str, sep: str = "") -> Column:
    return F.array_join(_col(c), sep)


def arrayEnumerate(c: Column | str) -> Column:
    """1-based index array [1..len], ClickHouse semantics."""
    return F.sequence(F.lit(1), F.size(_col(c)))


# -------------------------------------------------------- conditionals


def if_(cond: Column, then, otherwise) -> Column:
    return F.when(cond, then).otherwise(otherwise)


def multiIf(*args) -> Column:
    """multiIf(cond1, then1, cond2, then2, ..., else_) — chained
    when/otherwise, evaluated in order like ClickHouse."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multiIf needs cond/then pairs plus a final else")
    out = F.when(args[0], args[1])
    for i in range(2, len(args) - 1, 2):
        out = out.when(args[i], args[i + 1])
    return out.otherwise(args[-1])


def ifNull(c: Column | str, default) -> Column:
    return F.coalesce(_col(c), F.lit(default) if not isinstance(default, Column) else default)


def nullIf(c: Column | str, value) -> Column:
    return F.nullif(_col(c), F.lit(value) if not isinstance(value, Column) else value)


# ---------------------------------------------------------- aggregates


def uniqExact(c: Column | str) -> Column:
    return F.countDistinct(_col(c)).cast("bigint")


def uniq(c: Column | str) -> Column:
    """Approximate distinct. BOTH systems use HLL-family sketches but
    not the same one — estimates differ between ClickHouse and Spark;
    use uniqExact when values must match."""
    return F.approx_count_distinct(_col(c)).cast("bigint")


def countIf(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def sumIf(c: Column | str, cond: Column) -> Column:
    return F.sum(F.when(cond, _col(c)).otherwise(F.lit(0)))


def avgIf(c: Column | str, cond: Column) -> Column:
    return F.avg(F.when(cond, _col(c)))


def argMax(arg: Column | str, val: Column | str) -> Column:
    """Ties are arbitrary in both systems — add a tiebreak for
    deterministic pipelines (see module docstring)."""
    return F.max_by(_col(arg), _col(val))


def argMin(arg: Column | str, val: Column | str) -> Column:
    return F.min_by(_col(arg), _col(val))


def groupArray(c: Column | str) -> Column:
    """Collection order is partition-dependent in BOTH systems; sort
    the result (arraySort) for deterministic output."""
    return F.collect_list(_col(c))


def groupUniqArray(c: Column | str) -> Column:
    return F.collect_set(_col(c))


def any_(c: Column | str) -> Column:
    return F.first(_col(c), ignorenulls=True)


def quantileExact(level: float, c: Column | str) -> Column:
    return F.percentile(_col(c), F.lit(level))


def quantile(level: float, c: Column | str) -> Column:
    """Approximate quantile (sketch-based on both systems; estimates
    differ — use quantileExact for cross-system parity)."""
    return F.percentile_approx(_col(c), F.lit(level), F.lit(10000))


# ------------------------------------------------------- type & math


def toInt64(c: Column | str) -> Column:
    return _col(c).cast("bigint")


def toFloat64(c: Column | str) -> Column:
    return _col(c).cast("double")


def toString(c: Column | str) -> Column:
    return _col(c).cast("string")


def intDiv(a: Column | str, b) -> Column:
    b = F.lit(b) if not isinstance(b, Column) else b
    return F.expr(f"({_sql(_col(a))}) div ({_sql(b)})")


def modulo(a: Column | str, b) -> Column:
    return _col(a) % (F.lit(b) if not isinstance(b, Column) else b)


def roundBankers(c: Column | str, scale: int = 0) -> Column:
    return F.bround(_col(c), scale)


def cityHash64_substitute(c: Column | str) -> Column:
    """ClickHouse cityHash64 has no Spark implementation; xxhash64
    fills the same role (fast 64-bit partition/sample hashing) with a
    DIFFERENT algorithm — values do not match across systems. Named
    loudly so a port never silently assumes hash equality."""
    return F.xxhash64(_col(c))


def JSONExtractString(c: Column | str, key: str) -> Column:
    return F.get_json_object(_col(c), f"$.{key}")


def _sql(c: Column) -> str:
    """Render a Column back to a SQL fragment (used by intDiv, whose
    operator form `div` has no functions.* equivalent)."""
    return c._jc.toString()


def uniqUpTo(n: int, c: Column | str) -> Column:
    """ClickHouse uniqUpTo(N): the exact distinct count while it is
    <= N, and N+1 for anything larger — the 'are there more than N?'
    aggregate that never pays full-cardinality state in ClickHouse.
    Spark has no saturating counter, so this computes the exact
    distinct and clamps: the VALUE matches ClickHouse exactly; the
    cost profile does not (document when porting hot queries)."""
    return F.least(F.countDistinct(_col(c)), F.lit(n + 1)).cast("bigint")


def avgWeighted(x: Column | str, w: Column | str) -> Column:
    """ClickHouse avgWeighted(x, w) = sum(x*w)/sum(w). For
    cross-engine determinism on money-like inputs, cast x to DECIMAL
    before calling (the registry convention); the division itself is
    one IEEE op."""
    x, w = _col(x), _col(w)
    return F.sum(x * w) / F.sum(w)


# ------------------------------------- round-9 vocabulary additions


def toQuarter(c: Column | str) -> Column:
    return F.quarter(_col(c))


def toISOWeek(c: Column | str) -> Column:
    return F.weekofyear(_col(c))


def arraySlice(c: Column | str, offset, length) -> Column:
    """ClickHouse arraySlice(arr, offset, length), 1-based offset.
    Both arguments may be Columns (Spark's slice accepts either)."""
    return F.slice(_col(c), offset, length)


def arrayMax(c: Column | str) -> Column:
    return F.array_max(_col(c))


def arrayMin(c: Column | str) -> Column:
    return F.array_min(_col(c))


def arrayDifference(c: Column | str) -> Column:
    """ClickHouse arrayDifference, minus its leading 0: the adjacent
    deltas arr[i+1] - arr[i] (length n-1; empty for single-element
    arrays). ClickHouse prepends a 0 so the result keeps length n —
    callers that need that parity can array_insert it; the deltas
    themselves are what every consumer (gap analysis,
    runningDifference ports) actually uses."""
    arr = _col(c)
    return F.transform(
        F.slice(arr, 2, F.size(arr) - 1),
        lambda x, i: x - F.element_at(arr, i + 1),
    )


def bar(c: Column | str, lo: float, hi: float, width: int) -> Column:
    """ClickHouse bar(x, min, max, width): a unicode bar whose length
    is x scaled into [0, width], clamped — the in-query sparkline used
    in ops dashboards. Character-exact cross-engine: the length is
    floor((x-min)/(max-min)*width) on IEEE doubles and the glyph is
    the same literal."""
    x = _col(c).cast("double")
    k = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(width))
    k = F.greatest(F.lit(0), F.least(F.lit(width), k))
    return F.substr(F.lit("█" * width), F.lit(1), k.cast("int"))


def transform_lookup(c: Column | str, mapping: dict, default) -> Column:
    """ClickHouse transform(x, [from...], [to...], default): the
    inline lookup table, compiled to a CASE chain (Catalyst folds it
    to a switch over literals)."""
    col = _col(c)
    expr = None
    for k, v in mapping.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    return expr.otherwise(default)


def toStartOfFifteenMinutes(c: Column | str) -> Column:
    """ClickHouse toStartOfFifteenMinutes, kept as the integer
    15-minute bucket index (epoch div 900) rather than a rendered
    timestamp: exact integer math on both engines, and the bucket
    index is what aggregations key on anyway. Integer division is
    spelled (e - e % 900) / 900 so the division is exact in double
    (numerator a multiple of 900) — a bare float divide could land
    at x.9999... and truncate one bucket off."""
    e = F.unix_timestamp(_col(c)).cast("bigint")
    return ((e - e % F.lit(900)) / F.lit(900)).cast("bigint")


def arrayCumSum(c: Column | str) -> Column:
    """ClickHouse arrayCumSum: running prefix sums of the array."""
    arr = _col(c)
    return F.transform(
        arr, lambda x, i: F.aggregate(F.slice(arr, 1, i + 1), F.lit(0).cast("bigint"), lambda a, b: a + b)
    )


def arrayCompact(c: Column | str) -> Column:
    """ClickHouse arrayCompact: drop CONSECUTIVE duplicates (run-length
    head of each run survives; distinct from arrayDistinct). The
    previous element is element_at(arr, i) (1-based lookup with the
    0-based lambda index), guarded by when() — CaseWhen branches are
    lazy, so index 0 never reaches element_at (which throws under
    ANSI mode)."""
    arr = _col(c)
    return F.filter(
        arr,
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            x != F.element_at(arr, i)
        ),
    )


def groupBitOr(c: Column | str) -> Column:
    """ClickHouse groupBitOr aggregate."""
    return F.bit_or(_col(c))


def bitmaskToList(c: Column | str, max_bits: int = 8) -> Column:
    """ClickHouse bitmaskToList(mask): the set bits as their power-of-
    two values, ascending, comma-joined ('50' -> '2,16,32'). max_bits
    bounds the probe range (a literal array; callers know their
    domain width)."""
    mask = _col(c)
    powers = F.array(*[F.lit(1 << b) for b in range(max_bits)])
    present = F.filter(powers, lambda p: mask.bitwiseAND(p) != 0)
    return F.array_join(F.transform(present, lambda p: p.cast("string")), ",")


def formatReadableSize(c: Column | str) -> Column:
    """ClickHouse formatReadableSize(bytes): '123.00 B' / '1.21 KiB' /
    '3.45 MiB' / '7.89 GiB'. Unit chosen by exact BIGINT thresholds;
    the displayed quantity is one double division rounded to 2 dp
    (IEEE division + round on identical operands — deterministic
    cross-engine), rendered with exactly two decimals."""
    b = _col(c).cast("bigint")
    kib, mib, gib = 1024, 1024**2, 1024**3
    qty = (
        F.when(b >= gib, F.round(b.cast("double") / F.lit(float(gib)), 2))
        .when(b >= mib, F.round(b.cast("double") / F.lit(float(mib)), 2))
        .when(b >= kib, F.round(b.cast("double") / F.lit(float(kib)), 2))
        .otherwise(F.round(b.cast("double"), 2))
    )
    unit = (
        F.when(b >= gib, F.lit("GiB"))
        .when(b >= mib, F.lit("MiB"))
        .when(b >= kib, F.lit("KiB"))
        .otherwise(F.lit("B"))
    )
    # render N.NN WITHOUT format_number: it inserts thousands
    # separators ("1,023.00") that the B branch can reach — the
    # integer-cents render matches printf('%.2f') exactly because qty
    # is already rounded to 2 dp (qty*100 is within 1e-10 of an int)
    cents = F.round(qty * F.lit(100.0), 0).cast("bigint")
    two_dp = F.concat(
        (cents / F.lit(100)).cast("bigint").cast("string"),
        F.lit("."),
        F.lpad((cents % F.lit(100)).cast("string"), 2, "0"),
    )
    return F.concat(two_dp, F.lit(" "), unit)
