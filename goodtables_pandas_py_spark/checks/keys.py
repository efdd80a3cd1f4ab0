"""Table-level key checks K1-K3 (SURVEY.md §2.5, [R check.py]).

Each check runs on the *parsed* DataFrame (callers should persist it —
SURVEY.md §4.3.2) and returns bounded results: an exact violation count
plus a capped sample of offending key tuples (never an unbounded
collect — 100 TB posture, SURVEY.md §4.4).

Null semantics (SURVEY.md §2.5 decisions, documented deviations none):
- K1 primary key: any-null component is a violation; duplicate tuples
  are violations. Spark ``groupBy`` groups nulls together, matching
  pandas ``duplicated()`` NaN==NaN behavior ([R check.py]).
- K3 foreign key: child rows with any-null component are SKIPPED (SQL
  MATCH SIMPLE; pandas merge matches NaN<->NaN, so the reference
  counts null tuples as satisfied — same observable outcome: neither
  reports them as violations).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import VALUE_SAMPLE_CAP, Error


@dataclass
class KeyCheckResult:
    code: str
    count: int = 0
    values: list = dc_field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.count == 0

    def to_error(self, resource: str, field_names: list[str], constraint) -> Error:
        return Error(
            code=self.code,
            resource=resource,
            field=",".join(field_names),
            constraint=constraint,
            values=self.values,
            count=self.count,
            message=f"{self.code} on ({', '.join(field_names)}): "
            f"{self.count} violating rows",
        )


def _tuple_col(df: DataFrame, key: list[str]):
    return [F.col(c) for c in key]


def _free_name(base: str, taken) -> str:
    """Internal alias guaranteed not to collide with a user field: a
    fixed '__' prefix defends against a field named 'n' but not one
    literally named '__n' (r10 review fix — that collision made the
    post-agg filter AMBIGUOUS_REFERENCE instead of reporting)."""
    name = base
    while name in taken:
        name = "_" + name
    return name


def duplicate_keys_df(df: DataFrame, key: list[str]) -> DataFrame:
    """Shared kernel of K1/K2/C2: key tuples appearing more than once,
    with multiplicities (count column: ``_free_name('__n', key)``).
    One hash-aggregate shuffle on the key — partial (map-side)
    aggregation is automatic (SURVEY.md §4.2)."""
    n = _free_name("__n", key)
    return (
        df.groupBy(*_tuple_col(df, key))
        .agg(F.count(F.lit(1)).alias(n))
        .where(F.col(n) > 1)
    )


def _dup_count_and_sample(dups: DataFrame, key: list[str]) -> tuple[int, list]:
    """Exact extra-row count + bounded sample from ONE shuffle: the
    violating groups (usually tiny — violations only) are persisted, so
    the count aggregate pays the groupBy shuffle once and the sample is
    a cache read, never a second shuffle or an unbounded collect
    (SURVEY.md §4.4). Worst case (everything duplicated) the persist
    spills to disk rather than recomputing."""
    n = _free_name("__n", key)
    dups = dups.persist()
    try:
        extra = dups.select(
            F.coalesce(F.sum(F.col(n) - 1), F.lit(0)).alias("extra")
        ).first()["extra"]
        sample: list = []
        if extra:
            sample = [
                tuple(r[c] for c in key)
                for r in dups.limit(VALUE_SAMPLE_CAP).collect()
            ]
        return int(extra), sample
    finally:
        dups.unpersist()


def check_primary_key(df: DataFrame, key: list[str]) -> KeyCheckResult:
    """K1 ([R check.py::check_primary_key]): components non-null AND
    tuple unique. Returns combined violation count (null rows + extra
    duplicate rows).

    One action, one shuffle: group on the key tuple and fold null-row
    and duplicate counts out of the grouped result in the same job (vs
    the naive two passes — a scan-count for nulls plus a groupBy for
    dups). The any-null flag is DERIVED from the key columns after the
    aggregate (r12): it is constant within a key group, so grouping on
    it was redundant — and keying the groupBy on the bare tuple lets a
    frame already hash-partitioned by the PK (validate_table's cache)
    satisfy the distribution with no exchange at all (guide §2.4)."""
    null_mask = None
    for c in key:
        m = F.col(c).isNull()
        null_mask = m if null_mask is None else (null_mask | m)

    n = _free_name("__n", key)
    isnull = _free_name("__isnull", key)
    viol = (
        df.groupBy(*_tuple_col(df, key))
        .agg(F.count(F.lit(1)).alias(n))
        .select(null_mask.alias(isnull), "*")
        .where(F.col(isnull) | (F.col(n) > 1))
        .persist()  # violations only — tiny; sample is then a cache read
    )
    try:
        row = viol.agg(
            F.coalesce(
                F.sum(F.when(F.col(isnull), F.col(n)).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("nulls"),
            F.coalesce(
                F.sum(
                    F.when(~F.col(isnull), F.greatest(F.col(n) - 1, F.lit(0)))
                ),
                F.lit(0),
            ).alias("extra"),
        ).first()
        nulls, extra = int(row["nulls"]), int(row["extra"])

        sample: list = []
        if nulls + extra:
            # violating groups: viol already IS the filtered frame —
            # sample straight from the cache (the old re-filter
            # repeated viol's own predicate; r10 review cleanup)
            sample = [
                tuple(r[c] for c in key)
                for r in viol.limit(VALUE_SAMPLE_CAP).collect()
            ]
        return KeyCheckResult(
            code="primary-key-constraint", count=nulls + extra, values=sample
        )
    finally:
        viol.unpersist()


def check_unique_key(df: DataFrame, key: list[str]) -> KeyCheckResult:
    """K2 ([R check.py::check_unique_keys]): tuple uniqueness only
    (null components allowed; null tuples can duplicate, matching
    pandas — Spark groupBy groups nulls identically)."""
    extra, sample = _dup_count_and_sample(duplicate_keys_df(df, key), key)
    return KeyCheckResult(code="unique-key-constraint", count=extra, values=sample)


def foreign_key_violations_df(
    child: DataFrame,
    child_fields: list[str],
    parent: DataFrame,
    parent_fields: list[str],
    broadcast_parent: bool | None = None,
) -> DataFrame:
    """K3 kernel ([R check.py::check_foreign_keys]): DISTINCT child key
    tuples with no match in parent — a left ANTI join on distinct sets
    (violation *set*, not per-row; SURVEY.md §4.3.3).

    Scale notes: distinct() both sides first shrinks the shuffle to key
    cardinality; AQE converts to broadcast when the parent is small.
    ``broadcast_parent=True`` forces the hint for known dimension
    tables.

    Null semantics (pandas-reference parity): pandas ``merge`` matches
    NaN==NaN, so a PARTIALLY-null composite tuple like (1, null) is a
    violation unless the parent contains (1, null) too. We mirror that
    with a null-safe equality join (``<=>`` — still a hash-joinable
    equi-key) and skip only FULLY-null tuples (no information to
    check, matching the reference's NA-row drop)."""
    some_notnull = None
    for c in child_fields:
        m = F.col(c).isNotNull()
        some_notnull = m if some_notnull is None else (some_notnull | m)
    left = child.where(some_notnull).select(*child_fields).distinct()
    right = parent.select(
        *[F.col(p).alias(f"__ref_{i}") for i, p in enumerate(parent_fields)]
    ).distinct()
    if broadcast_parent:
        right = F.broadcast(right)
    cond = None
    for i, c in enumerate(child_fields):
        eq = left[c].eqNullSafe(right[f"__ref_{i}"])
        cond = eq if cond is None else (cond & eq)
    return left.join(right, cond, "left_anti")


def foreign_key_violations_multi(
    child: DataFrame,
    child_fields: list[str],
    parents: dict[str, tuple[DataFrame, list[str]]],
    broadcast_parent: bool | None = None,
    label_col: str = "fk",
) -> DataFrame:
    """Several FK checks against the SAME child key tuple in ONE pass:
    returns (``label_col``, *child_fields) — one row per (fk name,
    violating distinct child tuple).

    Why not N calls to :func:`foreign_key_violations_df` unioned:
    each call re-scans the child and re-runs the distinct aggregate —
    with a broadcast anti-join the child side has no exchange, so
    Spark's ReusedExchange cannot dedupe the scans and an N-FK check
    pays N full child scans (measured: the benched two-FK
    k3_fk_violations ran 2× a single check, the r4 "fk_anti_join
    drift"). Here the child is scanned and distinct'd ONCE, each
    parent probes it with a null-safe broadcast LEFT join (marker
    column), and one explode emits the per-FK violation rows — a
    single linear plan: scan → distinct → N broadcast hash joins →
    explode. At 100 TB that's N FK checks for one child shuffle.

    Null semantics identical to :func:`foreign_key_violations_df`:
    fully-null child tuples are skipped, partial nulls join null-safe
    (``<=>``)."""
    for name, (_, parent_fields) in parents.items():
        if len(parent_fields) != len(child_fields):
            raise ValueError(
                f"foreign key {name!r}: parent key width "
                f"{len(parent_fields)} != child key width "
                f"{len(child_fields)} — a mismatched zip would silently "
                "compare the wrong columns"
            )
    some_notnull = None
    for c in child_fields:
        m = F.col(c).isNotNull()
        some_notnull = m if some_notnull is None else (some_notnull | m)
    keys = child.where(some_notnull).select(*child_fields).distinct()
    markers = []
    joined = keys
    for idx, (name, (parent, parent_fields)) in enumerate(parents.items()):
        right = parent.select(
            *[
                F.col(p).alias(f"__ref{idx}_{i}")
                for i, p in enumerate(parent_fields)
            ],
            F.lit(1).alias(f"__hit{idx}"),
        ).dropDuplicates([f"__ref{idx}_{i}" for i in range(len(parent_fields))])
        if broadcast_parent:
            right = F.broadcast(right)
        cond = None
        for i, c in enumerate(child_fields):
            eq = joined[c].eqNullSafe(right[f"__ref{idx}_{i}"])
            cond = eq if cond is None else (cond & eq)
        joined = joined.join(right, cond, "left").drop(
            *[f"__ref{idx}_{i}" for i in range(len(parent_fields))]
        )
        markers.append(
            F.when(F.col(f"__hit{idx}").isNull(), F.lit(name))
        )
    out = joined.select(
        *child_fields,
        F.explode(
            F.filter(F.array(*markers), lambda x: x.isNotNull())
        ).alias(label_col),
    )
    return out.select(label_col, *child_fields)


def check_foreign_key(
    child: DataFrame,
    child_fields: list[str],
    parent: DataFrame,
    parent_fields: list[str],
    broadcast_parent: bool | None = None,
) -> KeyCheckResult:
    viol = foreign_key_violations_df(
        child, child_fields, parent, parent_fields, broadcast_parent
    ).persist()  # violating tuples only; sample reads the cache
    try:
        n = viol.count()
        sample: list = []
        if n:
            sample = [
                tuple(r[c] for c in child_fields)
                for r in viol.limit(VALUE_SAMPLE_CAP).collect()
            ]
        return KeyCheckResult(code="foreign-key-error", count=int(n), values=sample)
    finally:
        viol.unpersist()
