"""Write-audit-publish for TxnTable — declarative data-quality
expectations enforced at the table boundary (the Delta Live Tables /
WAP pattern): every append is validated against named predicates, and
what happened is itself lake data.

An :class:`Expectation` is (name, predicate, action):

- ``warn``       violating rows are published anyway, counted;
- ``drop``       violating rows are withheld from the main table and
                 appended to a QUARANTINE TxnTable, tagged with the
                 names of every expectation they failed;
- ``fail``       any violation aborts the whole batch — nothing is
                 written to any table (validation happens before the
                 first byte of data lands).

Commit ordering is quarantine → main → audit, so a crash between
commits can never LOSE a row: it is either in the main table, in
quarantine, or still in the (re-deliverable) source batch. The audit
table records one row per (main version, expectation) with violation
and publish counts — the lineage a compliance review reads, stored as
an ordinary TxnTable you can query, time-travel, and stream.

Scale shape: validation is ONE aggregate pass over the batch (a
conditional sum per expectation — map-side partials, no extra
shuffle), and routing is two filtered projections of the same scan.
Predicates are plain Column expressions, so they run in whole-stage
codegen and push down like any filter.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable


class ExpectationFailed(Exception):
    """A fail-action expectation had violations; nothing was written."""


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column
    action: str = "warn"  # warn | drop | fail

    def __post_init__(self):
        if self.action not in ("warn", "drop", "fail"):
            raise ValueError(f"unknown action: {self.action}")


def append_with_expectations(
    table: TxnTable,
    df: DataFrame,
    expectations: list[Expectation],
    quarantine: TxnTable | None = None,
    audit: TxnTable | None = None,
) -> dict:
    """Validate and publish one batch; returns
    ``{"version", "rows_in", "rows_published", "rows_quarantined",
    "violations": {name: count}}``. Raises :class:`ExpectationFailed`
    (before any write) if a fail-action expectation has violations.
    """
    flags = [
        F.coalesce(e.predicate, F.lit(False)).alias(f"_ok_{e.name}")
        for e in expectations
    ]
    flagged = df.select("*", *flags).localCheckpoint(eager=False)

    drop_flags = [
        F.col(f"_ok_{e.name}") for e in expectations if e.action == "drop"
    ]
    any_drop = (
        ~drop_flags[0] if drop_flags else F.lit(False)
    )
    for c in drop_flags[1:]:
        any_drop = any_drop | ~c
    counts_row = flagged.agg(
        F.count("*").alias("_n"),
        F.sum(F.when(any_drop, 1).otherwise(0)).alias("_n_drop"),
        *[
            F.sum(F.when(~F.col(f"_ok_{e.name}"), 1).otherwise(0)).alias(
                f"_viol_{e.name}"
            )
            for e in expectations
        ],
    ).collect()[0]  # bounded: one row of counters
    rows_in = counts_row["_n"]
    rows_quarantined = counts_row["_n_drop"]
    violations = {e.name: counts_row[f"_viol_{e.name}"] for e in expectations}

    failed = [
        e.name
        for e in expectations
        if e.action == "fail" and violations[e.name] > 0
    ]
    if failed:
        raise ExpectationFailed(
            f"fail-action expectations violated, batch aborted: {failed} "
            f"(counts: { {n: violations[n] for n in failed} })"
        )

    drop_names = [e.name for e in expectations if e.action == "drop"]
    if drop_names and rows_quarantined:
        quarantined_df = flagged.filter(any_drop).withColumn(
            "_violations",
            F.array_compact(
                F.array(
                    *[
                        F.when(~F.col(f"_ok_{n}"), F.lit(n))
                        for n in drop_names
                    ]
                )
            ),
        ).drop(*[f"_ok_{e.name}" for e in expectations])
        # quarantine BEFORE publish: a crash between the two commits
        # leaves the bad rows recorded and the batch re-deliverable
        if quarantine is not None:
            quarantine.append(quarantined_df)
        clean = flagged.filter(~any_drop)
    else:
        clean = flagged

    clean = clean.drop(*[f"_ok_{e.name}" for e in expectations])
    version = table.append(clean)
    rows_published = rows_in - rows_quarantined

    if audit is not None:
        audit.append(
            df.sparkSession.createDataFrame(
                [
                    (
                        version,
                        e.name,
                        e.action,
                        violations[e.name],
                        rows_in,
                        rows_published,
                    )
                    for e in expectations
                ],
                "main_version INT, expectation STRING, action STRING, "
                "violations BIGINT, rows_in BIGINT, rows_published BIGINT",
            )
        )
    return {
        "version": version,
        "rows_in": rows_in,
        "rows_published": rows_published,
        "rows_quarantined": rows_quarantined,
        "violations": violations,
    }
