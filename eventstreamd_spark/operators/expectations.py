"""Declarative data-quality expectations, verified in one pass.

The Deequ / Great-Expectations shape: a table ships with a contract —
completeness, key uniqueness, value ranges, categorical domains,
referential integrity — and the engine verifies the whole contract in
as few scans as the constraints allow, emitting one row per constraint
with the violation count and a pass/fail verdict.

Plan shape at 100 TB: every row-local constraint folds into ONE
conditional aggregation over a single scan (violations are ``sum(CASE
WHEN ...)``), the key-uniqueness constraint adds the one unavoidable
distinct aggregate (swap for the HLL register tier in sketches.py when
an approximate uniqueness check suffices), and the referential check
is a broadcast anti-join count against the (smaller) parent key side.
The per-constraint report is then a constant-size unpivot — no second
scan per constraint, which is the difference between a contract with 6
checks and 6 full passes over 100 TB.

Related: integrity_audit (relational.py) covers multi-FK orphan
analysis; this module is the generic declarative-contract surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _viol(cond) -> F.Column:
    """Violation counter: rows where the constraint does NOT hold.
    NULLs count as violations for value constraints (a NULL quantity
    is not 'between 1 and 50')."""
    return F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))).cast("bigint")


def expectations_report(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Verify the lineitem contract; one row per constraint.

    Constraints (the contract a training-data ingest would pin):
      not_null_returnflag     l_returnflag IS NOT NULL
      unique_line_key         (l_orderkey, l_linenumber) unique
      range_quantity          l_quantity in [1, 50]
      range_discount          l_discount in [0.0, 0.1]
      domain_returnflag       l_returnflag in {A, N, R}
      positive_extendedprice  l_extendedprice > 0
      fk_orderkey             l_orderkey references orders.o_orderkey
    """
    one_pass = lineitem.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        _viol(F.col("l_returnflag").isNotNull()).alias("v_notnull"),
        # distinct over the STRUCT, not the column pair: multi-column
        # count_distinct drops rows with any NULL component, while the
        # twin's row-value DISTINCT counts the (key, NULL) tuple — the
        # struct form matches it and keeps null-key rows out of the
        # duplicate count
        (
            F.count("*")
            - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))
        )
        .cast("bigint")
        .alias("v_unique"),
        _viol(F.col("l_quantity").between(1.0, 50.0)).alias("v_qty"),
        _viol(F.col("l_discount").between(0.0, 0.1)).alias("v_disc"),
        _viol(F.col("l_returnflag").isin("A", "N", "R")).alias("v_domain"),
        _viol(F.col("l_extendedprice") > 0.0).alias("v_pos"),
    )
    # anti-join strategy is left to Catalyst/AQE: the parent side is a
    # key-only projection but nothing guarantees it fits a broadcast
    # at warehouse scale — forcing one would pin an OOM
    orphans = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("v_fk"))
    )
    wide = one_pass.crossJoin(F.broadcast(orphans))
    report = wide.selectExpr(
        "n_rows",
        "stack(7, "
        "'not_null_returnflag', v_notnull, "
        "'unique_line_key', v_unique, "
        "'range_quantity', v_qty, "
        "'range_discount', v_disc, "
        "'domain_returnflag', v_domain, "
        "'positive_extendedprice', v_pos, "
        "'fk_orderkey', v_fk) AS (constraint_name, n_violations)",
    )
    return report.select(
        "constraint_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
        (
            F.col("n_violations").cast("double") / F.col("n_rows").cast("double")
        ).alias("violation_rate"),
    )


def sql_expectations_report(
    lineitem: str = "lineitem", orders: str = "orders"
) -> str:
    return f"""
WITH one_pass AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN l_returnflag IS NOT NULL THEN 0 ELSE 1 END)
              AS BIGINT) AS v_notnull,
         CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
              AS BIGINT) AS v_unique,
         CAST(sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 0 ELSE 1 END)
              AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END)
              AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
              AS BIGINT) AS v_domain,
         CAST(sum(CASE WHEN l_extendedprice > 0.0 THEN 0 ELSE 1 END)
              AS BIGINT) AS v_pos
  FROM {lineitem}
),
orphans AS (
  SELECT CAST(count(*) AS BIGINT) AS v_fk
  FROM {lineitem} l
  WHERE NOT EXISTS (
    SELECT 1 FROM {orders} o WHERE o.o_orderkey = l.l_orderkey
  )
),
report AS (
  SELECT n_rows, 'not_null_returnflag' AS constraint_name, v_notnull AS n_violations
    FROM one_pass
  UNION ALL SELECT n_rows, 'unique_line_key', v_unique FROM one_pass
  UNION ALL SELECT n_rows, 'range_quantity', v_qty FROM one_pass
  UNION ALL SELECT n_rows, 'range_discount', v_disc FROM one_pass
  UNION ALL SELECT n_rows, 'domain_returnflag', v_domain FROM one_pass
  UNION ALL SELECT n_rows, 'positive_extendedprice', v_pos FROM one_pass
  UNION ALL SELECT o.n_rows, 'fk_orderkey', p.v_fk
    FROM one_pass o CROSS JOIN orphans p
)
SELECT constraint_name, n_rows, n_violations,
       (n_violations = 0) AS passed,
       (CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE))
         AS violation_rate
FROM report
"""
