"""Plan-inspection helpers: the checks a reviewer runs on .explain()
output, as functions.

``audit_plan`` flags the patterns that are fine at test scale and fatal
at 100 TB — the point is to run it in CI (tests/test_plans.py) so a
plan regression fails a build instead of a production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "extended") -> str:
    """The .explain() text as a value (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def audit_plan(df: DataFrame) -> list[str]:
    """Scan a physical plan for scale red flags; returns warnings.

    - CartesianProduct: an unintentional cross join is O(n*m) rows; the
      only legitimate ones are tiny broadcast ranges (those compile to
      BroadcastNestedLoopJoin instead).
    - full-width scans: a FileScan whose ReadSchema repeats the whole
      table while the query projects few columns means pruning broke
      (usually a UDF or RDD hop hiding the projection from Catalyst).
    - missing partial aggregation: HashAggregate without a partial_
      phase means every raw row crosses the shuffle.
    - InMemoryTableScan under a streaming plan: accidental caching of
      an unbounded source.
    - expensive expression inside a Filter/scan DataFilter: an inferred
      predicate (e.g. InferFiltersFromGenerate's ``size(col) > 0`` over
      an exploded alias) that pushdown inlined past the alias — the
      expression then evaluates twice per row, once serialized at the
      scan (measured 12x on the shingle tier; SCALE.md §5).
    """
    plan = explain_string(df, "formatted")
    warnings: list[str] = []
    if "CartesianProduct" in plan:
        warnings.append("CartesianProduct: unbounded cross join")
    for m in re.finditer(r"(?:DataFilters: \[|Condition : )([^\n]*)", plan):
        pred = m.group(1)
        # HOF/array-fold markers have no business inside a filter: their
        # presence means a non-cheap alias was inlined into a predicate
        # (filter( and split( catch the tokenization fold the original
        # three markers missed — tokens() compiles to filter(split(...)))
        if any(
            k in pred
            for k in ("zip_with(", "aggregate(", "transform(", "filter(", "split(")
        ):
            warnings.append(
                "expensive expression inlined into a filter "
                "(inferred-predicate pushdown past a non-cheap alias?)"
            )
            break
    for scan in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        n_cols = scan.group(1).count(":")
        if n_cols > 24:
            warnings.append(
                f"wide scan ({n_cols} columns) — projection not pruned?"
            )
    if (
        "HashAggregate" in plan
        and "partial_" not in plan
        and "Functions: []" not in plan  # key-only (distinct) aggregates
        and "Exchange" in plan           # have no partial_ marker but
                                         # are still two-phase
    ):
        warnings.append("aggregate without map-side partial phase")
    warnings += _generate_sibling_warnings(df)
    return warnings


# Markers of non-cheap expressions that must never sit in a Project
# evaluated per EXPLODED row: HOF lambdas and regex/tokenization.
_EXPENSIVE = ("filter(", "transform(", "aggregate(", "zip_with(", "regexp")


def _generate_sibling_warnings(df: DataFrame) -> list[str]:
    """Flag expensive expressions in a Project DIRECTLY ABOVE a
    Generate in the optimized logical plan.

    A non-cheap sibling of a generator ends up there and is then
    re-evaluated once per OUTPUT row — per token instead of per
    document (measured 22x on the quality ensemble at sf0.1).  The fix
    is always the same: bind the expression to a real column in a
    projection BELOW the explode, so the Generate repeats a plain
    attribute by reference.
    """
    try:
        plan = explain_string(df, "extended")
        opt = plan.split("== Optimized Logical Plan ==")[1].split(
            "== Physical Plan =="
        )[0]
    except Exception:  # streaming plans or split mismatch: skip
        return []
    lines = opt.splitlines()
    for i, line in enumerate(lines):
        if "Generate " not in line:
            continue
        parent = lines[i - 1] if i else ""
        if "Project" in parent and any(m in parent for m in _EXPENSIVE):
            return [
                "expensive expression in Project above Generate "
                "(re-evaluated per exploded row — bind it below the explode)"
            ]
    return []


def global_window_nodes(df: DataFrame) -> list[str]:
    """Every Window node in the optimized logical plan whose partition
    spec is EMPTY — i.e. a window function that Spark must evaluate on
    a single partition after sorting ALL its input rows on one task.

    At 100 TB a global window over a fact table is a cluster-killer
    (one executor sorts the corpus); over a KB-bounded control table
    (sketch registers, LSH band summaries, bucket directories) it is
    the correct and cheapest plan.  The static adjudication lives in
    tests/test_plans.py::test_global_windows_are_allowlisted — a
    registry-wide gate that fails the build when a NEW query grows an
    unpartitioned window, forcing the bounded-input argument to be
    written down instead of shipped silently (round-8 VERDICT residual
    #3: 517 WindowExec warnings, all adjudicated, but only by hand).
    """
    found: list[str] = []

    def walk(node) -> None:
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            found.append(node.simpleString(120))
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return found
