"""User-defined table functions — the UDTF extension surface.

The reference's only user-extension point is the auth plugin
(/root/reference/evtstrd/auth.py:11-36, a scalar async hook); it has no
table-function concept.  This module demonstrates the full PySpark 4
UDTF surface (SURVEY.md §2 absence list, "UDF/UDAF/UDTF") with a
deterministic, oracle-checkable example.

Scale note: a Python UDTF runs row-at-a-time in a Python worker — it is
the SLOW path, for logic that genuinely needs imperative Python.  This
particular expansion has a pure built-in twin
(``posexplode(split(text, '\\. '))``) that stays in the JVM; the UDTF
exists to pin down the extension mechanism (registration, lateral
join, multi-column yield), not as the recommended plan.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, sentence string, n_chars int")
class SplitSentences:
    """Explode a document into ('. '-delimited) sentences with 1-based
    position and codepoint length.  ``text.split('. ')`` has identical
    semantics to DuckDB's ``string_split`` (no regex, no empty-trim),
    so the oracle can restate it exactly."""

    def eval(self, text: str | None):  # noqa: D102 — contract is eval()
        if text is None:
            return
        for i, s in enumerate(text.split(". "), start=1):
            yield i, s, len(s)


def register_udtfs(spark) -> None:
    """Idempotently register all UDTFs for SQL / LATERAL use."""
    spark.udtf.register("split_sentences", SplitSentences)
