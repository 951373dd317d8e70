"""Driver-contract invariants of the query registry: the properties the
correctness harness depends on but no oracle can check."""

from __future__ import annotations

from eventstreamd_spark import queries_registry as qr


def test_every_query_has_an_oracle() -> None:
    missing = [n for n in qr.QUERIES if n not in qr.ORACLES]
    assert not missing, f"rows-only queries reappeared: {missing}"


def test_priority_window_is_first_and_complete() -> None:
    names = list(qr.QUERIES)
    pri = qr._PRIORITY
    assert names[: len(pri)] == pri  # window layout is exactly _PRIORITY
    assert len(set(pri)) == len(pri)


def test_tail_is_cost_sorted() -> None:
    names = list(qr.QUERIES)
    tail = names[len(qr._PRIORITY):]
    costs = [qr._COST_HINT.get(n, 99.0) for n in tail]
    assert costs == sorted(costs)


def test_queries_and_oracles_share_order() -> None:
    assert list(qr.ORACLES) == [n for n in qr.QUERIES if n in qr.ORACLES]
