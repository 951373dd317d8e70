"""Golden SSE frames — port of /root/reference/evtstrd_test/events.py
plus the ping/logout constants and chunked encoding."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamd_spark.functions.sse import (
    http_chunk,
    logout_frame,
    ping_frame,
    sse_frame,
)


def render(spark, event_type, data, id=None):
    df = spark.range(1)
    col = sse_frame(
        F.lit(event_type),
        F.lit(data) if data is not None else None,
        F.lit(id) if id is not None else None,
    )
    return df.select(col.alias("f")).collect()[0]["f"]


def test_event_str(spark) -> None:
    # evtstrd_test/events.py:9-12
    assert render(spark, "add", "test-data") == "event: add\r\ndata: test-data\r\n\r\n"


def test_json_event(spark) -> None:
    # evtstrd_test/events.py:15-17 — JSON payload rides through verbatim
    got = render(spark, "add", '{"foo": 3}')
    assert got == 'event: add\r\ndata: {"foo": 3}\r\n\r\n'


def test_id_line(spark) -> None:
    got = render(spark, "add", "x", id="42")
    assert got == "event: add\r\ndata: x\r\nid: 42\r\n\r\n"


def test_falsy_id_omitted(spark) -> None:
    # reference: `if self.id:` — empty string id is dropped
    assert render(spark, "add", "x", id="") == "event: add\r\ndata: x\r\n\r\n"


def test_ping_logout_frames(spark) -> None:
    row = spark.range(1).select(
        ping_frame().alias("p"), logout_frame().alias("l")
    ).collect()[0]
    assert row["p"] == "event: ping\r\ndata: \r\n\r\n"
    assert row["l"] == 'event: logout\r\ndata: {"reason": "expire"}\r\n\r\n'


def test_http_chunk(spark) -> None:
    # http.py:114-125: hex length, CRLF, payload, CRLF
    frame = "event: add\r\ndata: x\r\n\r\n"
    got = (
        spark.range(1)
        .select(http_chunk(F.lit(frame)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == format(len(frame), "x") + "\r\n" + frame + "\r\n"
