"""Server-Sent-Events wire-frame construction as Column expressions.

Reference: /root/reference/evtstrd/events.py:27-33 —

    event: <type>\r\ndata: <data>\r\n[id: <id>\r\n]\r\n

The ``id`` line appears only when the id is truthy (``if self.id:``), so
both NULL and empty-string ids are omitted.  The payload is the JSON
serialization of ``data`` (events.py:48-49); callers pass a JSON string
column.  The chunked-transfer framing around it (hex length prefix,
/root/reference/evtstrd/http.py:114-125) is also provided for the sink.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

CRLF = "\r\n"


def sse_frame(
    event_type: Column, data: Column | None = None, id: Column | None = None
) -> Column:
    """Render one SSE frame; all pieces concat-ed JVM-side."""
    data = data if data is not None else F.lit("")
    head = F.concat(
        F.lit("event: "), event_type, F.lit(CRLF),
        F.lit("data: "), F.coalesce(data, F.lit("")), F.lit(CRLF),
    )
    if id is not None:
        id_line = F.when(
            id.isNotNull() & (id.cast("string") != ""),
            F.concat(F.lit("id: "), id.cast("string"), F.lit(CRLF)),
        ).otherwise(F.lit(""))
        head = F.concat(head, id_line)
    return F.concat(head, F.lit(CRLF))


def sse_frame_sql(event_expr: str, data_expr: str, id_expr: str | None = None) -> str:
    """DuckDB twin of ``sse_frame`` for the correctness oracle."""
    crlf = "chr(13) || chr(10)"
    head = (
        f"'event: ' || {event_expr} || {crlf} || "
        f"'data: ' || coalesce({data_expr}, '') || {crlf}"
    )
    if id_expr is not None:
        head += (
            f" || CASE WHEN {id_expr} IS NOT NULL AND CAST({id_expr} AS VARCHAR) <> '' "
            f"THEN 'id: ' || CAST({id_expr} AS VARCHAR) || {crlf} ELSE '' END"
        )
    return f"({head} || {crlf})"


def http_chunk(frame: Column) -> Column:
    """HTTP/1.1 chunked-transfer encoding of one frame
    (reference http.py:114-125: lowercase hex length + CRLF framing)."""
    body_len = F.length(frame.cast("binary"))
    return F.concat(
        F.lower(F.hex(body_len)), F.lit(CRLF), frame, F.lit(CRLF)
    )


def ping_frame() -> Column:
    """PingEvent frame (events.py:36-38): type 'ping', empty data."""
    return F.lit("event: ping" + CRLF + "data: " + CRLF + CRLF)


def logout_frame() -> Column:
    """LogoutEvent frame (events.py:53-55)."""
    return F.lit('event: logout' + CRLF + 'data: {"reason": "expire"}' + CRLF + CRLF)
