"""eventstreamd_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of srittau/eventstreamd, rebuilt
Spark-first.

The reference (/root/reference, srittau/eventstreamd) is a single-process
asyncio pub/sub daemon: JSON events in over a Unix socket, routed by
``subsystem``, filtered per listener by a comparison mini-language, and
written out as Server-Sent Events.  This package re-expresses that whole
surface — plus the large-scale analytics layer the reference lacks — as
declarative DataFrame / Structured Streaming programs so Catalyst and
Tungsten handle optimization and execution.

Layout:
    functions/   scalar Column combinators (dates, JSON paths, SSE frames,
                 vector math, text metrics)
    operators/   DataFrame -> DataFrame operators (filter DSL, envelope,
                 routing, stats, relational, dedup, similarity, text,
                 as-of join, multimodal)
    sources/     custom PySpark DataSource implementations (JSON-lines)
    streaming/   Structured Streaming wrappers (SSE sink, watermark dedup,
                 windowed aggregation, listener pipeline)
    plans/       plan-inspection helpers (explain audits)
"""

from eventstreamd_spark.session import (
    TABLES,
    get_spark,
    load_table,
    register_views,
    sql,
)

__all__ = ["get_spark", "load_table", "register_views", "sql", "TABLES"]

__version__ = "0.1.0"
