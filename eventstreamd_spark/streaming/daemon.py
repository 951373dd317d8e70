"""The full daemon: every reference entry point in one process, with
Spark as the execution engine.

Reference lifecycle (/root/reference/evtstrd/server.py:14-29, main.py:10-20):
one asyncio loop hosting the Unix-socket ingest server and the HTTP/SSE
listener server, wired through an in-process dispatcher.  Here the same
two front-ends run on one asyncio loop, but the dataflow between them is
a Structured Streaming query:

    unix socket -> spool files -> jsonlines source -> validate_envelope
      -> foreachBatch(registry.push_batch) -> per-connection SSE queues

EP1 (ingest) = socket_spool.run_socket_server; EP2 (subscribe) and
EP3 (/stats) = http_frontend.run_http_server; the Spark query replaces
the dispatcher's per-event Python loop with vectorized micro-batches.

Delivery semantics: checkpointed source offsets give at-least-once into
the registry (an upgrade over the reference's at-most-once); a listener
that connects mid-stream starts at the next micro-batch, mirroring the
reference's "whoever is subscribed now" routing (dispatcher.py:93-95) —
unless it reconnects with ``Last-Event-ID``, in which case the missed
gap is replayed from the durable spool first (pipeline.make_replay_fn;
the reference emits ids but never reads the header).
"""

from __future__ import annotations

import asyncio
import logging
import os

from pyspark.sql import SparkSession

from eventstreamd_spark.streaming import pipeline
from eventstreamd_spark.streaming.http_frontend import (
    AuthHook,
    ListenerRegistry,
    run_http_server,
)
from eventstreamd_spark.streaming.socket_spool import run_socket_server

logger = logging.getLogger(__name__)


async def run_daemon(
    spark: SparkSession,
    socket_path: str,
    work_dir: str,
    host: str = "127.0.0.1",
    port: int = 8888,
    trigger_seconds: int | None = None,
    auth: AuthHook | None = None,
    stop_event: asyncio.Event | None = None,
    ping_interval: float | None = None,
    cert_file: str | None = None,
    key_file: str | None = None,
    socket_mode: int = 0o600,
    socket_owner: str | None = None,
    socket_group: str | None = None,
    push_mode: str = "driver",
) -> None:
    """Run ingest + Spark pipeline + SSE front-end until ``stop_event``.

    ``work_dir`` holds the spool and the streaming checkpoint (the two
    pieces of durable state; on a cluster both live on shared storage).

    ``push_mode`` picks the SSE fan-out tier ([Spark] PushMode in the
    INI): "driver" collects matched frames through the in-process
    registry (reference-faithful, right below ~10^4 frames/batch);
    "distributed" starts the frame-ingest listener tier and routes
    every frame executor-side through DistributedPusher — the plan per
    micro-batch never funnels frames through the driver.
    """
    from eventstreamd_spark.streaming.config import PING_INTERVAL

    spool_dir = os.path.join(work_dir, "spool")
    checkpoint = os.path.join(work_dir, "checkpoint")
    os.makedirs(spool_dir, exist_ok=True)

    loop = asyncio.get_running_loop()
    registry = ListenerRegistry(
        loop=loop, replay_fn=pipeline.make_replay_fn(spark, spool_dir)
    )

    socket_server = await run_socket_server(
        socket_path,
        spool_dir,
        socket_mode=socket_mode,
        socket_owner=socket_owner,
        socket_group=socket_group,
    )
    http_server = await run_http_server(
        host,
        port,
        registry,
        ping_interval=ping_interval or PING_INTERVAL,
        auth=auth,
        cert_file=cert_file,
        key_file=key_file,
    )
    ingest_server = None
    if push_mode == "distributed":
        from eventstreamd_spark.streaming.http_frontend import (
            DistributedPusher,
            run_frame_ingest,
        )

        ingest_server = await run_frame_ingest(host, 0, registry)
        ingest_port = ingest_server.sockets[0].getsockname()[1]
        sink = DistributedPusher(registry, host, ingest_port).push_batch
    elif push_mode == "driver":
        sink = registry.push_batch
    else:
        raise ValueError(f"unknown push_mode {push_mode!r}")
    query = pipeline.start_envelope_pipeline(
        spark,
        spool_dir,
        sink,
        checkpoint,
        trigger_seconds=trigger_seconds or 1,
    )
    logger.info(
        "daemon up: socket=%s http=%s:%s push=%s",
        socket_path, host, port, push_mode,
    )
    try:
        await (stop_event or asyncio.Event()).wait()
    finally:
        query.stop()
        socket_server.close()
        http_server.close()
        if ingest_server is not None:
            ingest_server.close()
            await ingest_server.wait_closed()
        await socket_server.wait_closed()
        await http_server.wait_closed()


def main() -> None:  # pragma: no cover - thin CLI shim
    import argparse

    from eventstreamd_spark.session import get_spark
    from eventstreamd_spark.streaming.config import (
        read_config,
        read_default_config,
    )

    ap = argparse.ArgumentParser(description="eventstreamd-on-Spark daemon")
    ap.add_argument("-c", "--config", help="INI config (reference format)")
    ap.add_argument("--socket", help="unix socket path (overrides config)")
    ap.add_argument("--work-dir", help="spool + checkpoint dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, help="HTTP port (overrides config)")
    ap.add_argument(
        "-d", "--debug", action="store_true", help="enable debug mode"
    )  # reference cmdargs.py:16
    args = ap.parse_args()
    cfg = read_config(args.config) if args.config else read_default_config()
    cfg.debug = args.debug
    # reference main.py:10-14: debug gates log level + asyncio logger
    logging.basicConfig(
        level=logging.DEBUG if cfg.debug else logging.INFO
    )
    logging.getLogger("asyncio").disabled = not cfg.debug
    from eventstreamd_spark.streaming.plugins import load_auth_plugin

    spark = get_spark("eventstreamd-spark-daemon")
    asyncio.run(
        run_daemon(
            spark,
            args.socket or cfg.socket_file,
            args.work_dir or cfg.work_dir,
            args.host,
            args.port or cfg.http_port,
            trigger_seconds=cfg.trigger_seconds,
            auth=load_auth_plugin(cfg.auth_plugin_file),
            ping_interval=cfg.ping_interval,
            cert_file=cfg.cert_file or None,
            key_file=cfg.key_file or None,
            socket_mode=cfg.socket_mode,
            socket_owner=cfg.socket_owner or None,
            socket_group=cfg.socket_group or None,
            push_mode=cfg.push_mode,
        )
    )


if __name__ == "__main__":
    main()
