"""End-to-end daemon test: Unix-socket producer -> spool -> Spark
streaming pipeline -> SSE listener over real HTTP, plus /stats and the
auth gate — the reference's EP1/EP2/EP3 in one scenario."""

from __future__ import annotations

import asyncio
import datetime
import json

import pytest

from eventstreamd_spark.streaming.daemon import run_daemon
from eventstreamd_spark.streaming.http_frontend import AuthError

PORT = 18901


def _msg(subsystem: str, k: int, id: str) -> str:
    return json.dumps(
        {
            "action": "notify",
            "subsystem": subsystem,
            "event": "add",
            "data": {"k": k},
            "id": id,
        }
    )


async def _read_headers(reader: asyncio.StreamReader) -> str:
    head = b""
    while b"\r\n\r\n" not in head:
        head += await asyncio.wait_for(reader.read(256), 10)
    return head.decode()


async def _read_until(reader: asyncio.StreamReader, needle: str, timeout: float = 90) -> str:
    buf = ""
    deadline = asyncio.get_event_loop().time() + timeout
    while needle not in buf:
        left = deadline - asyncio.get_event_loop().time()
        if left <= 0:
            raise AssertionError(f"timed out waiting for {needle!r}; got {buf!r}")
        chunk = await asyncio.wait_for(reader.read(4096), left)
        if not chunk:
            raise AssertionError(f"EOF before {needle!r}; got {buf!r}")
        buf += chunk.decode()
    return buf


import pytest


@pytest.mark.parametrize("push_mode", ["driver", "distributed"])
def test_daemon_end_to_end(spark, tmp_path, push_mode) -> None:
    """Full contract in BOTH fan-out tiers: [Spark] PushMode = driver
    (in-process push_batch) and distributed (executor-side
    DistributedPusher through the frame-ingest tier)."""
    sock = str(tmp_path / "evtd.sock")

    async def auth(path: str, headers: dict[str, str]) -> tuple[datetime.datetime | None, None]:
        if headers.get("x-token") == "deny":
            raise AuthError("403 Forbidden")
        return None, None

    async def scenario() -> None:
        stop = asyncio.Event()
        daemon = asyncio.create_task(
            run_daemon(
                spark,
                sock,
                str(tmp_path / "work"),
                port=PORT,
                trigger_seconds=1,
                auth=auth,
                stop_event=stop,
                push_mode=push_mode,
            )
        )
        for _ in range(100):  # wait for the socket server to come up
            if daemon.done():
                daemon.result()
            try:
                r, w = await asyncio.open_unix_connection(sock)
                break
            except (FileNotFoundError, ConnectionRefusedError):
                await asyncio.sleep(0.1)
        else:
            raise AssertionError("socket server never came up")

        # O12: denied client is rejected before any routing
        dr, dw = await asyncio.open_connection("127.0.0.1", PORT)
        dw.write(
            b"GET /events?subsystem=orders HTTP/1.1\r\nx-token: deny\r\n\r\n"
        )
        await dw.drain()
        assert "403 Forbidden" in await _read_headers(dr)
        dw.close()

        # EP2: subscribe with a filter (registered before events flow)
        lr, lw = await asyncio.open_connection("127.0.0.1", PORT)
        lw.write(
            f"GET /events?subsystem=orders&filter=k>=50 HTTP/1.1\r\n\r\n".encode()
        )
        await lw.drain()
        head = await _read_headers(lr)
        assert "200 OK" in head and "text/event-stream" in head
        assert "Keep-Alive: timeout=5, max=100" in head

        # EP1: produce over the unix socket — k=60 matches, k=10 filtered,
        # other-subsystem and garbage lines dropped
        w.write(
            (
                _msg("orders", 60, "e1") + "\n"
                + _msg("orders", 10, "e2") + "\n"
                + _msg("other", 99, "e3") + "\n"
                + "garbage\n"
            ).encode()
        )
        await w.drain()

        got = await _read_until(lr, "id: e1")
        assert '"k":60' in got.replace(" ", "")
        assert "id: e2" not in got and "id: e3" not in got

        # EP3: /stats sees the live listener
        sr, sw = await asyncio.open_connection("127.0.0.1", PORT)
        sw.write(b"GET /stats HTTP/1.1\r\n\r\n")
        await sw.drain()
        body = await _read_until(sr, "}")
        stats = json.loads(body.split("\r\n\r\n", 1)[1])
        assert stats["total-connections"] >= 1
        assert any(
            c["subsystem"] == "orders" and c["filters"] == ["k>=50"]
            for c in stats["connections"]
        )
        sw.close()
        lw.close()
        w.close()
        stop.set()
        await asyncio.wait_for(daemon, 60)

    asyncio.run(scenario())


def test_expiry_logout(spark, tmp_path) -> None:
    """O9: an auth-supplied expire time emits a logout event and closes."""
    sock = str(tmp_path / "evtd.sock")

    async def auth(path, headers):
        return (
            datetime.datetime.now() + datetime.timedelta(seconds=2),
            None,
        )

    async def scenario() -> None:
        stop = asyncio.Event()
        daemon = asyncio.create_task(
            run_daemon(
                spark,
                sock,
                str(tmp_path / "work"),
                port=PORT + 1,
                trigger_seconds=1,
                auth=auth,
                stop_event=stop,
            )
        )
        for _ in range(100):
            if daemon.done():
                daemon.result()
            try:
                lr, lw = await asyncio.open_connection("127.0.0.1", PORT + 1)
                break
            except ConnectionRefusedError:
                await asyncio.sleep(0.1)
        lw.write(b"GET /events?subsystem=s HTTP/1.1\r\n\r\n")
        await lw.drain()
        got = await _read_until(lr, "event: logout", timeout=30)
        assert '"reason": "expire"' in got
        lw.close()
        stop.set()
        await asyncio.wait_for(daemon, 60)

    asyncio.run(scenario())


def test_distributed_push_executor_side(spark) -> None:
    """The cluster-scale fan-out path: frames travel task -> frame-ingest
    socket -> connection queues, never through a driver collect()."""
    from eventstreamd_spark.streaming.http_frontend import (
        Connection,
        DistributedPusher,
        ListenerRegistry,
        run_frame_ingest,
    )

    batch = spark.createDataFrame(
        [
            ("orders", "add", '{"k": 60}', "e1"),   # matches k>=50
            ("orders", "add", '{"k": 10}', "e2"),   # filtered out
            ("other", "add", '{"k": 99}', "e3"),    # wrong subsystem
        ],
        "subsystem string, event_type string, data string, id string",
    )

    async def scenario() -> None:
        loop = asyncio.get_running_loop()
        registry = ListenerRegistry(loop=loop)
        server = await run_frame_ingest("127.0.0.1", 0, registry)
        port = server.sockets[0].getsockname()[1]

        match = Connection("orders", ("k>=50",), asyncio.Queue())
        loose = Connection("orders", (), asyncio.Queue())
        registry.add(match)
        registry.add(loose)

        pusher = DistributedPusher(registry, "127.0.0.1", port)
        # the Spark action blocks; keep the loop free to serve ingest
        await loop.run_in_executor(None, pusher.push_batch, batch, 0)

        frame = await asyncio.wait_for(match.queue.get(), 10)
        assert "id: e1" in frame and '"k": 60' in frame
        assert match.queue.empty()  # e2/e3 never delivered to the filtered sub

        got = set()
        for _ in range(2):  # unfiltered orders sub sees e1 AND e2, not e3
            got.add(await asyncio.wait_for(loose.queue.get(), 10))
        assert any("id: e1" in f for f in got) and any("id: e2" in f for f in got)
        assert not any("id: e3" in f for f in got)

        server.close()
        await server.wait_closed()

    asyncio.run(scenario())


def test_stale_socket_removed_live_socket_refused(tmp_path) -> None:
    """Reference socket_server.py:44-53: a dead socket file is cleaned
    up and bind proceeds; a live one raises ServerAlreadyRunningError.
    Also checks the configured mode lands on the socket file."""
    import os
    import stat

    from eventstreamd_spark.streaming.socket_spool import (
        ServerAlreadyRunningError,
        run_socket_server,
    )

    sock = str(tmp_path / "evt.sock")
    spool = str(tmp_path / "spool")

    async def scenario() -> None:
        # stale file (not a live server) -> removed, bind succeeds
        open(sock, "w").close()
        s1 = await run_socket_server(sock, spool, socket_mode=0o640)
        assert stat.S_IMODE(os.stat(sock).st_mode) == 0o640
        # live server on the path -> second instance refuses to start
        try:
            await run_socket_server(sock, spool)
            raise AssertionError("expected ServerAlreadyRunningError")
        except ServerAlreadyRunningError:
            pass
        s1.close()
        await s1.wait_closed()

    asyncio.run(scenario())


def test_stats_referer_field() -> None:
    """/stats mirrors the reference's NotRequired referer (stats.py:23)."""
    from eventstreamd_spark.streaming.http_frontend import (
        Connection,
        ListenerRegistry,
    )

    reg = ListenerRegistry()
    reg.add(Connection("orders", (), asyncio.Queue(), referer="http://ui/"))
    reg.add(Connection("orders", (), asyncio.Queue()))
    conns = reg.stats_json()["connections"]
    assert conns[0]["referer"] == "http://ui/"
    assert "referer" not in conns[1]  # absent, not null, when unset


def test_config_parsing(tmp_path) -> None:
    """INI config: same keys/fallbacks as the reference (config.py:31-54)."""
    from eventstreamd_spark.streaming.config import Config, read_config

    ini = tmp_path / "evt.conf"
    ini.write_text(
        "[General]\n"
        "SocketFile = /tmp/custom.sock\n"
        "SocketMode = 0644\n"
        "HTTPPort = 9999\n"
        "SSLCertificateFile = /tmp/cert.pem\n"
        "SSLKeyFile = /tmp/key.pem\n"
        "[Spark]\n"
        "WorkDir = /tmp/wd\n"
        "TriggerSeconds = 5\n"
    )
    cfg = read_config(str(ini))
    assert cfg.socket_file == "/tmp/custom.sock"
    assert cfg.socket_mode == 0o644
    assert cfg.http_port == 9999
    assert cfg.with_ssl
    assert cfg.work_dir == "/tmp/wd" and cfg.trigger_seconds == 5
    # defaults when keys absent
    ini2 = tmp_path / "empty.conf"
    ini2.write_text("[General]\n")
    cfg2 = read_config(str(ini2))
    assert cfg2.socket_file == Config().socket_file
    assert cfg2.http_port == 8888 and not cfg2.with_ssl
    assert cfg2.push_mode == "driver"  # default fan-out tier
    # [Spark] PushMode selects the fan-out tier; junk is rejected
    ini3 = tmp_path / "push.conf"
    ini3.write_text("[Spark]\nPushMode = distributed\n")
    assert read_config(str(ini3)).push_mode == "distributed"
    ini4 = tmp_path / "bad.conf"
    ini4.write_text("[Spark]\nPushMode = sideways\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PushMode"):
        read_config(str(ini4))


def test_last_event_id_replay(spark, tmp_path) -> None:
    """Reconnect with Last-Event-ID replays the missed gap from the
    spool, with the subscription's filters applied — the SSE feature
    the reference emits ids for but never implements."""
    sock = str(tmp_path / "evtd.sock")

    async def scenario() -> None:
        stop = asyncio.Event()
        daemon = asyncio.create_task(
            run_daemon(
                spark,
                sock,
                str(tmp_path / "work"),
                port=PORT + 2,
                trigger_seconds=1,
                stop_event=stop,
            )
        )
        for _ in range(100):
            if daemon.done():
                daemon.result()
            try:
                r, w = await asyncio.open_unix_connection(sock)
                break
            except (FileNotFoundError, ConnectionRefusedError):
                await asyncio.sleep(0.1)
        else:
            raise AssertionError("socket server never came up")

        # first subscription sees e1 live
        lr, lw = await asyncio.open_connection("127.0.0.1", PORT + 2)
        lw.write(b"GET /events?subsystem=orders&filter=k>=50 HTTP/1.1\r\n\r\n")
        await lw.drain()
        await _read_headers(lr)
        w.write((_msg("orders", 60, "e1") + "\n").encode())
        await w.drain()
        await _read_until(lr, "id: e1")
        lw.close()  # client drops; events keep flowing

        w.write(
            (
                _msg("orders", 70, "e2") + "\n"   # missed, matches filter
                + _msg("orders", 10, "e3") + "\n"  # missed, filtered out
                + _msg("other", 80, "e4") + "\n"   # missed, other subsystem
            ).encode()
        )
        await w.drain()
        await asyncio.sleep(2)  # let the spool land

        # reconnect with Last-Event-ID: e1 -> replay must deliver e2
        # only (filter + subsystem applied), never e1/e3/e4
        rr, rw = await asyncio.open_connection("127.0.0.1", PORT + 2)
        rw.write(
            b"GET /events?subsystem=orders&filter=k>=50 HTTP/1.1\r\n"
            b"Last-Event-ID: e1\r\n\r\n"
        )
        await rw.drain()
        await _read_headers(rr)
        got = await _read_until(rr, "id: e2")
        assert "id: e1" not in got and "id: e3" not in got and "id: e4" not in got
        assert '"k":70' in got.replace(" ", "")
        rw.close()
        w.close()
        stop.set()
        await asyncio.wait_for(daemon, 60)

    asyncio.run(scenario())


def test_auth_plugin_contract(spark, tmp_path) -> None:
    """A file-loaded plugin speaking the reference's check_auth contract
    (plugins/README.md): unauthorized => 401 + WWW-Authenticate header;
    ok => stream proceeds; plugin sees route name + subsystem kwarg."""
    plugin = tmp_path / "auth_plugin.py"
    plugin.write_text(
        "seen = []\n"
        "async def check_auth(route, headers, **kwargs):\n"
        "    seen.append((route, kwargs.get('subsystem')))\n"
        "    if headers.get('x-token') != 'good':\n"
        "        return {'status': 'unauthorized', 'authenticate': 'Bearer realm=\"evt\"'}\n"
        "    return {'status': 'ok'}\n"
    )
    from eventstreamd_spark.streaming.plugins import load_auth_plugin

    auth = load_auth_plugin(str(plugin))
    assert auth is not None
    assert load_auth_plugin(str(tmp_path / "missing.py")) is None  # allow-all

    sock = str(tmp_path / "evtd.sock")

    async def scenario() -> None:
        stop = asyncio.Event()
        daemon = asyncio.create_task(
            run_daemon(
                spark, sock, str(tmp_path / "work"),
                port=PORT + 3, trigger_seconds=1, auth=auth, stop_event=stop,
            )
        )
        for _ in range(100):
            if daemon.done():
                daemon.result()
            try:
                r, w = await asyncio.open_unix_connection(sock)
                break
            except (FileNotFoundError, ConnectionRefusedError):
                await asyncio.sleep(0.1)
        else:
            raise AssertionError("socket server never came up")

        dr, dw = await asyncio.open_connection("127.0.0.1", PORT + 3)
        dw.write(b"GET /events?subsystem=orders HTTP/1.1\r\n\r\n")
        await dw.drain()
        head = await _read_headers(dr)
        assert "401 Unauthorized" in head
        assert 'WWW-Authenticate: Bearer realm="evt"' in head
        dw.close()

        lr, lw = await asyncio.open_connection("127.0.0.1", PORT + 3)
        lw.write(
            b"GET /events?subsystem=orders HTTP/1.1\r\nx-token: good\r\n\r\n"
        )
        await lw.drain()
        head = await _read_headers(lr)
        assert "200 OK" in head and "text/event-stream" in head
        w.write((_msg("orders", 99, "p1") + "\n").encode())
        await w.drain()
        await _read_until(lr, "id: p1")
        lw.close()
        w.close()
        stop.set()
        await asyncio.wait_for(daemon, 60)

    asyncio.run(scenario())
