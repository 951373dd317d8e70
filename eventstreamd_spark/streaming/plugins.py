"""Auth plugin loading — the reference's plugin contract, file-based.

Reference (/root/reference/evtstrd/plugins/__init__.py:7-14 +
plugins/README.md:12-36): a module named ``auth`` exposing

    async def check_auth(route, headers, **kwargs) -> Mapping

with ``status`` in {"ok", "unauthorized", "forbidden"};
``authenticate`` (the WWW-Authenticate header) required when
unauthorized; optional ``expire`` datetime when ok.  An absent plugin
means allow-all (auth.py:14-16); an unknown status or a missing
``authenticate`` is a plugin error (auth.py:24-36).

Here the plugin is a plain Python file referenced from the INI config
(``AuthPlugin`` key) instead of a fixed package directory — same
contract, explicit location.  ``load_auth_plugin`` adapts it to the
front-end's AuthHook: ok -> (expire, data); unauthorized -> 401 with
the WWW-Authenticate header; forbidden -> 403.
"""

from __future__ import annotations

import datetime
import importlib.util
import os
from typing import Any

from eventstreamd_spark.streaming.http_frontend import AuthError, AuthHook


class PluginError(Exception):
    """Mirror of the reference's PluginError (exc.py)."""

    def __init__(self, plugin: str, message: str) -> None:
        super().__init__(f"plugin '{plugin}': {message}")


def _route_name(path: str) -> str:
    # the reference passes "events"/"stats", not the URL path
    return path.lstrip("/") or path


def load_auth_plugin(path: str | None) -> AuthHook | None:
    """Load ``check_auth`` from a plugin file; None path/file => None
    (allow-all, the reference's absent-plugin behavior)."""
    if not path or not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("evtstrd_auth_plugin", path)
    if spec is None or spec.loader is None:
        raise PluginError("auth", f"cannot load {path}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if not hasattr(module, "check_auth"):
        raise PluginError("auth", "object 'check_auth' not found")
    check_auth = module.check_auth

    async def hook(
        http_path: str, headers: dict[str, str], **kwargs: Any
    ) -> tuple[datetime.datetime | None, Any]:
        response = await check_auth(_route_name(http_path), headers, **kwargs)
        status = response["status"]
        if status == "ok":
            return response.get("expire"), response.get("data")
        if status == "unauthorized":
            authenticate = response.get("authenticate")
            if authenticate is None:
                raise PluginError(
                    "auth", "'authenticate' field missing from response"
                )
            raise AuthError(
                "401 Unauthorized",
                headers=[("WWW-Authenticate", authenticate)],
            )
        if status == "forbidden":
            raise AuthError("403 Forbidden")
        raise PluginError("auth", f"unsupported response status '{status}'")

    return hook
