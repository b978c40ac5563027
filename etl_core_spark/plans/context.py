"""Context / credential management.

Parity with the reference's contexts
(``src/etl_core/components/base_component.py:237-251`` and
``components/databases/database.py:57-73``): a component declares a
``context_id``; the environment binds it to concrete connection
parameters and secrets at run time, so job configs stay
environment-free and secret-free.

Resolution order for ``context_id`` "prod_pg":
1. a context file (JSON, path from ``ETL_CONTEXTS_FILE``) —
   ``{"prod_pg": {"url": ..., "user": ...,
   "password_env": "PROD_PG_PASSWORD"}}``; any ``*_env`` key pulls
   the actual secret from that environment variable (secrets never
   sit in the file);
2. runtime contexts registered via the HTTP API / ``JobStore``
   (reference ``api/routers/contexts.py`` CRUD), same ``*_env``
   secret indirection;
3. flat environment variables ``ETL_CTX_PROD_PG_URL`` etc.

Sources with a ``context_id`` get the resolved keys merged into
their config (explicit config keys win).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any


class ContextError(KeyError):
    pass


#: contexts registered at run time (HTTP API / JobStore); process-local
_RUNTIME_CONTEXTS: dict[str, dict[str, Any]] = {}

_SECRET_MARKERS = ("password", "secret", "token", "api_key", "passphrase")


def register_runtime_context(context_id: str, mapping: dict[str, Any]) -> None:
    _RUNTIME_CONTEXTS[context_id] = dict(mapping)


def unregister_runtime_context(context_id: str) -> None:
    _RUNTIME_CONTEXTS.pop(context_id, None)


def mask_secret_keys(mapping: dict[str, Any]) -> dict[str, Any]:
    """Redact literal secret values for API responses; ``*_env``
    indirections are names, not secrets, and stay visible."""
    out: dict[str, Any] = {}
    for key, value in mapping.items():
        if not key.endswith("_env") and any(m in key.lower() for m in _SECRET_MARKERS):
            out[key] = "***"
        else:
            out[key] = value
    return out


def _resolve_env_indirections(context_id: str, raw: dict[str, Any]) -> dict[str, Any]:
    resolved: dict[str, Any] = {}
    for key, value in raw.items():
        if key.endswith("_env"):
            env_name = str(value)
            if env_name not in os.environ:
                raise ContextError(
                    f"context {context_id!r}: secret env var "
                    f"{env_name!r} is not set"
                )
            resolved[key[: -len("_env")]] = os.environ[env_name]
        else:
            resolved[key] = value
    return resolved


def resolve_context(context_id: str, contexts_file: str | None = None) -> dict[str, Any]:
    path = contexts_file or os.environ.get("ETL_CONTEXTS_FILE")
    if path and Path(path).exists():
        contexts = json.loads(Path(path).read_text())
        if context_id in contexts:
            return _resolve_env_indirections(context_id, contexts[context_id])

    if context_id in _RUNTIME_CONTEXTS:
        return _resolve_env_indirections(context_id, _RUNTIME_CONTEXTS[context_id])

    prefix = f"ETL_CTX_{context_id.upper()}_"
    env_keys = {
        k[len(prefix):].lower(): v
        for k, v in os.environ.items()
        if k.startswith(prefix)
    }
    if env_keys:
        return env_keys
    raise ContextError(
        f"context {context_id!r} not found (no contexts file entry, "
        f"no {prefix}* environment variables)"
    )


def apply_context(config: dict[str, Any]) -> dict[str, Any]:
    """Merge resolved context keys into a component config (explicit
    keys win). No-op without a ``context_id``."""
    context_id = config.get("context_id")
    if not context_id:
        return config
    resolved = resolve_context(str(context_id))
    merged = dict(resolved)
    merged.update({k: v for k, v in config.items() if k != "context_id"})
    return merged
