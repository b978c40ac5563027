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
2. flat environment variables ``ETL_CTX_PROD_PG_URL`` etc.

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


def resolve_context(context_id: str, contexts_file: str | None = None) -> dict[str, Any]:
    path = contexts_file or os.environ.get("ETL_CONTEXTS_FILE")
    if path and Path(path).exists():
        contexts = json.loads(Path(path).read_text())
        if context_id in contexts:
            raw = contexts[context_id]
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
