"""Schedule triggers: interval / cron / date.

Parity with the reference scheduler's trigger types
(``src/etl_core/scheduling/scheduler_service.py:12-14`` — APScheduler
IntervalTrigger / CronTrigger / DateTrigger). APScheduler is not in
this container, so the next-fire computation is stdlib: interval is
arithmetic, cron is a 5-field matcher (minute hour dom month dow,
supporting ``*``, ``*/n``, ``a-b``, ``a-b/n`` and comma lists, with
the vixie-cron dom-OR-dow rule), date fires once.

The daemon loop stays external (``JobStore.run_due`` called by
cron/systemd/Airflow on a real deployment) — these functions only
answer "when is this schedule next due after t".
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Optional

TRIGGER_TYPES = ("interval", "cron", "date")


class TriggerError(ValueError):
    pass


def _parse_field(field: str, lo: int, hi: int) -> set[int]:
    values: set[int] = set()
    for part in field.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            try:
                step = int(step_s)
            except ValueError:
                raise TriggerError(f"bad cron step {step_s!r}")
            if step <= 0:
                raise TriggerError(f"bad cron step {step}")
        if part in ("*", ""):
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(part)
        if lo_p < lo or hi_p > hi + (1 if hi == 6 else 0) or lo_p > hi_p:
            raise TriggerError(f"cron field value out of range: {part!r}")
        for v in range(lo_p, hi_p + 1, step):
            values.add(v % 7 if hi == 6 else v)  # dow: 7 ≡ 0 (Sunday)
    return values


def parse_cron(expression: str) -> dict[str, set[int]]:
    fields = expression.split()
    if len(fields) != 5:
        raise TriggerError(
            f"cron expression needs 5 fields (minute hour dom month dow), got {expression!r}"
        )
    minute, hour, dom, month, dow = fields
    return {
        "minute": _parse_field(minute, 0, 59),
        "hour": _parse_field(hour, 0, 23),
        "dom": _parse_field(dom, 1, 31),
        "month": _parse_field(month, 1, 12),
        "dow": _parse_field(dow, 0, 6),
        # vixie rule: when BOTH dom and dow are restricted, either matches
        "dom_restricted": {1} if dom.split("/")[0] not in ("*", "") else set(),
        "dow_restricted": {1} if dow.split("/")[0] not in ("*", "") else set(),
    }


def _day_matches(spec: dict[str, set[int]], d: _dt.date) -> bool:
    if d.month not in spec["month"]:
        return False
    dom_ok = d.day in spec["dom"]
    dow_ok = (d.isoweekday() % 7) in spec["dow"]  # Sunday = 0
    if spec["dom_restricted"] and spec["dow_restricted"]:
        return dom_ok or dow_ok
    return dom_ok and dow_ok


def cron_next(expression: str, after: float) -> float:
    """First fire time strictly after ``after`` (epoch seconds, UTC)."""
    spec = parse_cron(expression)
    t = _dt.datetime.fromtimestamp(after, tz=_dt.timezone.utc).replace(
        second=0, microsecond=0
    ) + _dt.timedelta(minutes=1)
    # scan days (fast-skip non-matching), then hours/minutes within
    for _ in range(366 * 5):  # every valid cron fires within 5 years
        if _day_matches(spec, t.date()):
            for hour in sorted(spec["hour"]):
                if hour < t.hour:
                    continue
                for minute in sorted(spec["minute"]):
                    if hour == t.hour and minute < t.minute:
                        continue
                    return t.replace(hour=hour, minute=minute).timestamp()
        t = (t + _dt.timedelta(days=1)).replace(hour=0, minute=0)
    raise TriggerError(f"cron expression {expression!r} never fires")


def _parse_when(value: Any) -> float:
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        return _dt.datetime.fromisoformat(value.replace("Z", "+00:00")).timestamp()
    raise TriggerError(f"bad date trigger run_at: {value!r}")


def validate_trigger(trigger_type: str, trigger_args: dict[str, Any]) -> None:
    if trigger_type not in TRIGGER_TYPES:
        raise TriggerError(
            f"unknown trigger_type {trigger_type!r}; known: {TRIGGER_TYPES}"
        )
    if trigger_type == "interval":
        try:
            seconds = float(trigger_args["seconds"])
        except (KeyError, TypeError, ValueError):
            raise TriggerError("interval trigger requires numeric 'seconds'")
        if seconds <= 0:
            raise TriggerError("interval 'seconds' must be positive")
    elif trigger_type == "cron":
        expr = trigger_args.get("expression")
        if not expr:
            raise TriggerError("cron trigger requires 'expression'")
        parse_cron(str(expr))
    else:
        if "run_at" not in trigger_args:
            raise TriggerError("date trigger requires 'run_at'")
        _parse_when(trigger_args["run_at"])


def first_due(trigger_type: str, trigger_args: dict[str, Any], now: float) -> float:
    """Next-due at creation time. Interval schedules are due
    immediately (first run on the next ``run_due`` sweep)."""
    validate_trigger(trigger_type, trigger_args)
    if trigger_type == "interval":
        return now
    if trigger_type == "cron":
        return cron_next(str(trigger_args["expression"]), now)
    return _parse_when(trigger_args["run_at"])


def next_due_after_run(
    trigger_type: str, trigger_args: dict[str, Any], now: float
) -> Optional[float]:
    """Next-due after a firing; None = one-shot exhausted (disable)."""
    if trigger_type == "interval":
        return now + float(trigger_args["seconds"])
    if trigger_type == "cron":
        return cron_next(str(trigger_args["expression"]), now)
    return None
