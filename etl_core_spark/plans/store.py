"""Job persistence + execution records.

Parity with the reference's persistence layer
(``src/etl_core/persistence/db.py``, ``table_definitions.py``,
``handlers/job_handler.py:95-137``): job configs stored by id and
rebuilt into runnable jobs; execution + attempt records written after
each run. SQLModel/SQLite there; stdlib sqlite3 here — the store is
driver-side control-plane state, deliberately outside the data path.

Also covers the scheduler's storage (``scheduling/scheduler_service``):
schedules persist as (job_id, interval_seconds, next_due); `run_due`
executes everything due — the cron daemon loop stays external
(cron/systemd/Airflow on a real deployment).
"""

from __future__ import annotations

import dataclasses
import json
import sqlite3
import time
import uuid
from pathlib import Path
from typing import Any, Optional

from etl_core_spark.plans.config import JobConfig

_SCHEMA = """
CREATE TABLE IF NOT EXISTS jobs (
    job_id TEXT PRIMARY KEY,
    name TEXT NOT NULL,
    config_json TEXT NOT NULL,
    created_at REAL NOT NULL,
    updated_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS executions (
    execution_id TEXT PRIMARY KEY,
    job_id TEXT NOT NULL REFERENCES jobs(job_id),
    status TEXT NOT NULL,
    attempts INTEGER NOT NULL,
    wall_seconds REAL NOT NULL,
    metrics_json TEXT,
    error TEXT,
    started_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS schedules (
    schedule_id TEXT PRIMARY KEY,
    job_id TEXT NOT NULL REFERENCES jobs(job_id),
    interval_seconds REAL NOT NULL,
    next_due REAL NOT NULL,
    enabled INTEGER NOT NULL DEFAULT 1
);
"""


@dataclasses.dataclass
class ExecutionRecord:
    execution_id: str
    job_id: str
    status: str
    attempts: int
    wall_seconds: float
    metrics: dict[str, Any]
    error: Optional[str]
    started_at: float


class JobStore:
    def __init__(self, path: str | Path = "jobs.db"):
        self.path = str(path)
        # check_same_thread=False + a lock: the HTTP API serves from
        # handler threads while the store is created on the main one
        self._conn = sqlite3.connect(self.path, check_same_thread=False)
        self._lock = __import__("threading").RLock()
        self._conn.executescript(_SCHEMA)
        self._conn.commit()

    # -- jobs -----------------------------------------------------------

    def create_job(self, config: dict[str, Any] | JobConfig, job_id: str | None = None) -> str:
        if isinstance(config, JobConfig):
            raise TypeError("pass the raw config dict (JobConfig is not JSON-stable)")
        JobConfig.from_dict(config)  # validate before persisting
        job_id = job_id or uuid.uuid4().hex[:12]
        now = time.time()
        with self._lock:
            self._conn.execute(
                "INSERT INTO jobs VALUES (?, ?, ?, ?, ?)",
                (job_id, config.get("name", "job"), json.dumps(config), now, now),
            )
            self._conn.commit()
        return job_id

    def get_job(self, job_id: str) -> dict[str, Any]:
        row = self._conn.execute(
            "SELECT config_json FROM jobs WHERE job_id = ?", (job_id,)
        ).fetchone()
        if row is None:
            raise KeyError(f"unknown job_id {job_id!r}")
        return json.loads(row[0])

    def update_job(self, job_id: str, config: dict[str, Any]) -> None:
        JobConfig.from_dict(config)
        with self._lock:
            n = self._conn.execute(
                "UPDATE jobs SET config_json = ?, name = ?, updated_at = ? WHERE job_id = ?",
                (json.dumps(config), config.get("name", "job"), time.time(), job_id),
            ).rowcount
            if n == 0:
                raise KeyError(f"unknown job_id {job_id!r}")
            self._conn.commit()

    def delete_job(self, job_id: str) -> None:
        with self._lock:
            n = self._conn.execute(
                "DELETE FROM jobs WHERE job_id = ?", (job_id,)
            ).rowcount
            if n == 0:
                raise KeyError(f"unknown job_id {job_id!r}")
            self._conn.commit()

    def list_jobs(self) -> list[dict[str, Any]]:
        rows = self._conn.execute(
            "SELECT job_id, name, created_at, updated_at FROM jobs ORDER BY created_at"
        ).fetchall()
        return [
            {"job_id": r[0], "name": r[1], "created_at": r[2], "updated_at": r[3]}
            for r in rows
        ]

    # -- executions -----------------------------------------------------

    def start_execution(self, spark, job_id: str) -> ExecutionRecord:
        """Load → build → run → persist; the reference's
        POST /execution/{job_id} flow as one call."""
        from etl_core_spark.plans.builder import build_job
        from etl_core_spark.plans.runner import JobRunner

        config = self.get_job(job_id)
        started = time.time()
        builder = build_job(spark, config)
        result = JobRunner(builder).run()
        record = ExecutionRecord(
            execution_id=uuid.uuid4().hex[:12],
            job_id=job_id,
            status=result.status,
            attempts=result.attempts,
            wall_seconds=result.wall_seconds,
            metrics=result.metrics,
            error=result.error,
            started_at=started,
        )
        with self._lock:
            self._conn.execute(
                "INSERT INTO executions VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                (
                    record.execution_id, record.job_id, record.status, record.attempts,
                    record.wall_seconds, json.dumps(record.metrics), record.error,
                    record.started_at,
                ),
            )
            self._conn.commit()
        return record

    def list_executions(self, job_id: str | None = None) -> list[ExecutionRecord]:
        sql = "SELECT * FROM executions"
        args: tuple = ()
        if job_id:
            sql += " WHERE job_id = ?"
            args = (job_id,)
        rows = self._conn.execute(sql + " ORDER BY started_at", args).fetchall()
        return [
            ExecutionRecord(
                execution_id=r[0], job_id=r[1], status=r[2], attempts=r[3],
                wall_seconds=r[4], metrics=json.loads(r[5] or "{}"), error=r[6],
                started_at=r[7],
            )
            for r in rows
        ]

    # -- schedules ------------------------------------------------------

    def create_schedule(self, job_id: str, interval_seconds: float) -> str:
        self.get_job(job_id)  # existence check
        schedule_id = uuid.uuid4().hex[:12]
        with self._lock:
            self._conn.execute(
                "INSERT INTO schedules VALUES (?, ?, ?, ?, 1)",
                (schedule_id, job_id, interval_seconds, time.time()),
            )
            self._conn.commit()
        return schedule_id

    def run_due(self, spark, now: float | None = None) -> list[ExecutionRecord]:
        """Execute every enabled schedule whose next_due has passed,
        then advance next_due (fixed-rate, like the reference's
        30 s APScheduler sync loop)."""
        now = now if now is not None else time.time()
        due = self._conn.execute(
            "SELECT schedule_id, job_id, interval_seconds FROM schedules "
            "WHERE enabled = 1 AND next_due <= ?",
            (now,),
        ).fetchall()
        records = []
        for schedule_id, job_id, interval in due:
            records.append(self.start_execution(spark, job_id))
            self._conn.execute(
                "UPDATE schedules SET next_due = ? WHERE schedule_id = ?",
                (now + interval, schedule_id),
            )
        self._conn.commit()
        return records

    def close(self) -> None:
        self._conn.close()
