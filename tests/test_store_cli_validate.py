import json

import pytest

from etl_core_spark.cli import main as cli_main
from etl_core_spark.operators.base import get_operator
from etl_core_spark.operators.validate import ValidationError
from etl_core_spark.plans.store import JobStore


def make_job_config(tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n3,c\n")
    return {
        "name": "store_job",
        "components": [
            {
                "name": "read", "comp_type": "read_csv", "filepath": str(src),
                "routes": {"out": [{"to": "sink", "in_port": "in"}]},
            },
            {"name": "sink", "comp_type": "write_csv", "filepath": str(tmp_path / "out")},
        ],
    }


def test_job_store_crud_and_execution(spark, tmp_path):
    store = JobStore(tmp_path / "jobs.db")
    cfg = make_job_config(tmp_path)
    job_id = store.create_job(cfg)
    assert store.get_job(job_id)["name"] == "store_job"
    assert store.list_jobs()[0]["job_id"] == job_id

    record = store.start_execution(spark, job_id)
    assert record.status == "SUCCESS"
    assert record.metrics["sink"]["lines_received"] == 3
    assert store.list_executions(job_id)[0].execution_id == record.execution_id

    cfg["name"] = "renamed"
    store.update_job(job_id, cfg)
    assert store.get_job(job_id)["name"] == "renamed"
    store.delete_job(job_id)
    with pytest.raises(KeyError):
        store.get_job(job_id)


def test_job_store_rejects_invalid_config(tmp_path):
    store = JobStore(tmp_path / "jobs.db")
    with pytest.raises(Exception):
        store.create_job({"name": "bad", "components": [{"name": "x"}]})


def test_schedule_run_due(spark, tmp_path):
    store = JobStore(tmp_path / "jobs.db")
    job_id = store.create_job(make_job_config(tmp_path))
    store.create_schedule(job_id, interval_seconds=3600)
    records = store.run_due(spark)
    assert len(records) == 1 and records[0].status == "SUCCESS"
    # not due again until interval passes
    assert store.run_due(spark) == []
    # but due after the interval
    import time

    assert len(store.run_due(spark, now=time.time() + 3601)) == 1


def test_cron_trigger_next_fire():
    import datetime as dt

    from etl_core_spark.plans.triggers import TriggerError, cron_next, parse_cron

    base = dt.datetime(2026, 8, 13, 10, 30, 45, tzinfo=dt.timezone.utc).timestamp()

    def at(ts):
        return dt.datetime.fromtimestamp(ts, tz=dt.timezone.utc)

    # every 15 minutes: 10:30:45 → 10:45
    assert at(cron_next("*/15 * * * *", base)) == at(base).replace(
        minute=45, second=0, microsecond=0
    )
    # daily at 02:05 → next day
    n = at(cron_next("5 2 * * *", base))
    assert (n.day, n.hour, n.minute) == (14, 2, 5)
    # first of month at midnight
    n = at(cron_next("0 0 1 * *", base))
    assert (n.month, n.day, n.hour, n.minute) == (9, 1, 0, 0)
    # weekly: sunday (0) — 2026-08-13 is a Thursday → the 16th
    n = at(cron_next("0 12 * * 0", base))
    assert (n.day, n.isoweekday()) == (16, 7)
    with pytest.raises(TriggerError):
        parse_cron("* * *")
    with pytest.raises(TriggerError):
        parse_cron("61 * * * *")


def test_cron_next_fire_matches_brute_force():
    """Property check: the day-skipping scanner agrees with a dumb
    minute-by-minute walk for a spread of expressions and starts."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from etl_core_spark.plans.triggers import cron_next, parse_cron, _day_matches

    def brute(expr, after):
        spec = parse_cron(expr)
        t = dt.datetime.fromtimestamp(after, tz=dt.timezone.utc).replace(
            second=0, microsecond=0
        )
        for _ in range(60 * 24 * 400):
            t += dt.timedelta(minutes=1)
            if (
                _day_matches(spec, t.date())
                and t.hour in spec["hour"]
                and t.minute in spec["minute"]
            ):
                return t.timestamp()
        raise AssertionError("brute force found no fire in 400 days")

    exprs = st.sampled_from([
        "*/15 * * * *", "0 */6 * * *", "30 2 * * *", "5 4 1,15 * *",
        "0 0 * * 0", "0 12 13 * 5", "59 23 28-31 * *", "7 3-5 * 2,8 *",
    ])
    starts = st.integers(
        min_value=int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp()),
        max_value=int(dt.datetime(2026, 12, 31, tzinfo=dt.timezone.utc).timestamp()),
    )

    @settings(max_examples=40, deadline=None)
    @given(expr=exprs, after=starts)
    def check(expr, after):
        assert cron_next(expr, after) == brute(expr, after)

    check()


def test_schedule_cron_and_date_triggers(spark, tmp_path):
    import time

    store = JobStore(tmp_path / "jobs.db")
    job_id = store.create_job(make_job_config(tmp_path))

    sid = store.create_schedule(job_id, trigger_type="cron",
                                trigger_args={"expression": "*/5 * * * *"})
    sched = store.get_schedule(sid)
    assert sched["trigger_type"] == "cron" and sched["next_due"] > time.time()
    # cron fires once its minute arrives, then re-arms at the next slot
    assert len(store.run_due(spark, now=sched["next_due"])) == 1
    assert store.get_schedule(sid)["next_due"] > sched["next_due"]

    # date trigger: one-shot, disables itself after firing
    did = store.create_schedule(job_id, trigger_type="date",
                                trigger_args={"run_at": time.time() - 1})
    assert len(store.run_due(spark)) == 1
    after = store.get_schedule(did)
    assert after["enabled"] is False and after["next_due"] is None

    # pause/resume/run-now/delete
    store.pause_schedule(sid)
    assert store.run_due(spark, now=time.time() + 10 * 60) == []
    store.resume_schedule(sid)
    assert store.run_schedule_now(spark, sid).status == "SUCCESS"
    store.delete_schedule(sid)
    with pytest.raises(KeyError):
        store.get_schedule(sid)


def test_cli_end_to_end(spark, tmp_path, capsys):
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(make_job_config(tmp_path)))
    db = str(tmp_path / "cli.db")

    assert cli_main(["--db", db, "jobs", "create", str(cfg_path)]) == 0
    job_id = capsys.readouterr().out.strip()

    assert cli_main(["--db", db, "jobs", "list"]) == 0
    assert job_id in capsys.readouterr().out

    assert cli_main(["--db", db, "execution", "start", job_id]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "SUCCESS"

    assert cli_main(["--db", db, "jobs", "delete", job_id]) == 0
    capsys.readouterr()
    assert cli_main(["--db", db, "jobs", "get", job_id]) == 2


def test_cli_schedules_and_contexts(spark, tmp_path, capsys):
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(make_job_config(tmp_path)))
    db = str(tmp_path / "cli.db")

    cli_main(["--db", db, "jobs", "create", str(cfg_path)])
    job_id = capsys.readouterr().out.strip()

    assert cli_main(["--db", db, "schedule", "create", job_id, "--cron", "0 3 * * *"]) == 0
    sid = capsys.readouterr().out.strip()
    assert cli_main(["--db", db, "schedule", "list"]) == 0
    listed = json.loads(capsys.readouterr().out)
    assert listed[0]["schedule_id"] == sid and listed[0]["trigger_type"] == "cron"
    assert cli_main(["--db", db, "schedule", "pause", sid]) == 0
    assert json.loads(capsys.readouterr().out)["enabled"] is False
    assert cli_main(["--db", db, "schedule", "run-now", sid]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "SUCCESS"
    assert cli_main(["--db", db, "schedule", "delete", sid]) == 0
    capsys.readouterr()

    # literal secrets are rejected at create — *_env is the secret path
    assert cli_main([
        "--db", db, "contexts", "create", "cli_pg",
        json.dumps({"url": "jdbc:postgresql://h/db", "password": "hunter2"}),
    ]) == 2
    assert "password" in capsys.readouterr().err
    assert cli_main([
        "--db", db, "contexts", "create", "cli_pg",
        json.dumps({"url": "jdbc:postgresql://h/db", "password_env": "CLI_PG_PW"}),
    ]) == 0
    capsys.readouterr()
    assert cli_main(["--db", db, "contexts", "get", "cli_pg"]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got["password_env"] == "CLI_PG_PW" and got["url"].startswith("jdbc:")
    assert cli_main(["--db", db, "contexts", "delete", "cli_pg"]) == 0


def test_cli_run_direct(tmp_path, spark, capsys):
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(make_job_config(tmp_path)))
    assert cli_main(["run", str(cfg_path)]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "SUCCESS"


def test_validate_routes_rows(spark):
    df = spark.createDataFrame(
        [("a", "O"), (None, "O"), ("c", "X")], "k string, status string"
    )
    schema = {"fields": [
        {"name": "k", "data_type": "string", "nullable": False},
        {"name": "status", "data_type": "enum", "enum_values": ["O", "F", "P"]},
    ]}
    out = get_operator("validate")(schema=schema).apply({"in": df})
    assert {r["k"] for r in out["valid"].collect()} == {"a"}
    assert out["invalid"].count() == 2


def test_validate_structural_strict(spark):
    df = spark.createDataFrame([("a", 1)], "k string, extra int")
    schema = {"fields": [{"name": "k", "data_type": "string"}]}
    with pytest.raises(ValidationError, match="unknown extra"):
        get_operator("validate")(schema=schema).apply({"in": df})
    # non-strict allows extras
    out = get_operator("validate")(schema=schema, strict=False).apply({"in": df})
    assert out["valid"].count() == 1
    with pytest.raises(ValidationError, match="missing required"):
        get_operator("validate")(schema={"fields": [{"name": "nope", "data_type": "string"}]}, strict=False).apply({"in": df})


def test_validate_raise_mode(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    schema = {"fields": [{"name": "k", "data_type": "string", "nullable": False}]}
    with pytest.raises(ValidationError, match="first bad row"):
        get_operator("validate")(schema=schema, mode="raise").apply({"in": df})


def test_validate_nested_nullability(spark):
    df = spark.createDataFrame(
        [((None,),), (("x",),)], "payload struct<inner:string>"
    )
    schema = {"fields": [
        {"name": "payload", "data_type": "object", "children": [
            {"name": "inner", "data_type": "string", "nullable": False}]},
    ]}
    out = get_operator("validate")(schema=schema).apply({"in": df})
    assert out["valid"].count() == 1
    assert out["invalid"].count() == 1


def test_run_due_isolates_failing_schedules(spark, tmp_path):
    """One schedule whose job can't even start (deleted job) must not
    abort the sweep: later due schedules still run, the failure is
    recorded as a FAILED execution, and the dangling schedule is
    disabled instead of re-failing every sweep."""
    import sqlite3
    import time

    store = JobStore(tmp_path / "jobs.db")
    good_id = store.create_job(make_job_config(tmp_path))
    bad_id = store.create_job(make_job_config(tmp_path))
    sid_bad = store.create_schedule(bad_id, interval_seconds=1)
    sid_good = store.create_schedule(good_id, interval_seconds=1)
    # orphan the first schedule behind the store's back (simulates the
    # pre-cascade state an old db can still contain)
    con = sqlite3.connect(str(tmp_path / "jobs.db"))
    con.execute("DELETE FROM jobs WHERE job_id = ?", (bad_id,))
    con.commit(); con.close()
    store._conn.execute("DELETE FROM jobs WHERE job_id = ?", (bad_id,))
    store._conn.commit()

    records = store.run_due(spark, now=time.time() + 2)
    by_job = {r.job_id: r for r in records}
    assert by_job[good_id].status == "SUCCESS"
    assert by_job[bad_id].status == "FAILED" and "KeyError" in by_job[bad_id].error
    assert store.get_schedule(sid_bad)["enabled"] is False
    assert store.get_schedule(sid_good)["enabled"] is True
    # the good schedule advanced: not due again at the same instant
    assert store.get_schedule(sid_good)["next_due"] > time.time() + 1


def test_delete_job_cascades_schedules(spark, tmp_path):
    store = JobStore(tmp_path / "jobs.db")
    job_id = store.create_job(make_job_config(tmp_path))
    sid = store.create_schedule(job_id, interval_seconds=3600)
    store.delete_job(job_id)
    with pytest.raises(KeyError):
        store.get_schedule(sid)


def test_schedules_table_migration(tmp_path):
    """A store db from before trigger_type/trigger_args must be
    upgraded in place (CREATE TABLE IF NOT EXISTS would silently keep
    the old 5-column table and break every schedule insert/read)."""
    import sqlite3
    import time

    db = tmp_path / "old.db"
    con = sqlite3.connect(str(db))
    con.executescript(
        """
        CREATE TABLE jobs (
            job_id TEXT PRIMARY KEY, name TEXT NOT NULL,
            config_json TEXT NOT NULL, created_at REAL NOT NULL,
            updated_at REAL NOT NULL);
        CREATE TABLE schedules (
            schedule_id TEXT PRIMARY KEY,
            job_id TEXT NOT NULL REFERENCES jobs(job_id),
            interval_seconds REAL NOT NULL,
            next_due REAL,
            enabled INTEGER NOT NULL DEFAULT 1);
        """
    )
    now = time.time()
    con.execute("INSERT INTO jobs VALUES ('j1', 'old', '{}', ?, ?)", (now, now))
    con.execute(
        "INSERT INTO schedules VALUES ('s1', 'j1', 1800.0, ?, 1)", (now + 60,)
    )
    con.commit(); con.close()

    store = JobStore(db)
    sched = store.get_schedule("s1")
    assert sched["trigger_type"] == "interval"
    assert sched["trigger_args"] == {"seconds": 1800.0}
    assert sched["next_due"] == pytest.approx(now + 60)
    assert sched["enabled"] is True
    # and the new shape round-trips
    job_id = store.create_job(make_job_config(tmp_path))
    sid = store.create_schedule(job_id, trigger_type="cron",
                                trigger_args={"expression": "0 3 * * *"})
    assert store.get_schedule(sid)["trigger_type"] == "cron"


def test_create_context_rejects_literal_secrets(tmp_path):
    store = JobStore(tmp_path / "jobs.db")
    with pytest.raises(ValueError, match="api_key"):
        store.create_context("c1", {"url": "x", "api_key": "literal"})
    # *_env indirection and non-secret keys are fine
    store.create_context("c1", {"url": "x", "api_key_env": "MY_KEY"})
    assert store.get_context("c1")["api_key_env"] == "MY_KEY"


def test_cli_explain(spark, tmp_path, capsys):
    """`explain` prints each sink's formatted physical plan without
    executing anything (the output file must NOT appear)."""
    cfg = make_job_config(tmp_path)
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(cfg))
    assert cli_main(["explain", str(cfg_path)]) == 0
    out = capsys.readouterr().out
    assert "== sink:" in out
    assert "Physical Plan" in out
    # nothing ran: the sink path was never written
    sink_paths = [c.get("filepath") for c in cfg["components"]
                  if str(c.get("comp_type", "")).startswith("write_")]
    import os
    assert sink_paths and not any(os.path.exists(p) for p in sink_paths)


def test_scheduler_daemon_loop(spark, tmp_path):
    """run_scheduler: fixed-rate sweeps with an injectable clock, a
    bounded max_sweeps exit, responsive stop_event shutdown, and
    per-sweep reporting. A schedule due every sweep executes every
    sweep (next_due advances through run_due)."""
    import threading
    import time

    from etl_core_spark.plans.store import run_scheduler

    store = JobStore(tmp_path / "jobs.db")
    job_id = store.create_job(make_job_config(tmp_path))
    store.create_schedule(job_id, interval_seconds=10.0)

    clock = {"t": time.time() + 1}

    def now_fn():
        clock["t"] += 11  # each call advances past the 10 s interval
        return clock["t"]

    seen = []
    sweeps = run_scheduler(
        store, spark, interval_s=0.0, max_sweeps=3, now_fn=now_fn,
        on_sweep=lambda s, recs: seen.append((s, [r.status for r in recs])),
    )
    assert sweeps == 3
    assert [s for s, _ in seen] == [1, 2, 3]
    # the schedule was due on every sweep (clock jumps past interval)
    assert all(statuses == ["SUCCESS"] for _, statuses in seen)
    assert len(store.list_executions(job_id)) >= 3

    # stop_event set up-front: zero sweeps, immediate return
    ev = threading.Event()
    ev.set()
    assert run_scheduler(store, spark, stop_event=ev) == 0
