"""Webhook/timer event producers feeding a LIVE streaming query
(VERDICT r1 "Next round" #10): an HTTP POST must land in the streaming
query's output; the timer must fire its bounded schedule.
"""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from aden_hive_fork_spark.streaming.events import read_event_stream
from aden_hive_fork_spark.streaming.triggers import (
    TimerSource,
    WebhookSource,
    write_event_file,
)


def _post(port: int, payload) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert resp.status == 202
        return json.loads(resp.read())


def test_atomic_event_file_is_visible_and_complete(tmp_path):
    out = str(tmp_path / "stream")
    p = write_event_file(out, [{"event_id": 1, "event_type": "x"}])
    assert not p.rsplit("/", 1)[-1].startswith(".")
    lines = open(p).read().splitlines()
    assert json.loads(lines[0])["event_type"] == "x"


def test_webhook_post_lands_in_streaming_output(spark, tmp_path):
    """End-to-end: HTTP POST -> atomic JSONL file -> file-source
    micro-batch -> memory sink."""
    stream_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    with WebhookSource(stream_dir) as hook:
        # the directory must exist before the stream starts
        write_event_file(stream_dir, [])
        events = read_event_stream(spark, stream_dir)
        q = (
            events.writeStream.format("memory")
            .queryName("webhook_sink")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            out = _post(
                hook.port,
                {"event_type": "order_created", "user_id": 7, "value": 99.5},
            )
            assert out["accepted"] == 1
            _post(
                hook.port,
                [
                    {"event_type": "order_paid", "user_id": 7, "value": 99.5},
                    {"event_type": "order_shipped", "user_id": 7, "value": 0.0},
                ],
            )
            deadline = time.time() + 60
            while time.time() < deadline:
                q.processAllAvailable()
                rows = spark.sql("SELECT * FROM webhook_sink").collect()
                if len(rows) >= 3:
                    break
                time.sleep(0.2)
            by_type = {r["event_type"]: r for r in rows}
            assert set(by_type) == {"order_created", "order_paid", "order_shipped"}
            assert by_type["order_created"]["user_id"] == 7
            assert by_type["order_created"]["ts"] is not None  # server-stamped
            assert by_type["order_paid"]["event_id"] != by_type["order_shipped"]["event_id"]
        finally:
            q.stop()


def test_webhook_rejects_bad_payload(tmp_path):
    with WebhookSource(str(tmp_path / "s")) as hook:
        req = urllib.request.Request(
            f"http://127.0.0.1:{hook.port}/", data=b"not json", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=10)
        assert err.value.code == 400


def test_timer_fires_bounded_schedule(spark, tmp_path):
    stream_dir = str(tmp_path / "timer_events")
    timer = TimerSource(stream_dir, interval_s=0.1, max_fires=3).start()
    timer.join(timeout=15)
    assert timer.fires == 3
    # batch-read the produced files with the stream's schema contract
    df = spark.read.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).json(stream_dir)
    rows = df.orderBy("event_id").collect()
    assert [r["value"] for r in rows] == [0.0, 1.0, 2.0]
    assert all(r["event_type"] == "timer_fire" for r in rows)


# ---------------------------------------------------------------------------
# cron schedule (stdlib croniter analog)
# ---------------------------------------------------------------------------
def test_cron_next_basic_fields():
    import datetime as dt

    from aden_hive_fork_spark.streaming.triggers import cron_next

    t = dt.datetime(2024, 3, 1, 10, 30)
    # every minute -> next minute
    assert cron_next("* * * * *", t) == dt.datetime(2024, 3, 1, 10, 31)
    # fixed minute
    assert cron_next("15 * * * *", t) == dt.datetime(2024, 3, 1, 11, 15)
    # daily at 09:00 -> next day (10:30 already past)
    assert cron_next("0 9 * * *", t) == dt.datetime(2024, 3, 2, 9, 0)
    # steps: every 20 minutes
    assert cron_next("*/20 * * * *", t) == dt.datetime(2024, 3, 1, 10, 40)
    # month rollover: Feb 30 does not exist -> first fire is Mar 30
    assert cron_next("0 0 30 * *", dt.datetime(2024, 2, 1)) == dt.datetime(2024, 3, 30)


def test_cron_next_dow_and_dom_or_semantics():
    import datetime as dt

    from aden_hive_fork_spark.streaming.triggers import cron_next

    # 2024-03-01 is a Friday (cron dow 5)
    t = dt.datetime(2024, 3, 1, 0, 0)
    # next Sunday (dow 0) at noon
    assert cron_next("0 12 * * 0", t) == dt.datetime(2024, 3, 3, 12, 0)
    # dow 7 aliases to Sunday
    assert cron_next("0 12 * * 7", t) == dt.datetime(2024, 3, 3, 12, 0)
    # POSIX OR: dom=2 OR dow=Sunday -> Mar 2 (Saturday) wins over Mar 3
    assert cron_next("0 0 2 * 0", t) == dt.datetime(2024, 3, 2, 0, 0)


def test_cron_next_rejects_bad_expressions():
    import datetime as dt

    from aden_hive_fork_spark.streaming.triggers import cron_next

    with pytest.raises(ValueError):
        cron_next("* * * *", dt.datetime(2024, 1, 1))  # 4 fields
    with pytest.raises(ValueError):
        cron_next("99 * * * *", dt.datetime(2024, 1, 1))  # out of range


def test_cron_source_immediate_fire(spark, tmp_path):
    from aden_hive_fork_spark.streaming.triggers import CronSource

    stream_dir = str(tmp_path / "cron_events")
    src = CronSource(stream_dir, "* * * * *", max_fires=1, immediate=True).start()
    deadline = time.time() + 15
    while time.time() < deadline and src.fires < 1:
        time.sleep(0.05)
    src.stop()
    assert src.fires == 1
    df = spark.read.schema("event_id long, ts timestamp, event_type string, value double").json(
        stream_dir
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["event_type"] == "cron_fire"
