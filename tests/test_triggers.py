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
