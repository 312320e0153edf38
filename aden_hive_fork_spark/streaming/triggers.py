"""Webhook / timer event producers (SURVEY.md §2.C row 63 — closes the
"event sources" partial; VERDICT r1 "Next round" #10).

Reference parity: the agent runtime's webhook server and cron/timer
triggers (core/framework/runtime/agent_runtime.py:263-655 — cron
:414-531, timers :532-655; runtime/webhook_server.py) fire graph
executions. Spark-first mapping: a trigger is a PRODUCER that appends
event files to the directory a Structured Streaming file source
(streaming.events.read_event_stream) watches — the trigger and the
query are decoupled exactly like the reference's bus, and at scale the
same producers write to Kafka instead with no query change.

Both producers write ATOMICALLY (§2.C row 69): the JSONL file is
fully written to a hidden temp name, then os.replace()d into the
watched directory — the stream never sees a half-written file (Spark's
file source ignores dot-prefixed names).

Everything is stdlib (http.server, threading) — no web framework.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable


def _utc_iso(ts: float | None = None) -> str:
    import datetime as dt

    t = dt.datetime.fromtimestamp(
        ts if ts is not None else time.time(), dt.timezone.utc
    )
    return t.strftime("%Y-%m-%dT%H:%M:%S.%f")


def write_event_file(out_dir: str, events: list[dict[str, Any]]) -> str:
    """Atomically publish one JSONL file of events into a stream
    directory: full write to a dot-prefixed temp file (invisible to
    the Spark file source), fsync, then an atomic rename."""
    os.makedirs(out_dir, exist_ok=True)
    name = f"events-{time.time_ns()}-{uuid.uuid4().hex[:8]}.jsonl"
    tmp = os.path.join(out_dir, "." + name)
    final = os.path.join(out_dir, name)
    with open(tmp, "w", encoding="utf-8") as fh:
        for ev in events:
            fh.write(json.dumps(ev, separators=(",", ":")) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)
    return final


class WebhookSource:
    """HTTP POST endpoint → event files (webhook_server.py analog).

    Each POST body is a JSON object (or list of objects); missing
    ``ts`` / ``event_id`` are stamped server-side. Responds 202 with
    the accepted count. ``port=0`` binds an ephemeral port (read it
    back from ``.port`` after ``start()``).
    """

    def __init__(self, out_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.out_dir = out_dir
        self.host, self.port = host, port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._seq = 0
        self._lock = threading.Lock()
        self.accepted = 0

    def _stamp(self, ev: dict[str, Any]) -> dict[str, Any]:
        with self._lock:
            self._seq += 1
            seq = self._seq
        ev.setdefault("event_id", seq)
        ev.setdefault("ts", _utc_iso())
        return ev

    def start(self) -> int:
        source = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (stdlib API name)
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    events = payload if isinstance(payload, list) else [payload]
                    events = [source._stamp(dict(e)) for e in events]
                    write_event_file(source.out_dir, events)
                    source.accepted += len(events)
                    body = json.dumps({"accepted": len(events)}).encode()
                    self.send_response(202)
                except Exception as exc:
                    body = json.dumps({"error": str(exc)}).encode()
                    self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence stdlib request logging
                pass

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


# ---------------------------------------------------------------------------
# cron schedule (stdlib 5-field parser — croniter analog,
# agent_runtime.py:414-531 uses croniter.get_next the same way)
# ---------------------------------------------------------------------------
def _cron_field(expr: str, lo: int, hi: int) -> set[int]:
    """One cron field -> allowed value set. Supports '*', '*/n', lists,
    ranges ('1-5'), and stepped ranges ('1-9/2')."""
    vals: set[int] = set()
    for part in expr.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            rng = range(int(part), int(part) + 1)
        vals.update(v for v in rng if (v - rng.start) % step == 0 and lo <= v <= hi)
    if not vals:
        raise ValueError(f"empty cron field: {expr!r}")
    return vals


def cron_next(expr: str, after) -> "object":
    """Next fire time STRICTLY AFTER ``after`` for a 5-field cron
    expression (minute hour day-of-month month day-of-week; dow 0=Sun,
    7 aliases to 0). Day-of-month and day-of-week combine with OR when
    both are restricted, per POSIX cron."""
    import datetime as dt

    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron expression needs 5 fields: {expr!r}")
    minutes = _cron_field(fields[0], 0, 59)
    hours = _cron_field(fields[1], 0, 23)
    doms = _cron_field(fields[2], 1, 31)
    months = _cron_field(fields[3], 1, 12)
    dows = {0 if v == 7 else v for v in _cron_field(fields[4], 0, 7)}
    dom_any = fields[2] == "*"
    dow_any = fields[4] == "*"

    t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    for _ in range(366 * 24 * 60):  # bounded scan: <= 1 year of minutes
        if t.month in months:
            # python weekday(): Mon=0..Sun=6 -> cron dow Sun=0..Sat=6
            cron_dow = (t.weekday() + 1) % 7
            dom_ok = t.day in doms
            dow_ok = cron_dow in dows
            day_ok = (
                (dom_ok or dow_ok)
                if (not dom_any and not dow_any)
                else (dom_ok and dow_ok)
            )
            if day_ok and t.hour in hours and t.minute in minutes:
                return t
        t += dt.timedelta(minutes=1)
    raise ValueError(f"no fire time within a year for {expr!r}")


class CronSource:
    """Cron-scheduled event producer (agent_runtime.py:414-531 analog):
    fires on the 5-field schedule, skipping a tick is impossible by
    construction (the producer only appends a file — the consuming
    query applies its own backpressure via maxFilesPerTrigger).
    ``immediate=True`` fires once at start like the reference's
    run-immediately entry points."""

    def __init__(
        self,
        out_dir: str,
        expr: str,
        payload_fn: Callable[[int], dict[str, Any]] | None = None,
        max_fires: int | None = None,
        immediate: bool = False,
    ):
        import datetime as dt

        cron_next(expr, dt.datetime.now())  # validate eagerly
        self.out_dir = out_dir
        self.expr = expr
        self.payload_fn = payload_fn or (
            lambda i: {"event_type": "cron_fire", "value": float(i)}
        )
        self.max_fires = max_fires
        self.immediate = immediate
        self.fires = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _emit(self, i: int) -> None:
        ev = dict(self.payload_fn(i))
        ev.setdefault("event_id", i + 1)
        ev.setdefault("ts", _utc_iso())
        write_event_file(self.out_dir, [ev])
        self.fires += 1

    def _run(self) -> None:
        import datetime as dt

        i = 0
        if self.immediate and not self._stop.is_set():
            self._emit(i)
            i += 1
        while not self._stop.is_set():
            if self.max_fires is not None and i >= self.max_fires:
                return
            now = dt.datetime.now()
            wait = (cron_next(self.expr, now) - now).total_seconds()
            if self._stop.wait(max(0.0, wait)):
                return
            self._emit(i)
            i += 1

    def start(self) -> "CronSource":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)


class TimerSource:
    """Interval timer → event files (agent_runtime.py:532-655 analog;
    a cron schedule is the same producer with a cron-parsed sleep).

    Every ``interval_s`` the ``payload_fn(fire_index)`` event is
    published; ``max_fires`` bounds the run (None = until stop()).
    """

    def __init__(
        self,
        out_dir: str,
        interval_s: float,
        payload_fn: Callable[[int], dict[str, Any]] | None = None,
        max_fires: int | None = None,
    ):
        self.out_dir = out_dir
        self.interval_s = interval_s
        self.payload_fn = payload_fn or (
            lambda i: {"event_type": "timer_fire", "value": float(i)}
        )
        self.max_fires = max_fires
        self.fires = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        i = 0
        while not self._stop.is_set():
            if self.max_fires is not None and i >= self.max_fires:
                return
            if self._stop.wait(self.interval_s):
                return
            ev = dict(self.payload_fn(i))
            ev.setdefault("event_id", i + 1)
            ev.setdefault("ts", _utc_iso())
            write_event_file(self.out_dir, [ev])
            self.fires += 1
            i += 1

    def start(self) -> "TimerSource":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def join(self, timeout: float | None = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)
