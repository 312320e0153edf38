"""Time introspection — analog of the reference's ``get_current_time``
tool (tools/src/aden_tools/tools/time_tool/time_tool.py:20+): ISO
string, unix timestamp, and components for a named timezone.

Deterministic by construction when ``at`` is supplied (tests pass a
fixed instant); ``at=None`` uses the wall clock like the reference.
Driver-side (control-plane metadata, not a data-path operator); the
data-path date/time surface is the SQL functions in the suite (q12,
q26, q28, q62).
"""

from __future__ import annotations

import datetime as _dt
from zoneinfo import ZoneInfo


def time_info(timezone: str = "UTC", at: _dt.datetime | None = None) -> dict:
    """ISO / unix / components of ``at`` (default: now) in ``timezone``.

    Raises ``KeyError`` for an unknown IANA name, like the reference's
    error envelope for invalid timezones.
    """
    try:
        tz = ZoneInfo(timezone)
    except Exception as exc:
        raise KeyError(f"unknown timezone: {timezone!r}") from exc
    if at is None:
        at = _dt.datetime.now(_dt.timezone.utc)
    elif at.tzinfo is None:
        at = at.replace(tzinfo=_dt.timezone.utc)
    local = at.astimezone(tz)
    return {
        "timezone": timezone,
        "iso": local.isoformat(),
        "unix": at.timestamp(),
        "year": local.year,
        "month": local.month,
        "day": local.day,
        "hour": local.hour,
        "minute": local.minute,
        "second": local.second,
        "day_of_week": local.strftime("%A"),
        "utc_offset_s": int(local.utcoffset().total_seconds()),
    }
