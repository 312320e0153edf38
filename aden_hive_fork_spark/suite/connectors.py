"""SaaS-connector suite entries: the GitHub / Gmail tabular
connectors exercised END-TO-END under the oracle hash gate — the
q80 external-join pattern applied to REST connectors.

Each query builds a DETERMINISTIC fixture wire (responses derived
arithmetically from star-schema keys), fetches it through the real
connector path — client → transport seam → mapInPandas executor tier
— and joins the hydrated rows back to warehouse tables. The DuckDB
oracle recomputes the same fixture arithmetic in SQL, so the entire
connector stack (request building, envelope parsing, row flattening,
the distributed tier) sits inside the value-hash gate.

At 100 TB the connector output is a bounded dimension (repos,
issues, messages — API-rate-limited by nature): it broadcasts; the
warehouse fact side never moves. The fixture fetch here is 25 rows
by construction (one per nation), independent of sf.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T
from ..sources.github_source import (
    GITHUB_API_BASE,
    GitHubClient,
    github_issues_table,
)
from ..sources.calendar_source import (
    CALENDAR_API_BASE,
    CalendarClient,
    calendar_events_table,
)
from ..sources.gmail_source import GMAIL_API_BASE, GmailClient, gmail_messages_table
from ..sources.hubspot_source import (
    HUBSPOT_API_BASE,
    HubSpotClient,
    hubspot_objects_table,
)
from ..sources.rest_connector import FixtureRestTransport, jdump
from ..sources.slack_source import SLACK_API_BASE, SlackClient, slack_history_table
from ..sources.stripe_source import (
    STRIPE_API_BASE,
    StripeClient,
    stripe_charges_table,
)


def _github_fixtures(nations: list[tuple[int, str]]) -> dict:
    """Deterministic GitHub wire: each nation is a repo under owner
    'warehouse'; it has 3 issues numbered nk*10+i (i=1..3), comments
    = (nk*7 + i) % 11, state open when (nk + i) is even. The oracle
    recomputes exactly this arithmetic in SQL."""
    fx = {}
    for nk, name in nations:
        issues = []
        for i in (1, 2, 3):
            issues.append({
                "number": nk * 10 + i,
                "title": f"issue {nk * 10 + i}",
                "state": "open" if (nk + i) % 2 == 0 else "closed",
                "user": {"login": f"user{(nk + i) % 5}"},
                "created_at": "2026-08-01T00:00:00Z",
                "updated_at": "2026-08-02T00:00:00Z",
                "comments": (nk * 7 + i) % 11,
            })
        fx[FixtureRestTransport.key(
            "GET", f"{GITHUB_API_BASE}/repos/warehouse/{name}/issues",
            {"state": "all", "per_page": 100, "page": 1},
        )] = (200, jdump(issues))
    return fx


@query(
    "q233_github_issues_join",
    oracle="""
    WITH issues AS (
      SELECT n.n_nationkey, n.n_name AS repo, n.n_regionkey,
        n.n_nationkey * 10 + i.i AS number,
        CASE WHEN (n.n_nationkey + i.i) % 2 = 0
             THEN 'open' ELSE 'closed' END AS state,
        (n.n_nationkey * 7 + i.i) % 11 AS n_comments
      FROM nation n CROSS JOIN (VALUES (1), (2), (3)) AS i(i)
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_open_issues,
      CAST(SUM(n_comments) AS BIGINT) AS total_comments,
      CAST(MAX(number) AS BIGINT) AS max_issue_number
    FROM issues iss JOIN region r ON iss.n_regionkey = r.r_regionkey
    WHERE iss.state = 'open'
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q233_github_issues_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (GitHub): issues for every nation-
    repo are fetched through the full connector path — GitHubClient
    envelope parsing on a fixture wire, distributed over executors by
    github_issues_table (mapInPandas, map-only) — then joined
    broadcast to nation/region and aggregated.

    Reference parity: github_list_issues (github_tool.py:613-644)
    consumed as a TABLE instead of one interactive call. The fixture
    dict pickles by value into the executor closure — the same
    record/replay seam the search/news/vision adapters use."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nations = [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in nation.select("n_nationkey", "n_name").collect()
    ]  # 25 rows: fixture construction is O(|nation|), a true dimension
    fixtures = _github_fixtures(nations)
    repos = nation.select(
        F.lit("warehouse").alias("owner"), F.col("n_name").alias("repo")
    )
    issues = github_issues_table(
        repos,
        lambda: GitHubClient("fixture-token", FixtureRestTransport(fixtures)),
        state="all",
    )
    # repos derives from nation, so rename the dim columns before the
    # re-join (avoids Spark's ambiguous-self-join lineage trap)
    nat_dim = nation.select(
        F.col("n_name").alias("_dim_name"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    joined = (
        issues.filter(F.col("state") == "open")
        .join(F.broadcast(nat_dim), issues.repo == F.col("_dim_name"))
        .join(F.broadcast(region), F.col("_dim_rk") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_open_issues"),
            F.sum("n_comments").cast("bigint").alias("total_comments"),
            F.max("number").cast("bigint").alias("max_issue_number"),
        )
        .orderBy("region")
    )


def _gmail_fixtures(nations: list[tuple[int, str]]) -> dict:
    """Deterministic Gmail wire: one message per nation, id 'm<nk>',
    subject 'Weekly digest <nk>', UNREAD label when nk % 3 == 0,
    snippet length nk+10 characters of 'x'."""
    import base64

    fx = {}
    for nk, name in nations:
        labels = ["INBOX"] + (["UNREAD"] if nk % 3 == 0 else [])
        body_text = f"Report for {name}"
        msg = {
            "id": f"m{nk}",
            "threadId": f"t{nk}",
            "labelIds": labels,
            "snippet": "x" * (nk + 10),
            "payload": {
                "headers": [
                    {"name": "Subject", "value": f"Weekly digest {nk}"},
                    {"name": "From",
                     "value": f"ops@{name.lower()}.example"},
                    {"name": "To", "value": "me@warehouse.example"},
                    {"name": "Date",
                     "value": "Mon, 3 Aug 2026 09:00:00 +0000"},
                ],
                "body": {"data": base64.urlsafe_b64encode(
                    body_text.encode()).decode()},
            },
        }
        fx[FixtureRestTransport.key(
            "GET", f"{GMAIL_API_BASE}/messages/m{nk}", {"format": "full"},
        )] = (200, jdump(msg))
    return fx


@query(
    "q234_gmail_messages_join",
    oracle="""
    WITH msgs AS (
      SELECT n.n_nationkey, n.n_regionkey,
        'm' || CAST(n.n_nationkey AS VARCHAR) AS message_id,
        CASE WHEN n.n_nationkey % 3 = 0 THEN 1 ELSE 0 END AS is_unread,
        n.n_nationkey + 10 AS snippet_len,
        'Report for ' || n.n_name AS body
      FROM nation n
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_messages,
      CAST(SUM(is_unread) AS BIGINT) AS n_unread,
      CAST(SUM(snippet_len) AS BIGINT) AS total_snippet_len,
      CAST(SUM(LENGTH(body)) AS BIGINT) AS total_body_len
    FROM msgs m JOIN nation n ON m.n_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q234_gmail_messages_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Gmail): a table of message ids (one
    per nation) is hydrated through the full connector path —
    GmailClient header flattening + urlsafe-b64 body decode on a
    fixture wire, distributed by gmail_messages_table — then joined
    broadcast to nation/region for unread/volume rollups.

    Reference parity: gmail_get_message format='full'
    (gmail_tool.py:165-231) consumed as a TABLE (the
    gmail_batch_get_messages shape, executor-distributed)."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nations = [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in nation.select("n_nationkey", "n_name").collect()
    ]
    fixtures = _gmail_fixtures(nations)
    ids = nation.select(
        F.concat(F.lit("m"), F.col("n_nationkey").cast("string")).alias(
            "message_id"
        ),
        F.col("n_nationkey").alias("_nk"),
    )
    msgs = gmail_messages_table(
        ids.select("message_id"),
        lambda: GmailClient("fixture-token", FixtureRestTransport(fixtures)),
        format="full",
    )
    hydrated = msgs.withColumn(
        "_nk", F.regexp_extract("message_id", r"^m(\d+)$", 1).cast("int")
    )
    # ids derive from nation — rename the dim columns before re-join
    nat_dim = nation.select(
        F.col("n_nationkey").alias("_dim_nk"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    joined = (
        hydrated.join(F.broadcast(nat_dim),
                      hydrated._nk == F.col("_dim_nk"))
        .join(F.broadcast(region), F.col("_dim_rk") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_messages"),
            F.sum(
                F.when(F.col("labels").contains("UNREAD"), 1).otherwise(0)
            ).cast("bigint").alias("n_unread"),
            F.sum(F.length("snippet")).cast("bigint").alias(
                "total_snippet_len"),
            F.sum(F.length("body")).cast("bigint").alias("total_body_len"),
        )
        .orderBy("region")
    )


def _slack_fixtures(nations: list[tuple[int, str]]) -> dict:
    """Deterministic Slack wire: channel 'C<nk>' per nation carries
    (nk % 4) + 1 messages; message i has user 'U<(nk+i)%7>' and
    reply_count (nk*3 + i) % 6."""
    fx = {}
    for nk, _name in nations:
        msgs = []
        for i in range(1, (nk % 4) + 2):
            msgs.append({
                "ts": f"{nk * 100 + i}.000100",
                "user": f"U{(nk + i) % 7}",
                "text": f"update {nk}-{i}",
                "reply_count": (nk * 3 + i) % 6,
            })
        fx[FixtureRestTransport.key(
            "GET", f"{SLACK_API_BASE}/conversations.history",
            {"channel": f"C{nk}", "limit": 200},
        )] = (200, jdump({"ok": True, "messages": msgs}))
    return fx


@query(
    "q235_slack_history_join",
    oracle="""
    WITH msgs AS (
      SELECT n.n_nationkey, n.n_regionkey, i.i,
        'U' || CAST((n.n_nationkey + i.i) % 7 AS VARCHAR) AS msg_user,
        (n.n_nationkey * 3 + i.i) % 6 AS reply_count
      FROM nation n
      CROSS JOIN (VALUES (1), (2), (3), (4)) AS i(i)
      WHERE i.i <= (n.n_nationkey % 4) + 1
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_messages,
      CAST(SUM(reply_count) AS BIGINT) AS total_replies,
      CAST(COUNT(DISTINCT msg_user) AS BIGINT) AS n_distinct_users
    FROM msgs m JOIN region r ON m.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q235_slack_history_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Slack): per-nation channel history
    fetched through SlackClient's ok:false protocol on a fixture
    wire, distributed by slack_history_table, then joined broadcast
    to nation/region for per-region activity rollups.

    Reference parity: conversations.history (slack_tool.py:121-144)
    consumed as a TABLE."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nations = [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in nation.select("n_nationkey", "n_name").collect()
    ]
    fixtures = _slack_fixtures(nations)
    chans = nation.select(
        F.concat(F.lit("C"), F.col("n_nationkey").cast("string")).alias(
            "channel"
        )
    )
    hist = slack_history_table(
        chans,
        lambda: SlackClient("fixture-token", FixtureRestTransport(fixtures)),
        limit=200,
    )
    hydrated = hist.withColumn(
        "_nk", F.regexp_extract("channel", r"^C(\d+)$", 1).cast("int")
    )
    nat_dim = nation.select(
        F.col("n_nationkey").alias("_dim_nk"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    joined = (
        hydrated.join(F.broadcast(nat_dim), hydrated._nk == F.col("_dim_nk"))
        .join(F.broadcast(region), F.col("_dim_rk") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_messages"),
            F.sum("reply_count").cast("bigint").alias("total_replies"),
            F.countDistinct("user").cast("bigint").alias("n_distinct_users"),
        )
        .orderBy("region")
    )


def _calendar_fixtures(nations: list[tuple[int, str]]) -> dict:
    """Deterministic Calendar wire: calendar 'cal<nk>' per nation has
    2 events; event i is confirmed when (nk + i) % 2 == 0 and carries
    (nk + i) % 4 attendees."""
    fx = {}
    for nk, name in nations:
        items = []
        for i in (1, 2):
            att = [{"email": f"p{j}@{name.lower()}.example"}
                   for j in range((nk + i) % 4)]
            ev = {
                "id": f"e{nk}-{i}",
                "summary": f"Meeting {nk}-{i}",
                "start": {"dateTime": f"2026-08-0{i}T09:00:00Z"},
                "end": {"dateTime": f"2026-08-0{i}T10:00:00Z"},
                "status": "confirmed" if (nk + i) % 2 == 0 else "tentative",
            }
            if att:
                ev["attendees"] = att
            items.append(ev)
        fx[FixtureRestTransport.key(
            "GET", f"{CALENDAR_API_BASE}/calendars/cal{nk}/events",
            {"maxResults": 250, "singleEvents": "true",
             "orderBy": "startTime"},
        )] = (200, jdump({"items": items}))
    return fx


@query(
    "q236_calendar_events_join",
    oracle="""
    WITH events AS (
      SELECT n.n_nationkey, n.n_regionkey, i.i,
        CASE WHEN (n.n_nationkey + i.i) % 2 = 0 THEN 1 ELSE 0 END
          AS is_confirmed,
        (n.n_nationkey + i.i) % 4 AS n_attendees
      FROM nation n CROSS JOIN (VALUES (1), (2)) AS i(i)
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(is_confirmed) AS BIGINT) AS n_confirmed,
      CAST(SUM(n_attendees) AS BIGINT) AS total_attendees
    FROM events e JOIN region r ON e.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q236_calendar_events_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Google Calendar): per-nation
    calendars hydrated through CalendarClient's event flattening on a
    fixture wire, distributed by calendar_events_table, then joined
    broadcast to nation/region for meeting-load rollups.

    Reference parity: calendar_list_events
    (calendar_tool.py:179-278) consumed as a TABLE."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nations = [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in nation.select("n_nationkey", "n_name").collect()
    ]
    fixtures = _calendar_fixtures(nations)
    ids = nation.select(
        F.concat(F.lit("cal"), F.col("n_nationkey").cast("string")).alias(
            "calendar_id"
        )
    )
    events = calendar_events_table(
        ids,
        lambda: CalendarClient("fixture-token",
                               FixtureRestTransport(fixtures)),
    )
    hydrated = events.withColumn(
        "_nk", F.regexp_extract("calendar_id", r"^cal(\d+)$", 1).cast("int")
    )
    nat_dim = nation.select(
        F.col("n_nationkey").alias("_dim_nk"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    joined = (
        hydrated.join(F.broadcast(nat_dim), hydrated._nk == F.col("_dim_nk"))
        .join(F.broadcast(region), F.col("_dim_rk") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("status") == "confirmed", 1).otherwise(0)
            ).cast("bigint").alias("n_confirmed"),
            F.sum("n_attendees").cast("bigint").alias("total_attendees"),
        )
        .orderBy("region")
    )


def _stripe_fixtures(nations: list[tuple[int, str]]) -> dict:
    """Deterministic Stripe wire: customer 'cus_<nk>' per nation has
    (nk % 3) + 1 charges; charge i has amount (nk*211 + i*97) % 9000
    + 100 cents, refunded when (nk + i) % 5 == 0 (amount_refunded =
    amount/2 floor), succeeded always."""
    fx = {}
    for nk, _name in nations:
        charges = []
        for i in range(1, (nk % 3) + 2):
            amount = (nk * 211 + i * 97) % 9000 + 100
            refunded = (nk + i) % 5 == 0
            charges.append({
                "id": f"ch_{nk}_{i}", "amount": amount,
                "amount_refunded": amount // 2 if refunded else 0,
                "currency": "usd", "status": "succeeded",
                "paid": True, "customer": f"cus_{nk}",
                "created": 1722000000 + nk * 100 + i,
            })
        fx[FixtureRestTransport.key(
            "GET", f"{STRIPE_API_BASE}/charges",
            {"limit": 100, "customer": f"cus_{nk}"},
        )] = (200, jdump({"has_more": False, "data": charges}))
    return fx


@query(
    "q229_stripe_charges_join",
    oracle="""
    WITH charges AS (
      SELECT n.n_nationkey, n.n_regionkey, i.i,
        (n.n_nationkey * 211 + i.i * 97) % 9000 + 100 AS amount,
        CASE WHEN (n.n_nationkey + i.i) % 5 = 0
          THEN ((n.n_nationkey * 211 + i.i * 97) % 9000 + 100) // 2
          ELSE 0 END AS amount_refunded
      FROM nation n CROSS JOIN (VALUES (1), (2), (3)) AS i(i)
      WHERE i.i <= (n.n_nationkey % 3) + 1
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_charges,
      CAST(SUM(amount) AS BIGINT) AS gross_cents,
      CAST(SUM(amount - amount_refunded) AS BIGINT) AS net_cents
    FROM charges c JOIN region r ON c.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q229_stripe_charges_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Stripe): per-nation customer charges
    fetched through StripeClient's form-encoded wire + flattened
    charge envelopes on a fixture transport, distributed by
    stripe_charges_table, joined broadcast to nation/region for
    gross/net revenue rollups.

    Reference parity: list_charges + _format_charge
    (stripe_tool.py:331-381) consumed as a TABLE."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nations = [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in nation.select("n_nationkey", "n_name").collect()
    ]
    fixtures = _stripe_fixtures(nations)
    ids = nation.select(
        F.concat(F.lit("cus_"), F.col("n_nationkey").cast("string")).alias(
            "customer"
        )
    )
    charges = stripe_charges_table(
        ids,
        lambda: StripeClient("sk_fixture", FixtureRestTransport(fixtures)),
    )
    hydrated = charges.withColumn(
        "_nk", F.regexp_extract("customer", r"^cus_(\d+)$", 1).cast("int")
    )
    nat_dim = nation.select(
        F.col("n_nationkey").alias("_dim_nk"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    joined = (
        hydrated.join(F.broadcast(nat_dim), hydrated._nk == F.col("_dim_nk"))
        .join(F.broadcast(region), F.col("_dim_rk") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_charges"),
            F.sum("amount").cast("bigint").alias("gross_cents"),
            F.sum(F.col("amount") - F.col("amount_refunded")).cast(
                "bigint").alias("net_cents"),
        )
        .orderBy("region")
    )


def _hubspot_fixtures(nations: list[tuple[int, str]]) -> dict:
    """Deterministic HubSpot wire: deal '<nk>' per nation with amount
    (nk*503) % 90000 + 1000 and stage won/lost by nk parity."""
    fx = {}
    for nk, name in nations:
        fx[FixtureRestTransport.key(
            "GET", f"{HUBSPOT_API_BASE}/crm/v3/objects/deals/{nk}", {},
        )] = (200, jdump({
            "id": str(nk),
            "properties": {
                "dealname": f"Deal {name}",
                "amount": str((nk * 503) % 90000 + 1000),
                "dealstage": "closedwon" if nk % 2 == 0 else "closedlost",
            },
            "createdAt": "2026-08-01T00:00:00Z",
            "updatedAt": "2026-08-02T00:00:00Z",
        }))
    return fx


@query(
    "q230_hubspot_deals_join",
    oracle="""
    WITH deals AS (
      SELECT n.n_nationkey, n.n_regionkey,
        (n.n_nationkey * 503) % 90000 + 1000 AS amount,
        CASE WHEN n.n_nationkey % 2 = 0 THEN 1 ELSE 0 END AS won
      FROM nation n
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_deals,
      CAST(SUM(won) AS BIGINT) AS n_won,
      CAST(SUM(CASE WHEN won = 1 THEN amount ELSE 0 END) AS BIGINT)
        AS won_amount
    FROM deals d JOIN region r ON d.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q230_hubspot_deals_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (HubSpot): per-nation CRM deals
    hydrated through HubSpotClient + hubspot_objects_table (property
    JSON column → from_json extraction), joined broadcast to
    nation/region for win-rate rollups.

    Reference parity: hubspot_get_deal / get_object
    (hubspot_tool.py:79-96, :415-446) consumed as a TABLE."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nations = [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in nation.select("n_nationkey", "n_name").collect()
    ]
    fixtures = _hubspot_fixtures(nations)
    ids = nation.select(
        F.lit("deals").alias("object_type"),
        F.col("n_nationkey").cast("string").alias("object_id"),
    )
    objs = hubspot_objects_table(
        ids,
        lambda: HubSpotClient("pat_fixture", FixtureRestTransport(fixtures)),
    )
    props = F.from_json(
        "properties", "dealname string, amount string, dealstage string"
    )
    hydrated = objs.select(
        F.col("object_id").cast("int").alias("_nk"),
        props.getField("amount").cast("bigint").alias("amount"),
        (props.getField("dealstage") == "closedwon").alias("won"),
    )
    nat_dim = nation.select(
        F.col("n_nationkey").alias("_dim_nk"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    joined = (
        hydrated.join(F.broadcast(nat_dim), hydrated._nk == F.col("_dim_nk"))
        .join(F.broadcast(region), F.col("_dim_rk") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_deals"),
            F.sum(F.when(F.col("won"), 1).otherwise(0)).cast(
                "bigint").alias("n_won"),
            F.sum(F.when(F.col("won"), F.col("amount")).otherwise(0)).cast(
                "bigint").alias("won_amount"),
        )
        .orderBy("region")
    )
