"""Round-7 connector oracle queries (q280-q290): the q233 fixture-
wire pattern applied to the ELEVEN connectors that were tests-only
after round 6 — Exa, SerpAPI, Discord, Telegram, Apollo, Brevo,
Cal.com, Razorpay, Google Maps, Google Docs, outbound email.

Each query builds a DETERMINISTIC fixture wire (responses derived
arithmetically from nation keys), pulls it through the real
connector path — client envelope parsing on the transport seam,
distributed over executors by the connector's mapInPandas table
tier — and joins the hydrated rows back to nation/region with a
broadcast. The DuckDB oracle recomputes the same arithmetic in SQL,
so request building, envelope parsing, row flattening, and the
distributed tier all sit inside the value-hash gate.

At 100 TB every one of these feeds is a bounded dimension (API-rate-
limited by nature): the connector output broadcasts; the warehouse
fact side never moves. Fixture fetches here are O(|nation|) = 25.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T
from ..sources.rest_connector import FixtureRestTransport, jdump


def _nations(spark, sf_dir) -> list[tuple[int, str]]:
    return [
        (int(r["n_nationkey"]), str(r["n_name"]))
        for r in T(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .collect()
    ]  # 25 rows: fixture construction is O(|nation|), a true dimension


def _dims(spark, sf_dir):
    """(nation-dim with renamed cols, region) — the q233 rename
    avoids Spark's ambiguous-self-join lineage trap when the
    connector input table also derives from nation."""
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    nat_dim = nation.select(
        F.col("n_nationkey").alias("_dim_nk"),
        F.col("n_name").alias("_dim_name"),
        F.col("n_regionkey").alias("_dim_rk"),
    )
    return nat_dim, region


# ---------------------------------------------------------------------------
# q280 — Exa search→warehouse join: one search per nation name, (nk%3)+1
# fixture results each, region rollup of result counts + author breadth.
# ---------------------------------------------------------------------------
def _exa_fixtures(nations):
    from ..sources.exa_source import EXA_API_BASE

    fx = {}
    for nk, name in nations:
        results = [
            {
                "title": f"doc {nk * 10 + i}",
                "url": f"https://corpus.example/{nk}/{i}",
                "publishedDate": "2026-01-01",
                "author": f"author{(nk + i) % 4}",
            }
            for i in range(1, (nk % 3) + 2)
        ]
        payload = {"query": name, "numResults": 5, "contents": {}}
        fx[FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/search", None, payload
        )] = (200, jdump({"results": results}))
    return fx


@query(
    "q280_exa_search_join",
    oracle="""
    WITH hits AS (
      SELECT n.n_regionkey, n.n_name AS q, i.i AS rank,
        'author' || CAST((n.n_nationkey + i.i) % 4 AS VARCHAR) AS author
      FROM nation n CROSS JOIN (VALUES (1), (2), (3)) AS i(i)
      WHERE i.i <= (n.n_nationkey % 3) + 1
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_results,
      CAST(COUNT(DISTINCT author) AS BIGINT) AS n_authors
    FROM hits h JOIN region r ON h.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q280_exa_search_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Exa): a web search per nation runs
    through ExaSearchProvider on a fixture wire, distributed by
    exa_search_table (mapInPandas), then broadcast-joined to
    nation/region. Reference parity: exa_web_search_tool consumed as
    a TABLE."""
    from ..sources.exa_source import ExaSearchProvider, exa_search_table

    nations = _nations(spark, sf_dir)
    fixtures = _exa_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    queries = T(spark, sf_dir, "nation").select(
        F.col("n_name").alias("query")
    )
    hits = exa_search_table(
        queries,
        lambda: ExaSearchProvider(
            "fixture-key", FixtureRestTransport(fixtures)
        ),
        num_results=5,
        include_text=False,
    )
    joined = hits.join(
        F.broadcast(nat_dim), hits.query == F.col("_dim_name")
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_results"),
            F.countDistinct("author").cast("bigint").alias("n_authors"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q281 — SerpAPI scholar search→warehouse join: (nk%4)+1 papers per
# nation query, citation counts (nk*13+i)%97, region citation rollup.
# ---------------------------------------------------------------------------
def _serpapi_fixtures(nations):
    from ..sources.serpapi_source import SERPAPI_BASE

    fx = {}
    for nk, name in nations:
        organic = [
            {
                "title": f"paper {nk}-{i}",
                "link": f"https://scholar.example/{nk}/{i}",
                "inline_links": {
                    "cited_by": {"total": (nk * 13 + i) % 97}
                },
            }
            for i in range(1, (nk % 4) + 2)
        ]
        params = {
            "engine": "google_scholar", "q": name, "num": 5, "start": 0,
        }
        fx[FixtureRestTransport.key("GET", SERPAPI_BASE, params)] = (
            200,
            jdump({
                "organic_results": organic,
                "search_information": {"total_results": len(organic)},
            }),
        )
    return fx


@query(
    "q281_serpapi_scholar_join",
    oracle="""
    WITH papers AS (
      SELECT n.n_regionkey, i.i AS rank,
        (n.n_nationkey * 13 + i.i) % 97 AS cited
      FROM nation n CROSS JOIN (VALUES (1), (2), (3), (4)) AS i(i)
      WHERE i.i <= (n.n_nationkey % 4) + 1
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_papers,
      CAST(SUM(cited) AS BIGINT) AS total_citations,
      CAST(MAX(cited) AS BIGINT) AS max_citations
    FROM papers p JOIN region r ON p.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q281_serpapi_scholar_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (SerpAPI): Google Scholar searches on
    a fixture wire through SerpAPIClient.scholar_search, distributed
    by serpapi_scholar_table, citation totals rolled up per region.
    Reference parity: serpapi_tool.py scholar_search as a TABLE."""
    from ..sources.serpapi_source import (
        SerpAPIClient,
        serpapi_scholar_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _serpapi_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    queries = T(spark, sf_dir, "nation").select(
        F.col("n_name").alias("query")
    )
    papers = serpapi_scholar_table(
        queries,
        lambda: SerpAPIClient("fixture-key", FixtureRestTransport(fixtures)),
        num_results=5,
    )
    joined = papers.join(
        F.broadcast(nat_dim), papers.query == F.col("_dim_name")
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_papers"),
            F.sum("cited_by_count").cast("bigint").alias("total_citations"),
            F.max("cited_by_count").cast("bigint").alias("max_citations"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q282 — Discord history→warehouse join: channel 100+nk per nation,
# (nk%4)+1 messages with arithmetic authors/content lengths.
# ---------------------------------------------------------------------------
def _discord_fixtures(nations):
    from ..sources.messaging_source import DISCORD_API_BASE

    fx = {}
    for nk, _name in nations:
        cid = str(100 + nk)
        msgs = [
            {
                "id": str(nk * 100 + i),
                "author": {"username": f"user{(nk + i) % 3}"},
                "content": "m" * ((nk + i) % 7 + 1),
                "timestamp": "2026-08-01T00:00:00Z",
            }
            for i in range(1, (nk % 4) + 2)
        ]
        fx[FixtureRestTransport.key(
            "GET", f"{DISCORD_API_BASE}/channels/{cid}/messages",
            {"limit": 100},
        )] = (200, jdump(msgs))
    return fx


@query(
    "q282_discord_messages_join",
    oracle="""
    WITH msgs AS (
      SELECT n.n_regionkey,
        'user' || CAST((n.n_nationkey + i.i) % 3 AS VARCHAR) AS author,
        (n.n_nationkey + i.i) % 7 + 1 AS content_len
      FROM nation n CROSS JOIN (VALUES (1), (2), (3), (4)) AS i(i)
      WHERE i.i <= (n.n_nationkey % 4) + 1
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_messages,
      CAST(SUM(content_len) AS BIGINT) AS total_chars,
      CAST(COUNT(DISTINCT author) AS BIGINT) AS n_authors
    FROM msgs m JOIN region r ON m.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q282_discord_messages_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Discord): per-nation channel history
    through DiscordClient.get_messages on a fixture wire, distributed
    by discord_messages_table, content-length rollup per region.
    Reference parity: discord_tool.py get_messages as a TABLE."""
    from ..sources.messaging_source import (
        DiscordClient,
        discord_messages_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _discord_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    channels = T(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 100).cast("string").alias("channel_id")
    )
    msgs = discord_messages_table(
        channels,
        lambda: DiscordClient(
            "fixture-token", FixtureRestTransport(fixtures)
        ),
        limit=100,
    )
    joined = msgs.join(
        F.broadcast(nat_dim),
        msgs.channel_id == (F.col("_dim_nk") + 100).cast("string"),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_messages"),
            F.sum(F.length("content")).cast("bigint").alias("total_chars"),
            F.countDistinct("author").cast("bigint").alias("n_authors"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q283 — Telegram outbound receipts→warehouse join: one notification
# per nation, fixture message_id nk*7+1, delivery rollup per region.
# ---------------------------------------------------------------------------
def _telegram_fixtures(nations):
    from ..sources.messaging_source import TELEGRAM_API_BASE

    fx = {}
    for nk, name in nations:
        body = {
            "chat_id": str(nk),
            "text": f"notify {name}",
            "disable_notification": False,
        }
        fx[FixtureRestTransport.key(
            "POST", f"{TELEGRAM_API_BASE}fixture-token/sendMessage",
            None, body,
        )] = (200, jdump({"ok": True, "result": {"message_id": nk * 7 + 1}}))
    return fx


@query(
    "q283_telegram_receipts_join",
    oracle="""
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_sent,
      CAST(SUM(n.n_nationkey * 7 + 1) AS BIGINT) AS sum_message_id
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q283_telegram_receipts_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Telegram): one outbound notification
    per nation through TelegramClient.send_message on a fixture wire,
    receipts distributed by telegram_send_table and rolled up per
    region. Reference parity: telegram_tool.py send_message as a
    TABLE of sends."""
    from ..sources.messaging_source import (
        TelegramClient,
        telegram_send_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _telegram_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    outbox = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("chat_id"),
        F.concat(F.lit("notify "), F.col("n_name")).alias("text"),
    )
    receipts = telegram_send_table(
        outbox,
        lambda: TelegramClient(
            "fixture-token", FixtureRestTransport(fixtures)
        ),
    )
    joined = (
        receipts.filter(F.col("ok"))
        .join(
            F.broadcast(nat_dim),
            F.col("chat_id") == F.col("_dim_nk").cast("string"),
        )
        .join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sent"),
            F.sum("message_id").cast("bigint").alias("sum_message_id"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q284 — Apollo enrichment→warehouse join: one enrich per nation
# email, match when nk%5 != 4, org vocabulary nk%7.
# ---------------------------------------------------------------------------
def _apollo_fixtures(nations):
    from ..sources.apollo_source import APOLLO_API_BASE

    fx = {}
    for nk, _name in nations:
        email = f"user{nk}@corp.example"
        body = {
            "reveal_personal_emails": False,
            "reveal_phone_number": False,
            "email": email,
        }
        if nk % 5 == 4:
            resp = {"person": None}
        else:
            resp = {
                "person": {
                    "id": f"p{nk}",
                    "name": f"Person {nk}",
                    "title": f"title{nk % 3}",
                    "organization": {
                        "name": f"org{nk % 7}",
                        "primary_domain": f"org{nk % 7}.example",
                    },
                }
            }
        fx[FixtureRestTransport.key(
            "POST", f"{APOLLO_API_BASE}/people/match", None, body
        )] = (200, jdump(resp))
    return fx


@query(
    "q284_apollo_enrich_join",
    oracle="""
    WITH enr AS (
      SELECT n.n_regionkey,
        CASE WHEN n.n_nationkey % 5 <> 4 THEN 1 ELSE 0 END AS matched,
        CASE WHEN n.n_nationkey % 5 <> 4
             THEN 'org' || CAST(n.n_nationkey % 7 AS VARCHAR) END AS org
      FROM nation n
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_lookups,
      CAST(SUM(matched) AS BIGINT) AS n_matched,
      CAST(COUNT(DISTINCT org) AS BIGINT) AS n_orgs
    FROM enr e JOIN region r ON e.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q284_apollo_enrich_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Apollo): per-nation email enrichment
    through ApolloClient.enrich_person on a fixture wire, distributed
    by apollo_enrich_table, match/org rollup per region. Reference
    parity: apollo_tool.py people-match as a TABLE."""
    from ..sources.apollo_source import ApolloClient, apollo_enrich_table

    nations = _nations(spark, sf_dir)
    fixtures = _apollo_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    emails = T(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("user"),
            F.col("n_nationkey").cast("string"),
            F.lit("@corp.example"),
        ).alias("email")
    )
    enriched = apollo_enrich_table(
        emails,
        lambda: ApolloClient("fixture-key", FixtureRestTransport(fixtures)),
    )
    joined = enriched.join(
        F.broadcast(nat_dim),
        enriched.email
        == F.concat(
            F.lit("user"),
            F.col("_dim_nk").cast("string"),
            F.lit("@corp.example"),
        ),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lookups"),
            F.sum(F.when(F.col("match_found"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_matched"),
            F.countDistinct("org_name").cast("bigint").alias("n_orgs"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q285 — Brevo CRM contacts→warehouse join: LTV attribute nk*11+5
# hydrated per nation contact, revenue rollup per region.
# ---------------------------------------------------------------------------
def _brevo_fixtures(nations):
    from ..sources.business_source import BREVO_API_BASE

    fx = {}
    for nk, _name in nations:
        ident = f"user{nk}@corp.example"
        fx[FixtureRestTransport.key(
            "GET", f"{BREVO_API_BASE}/contacts/{ident}"
        )] = (
            200,
            jdump({
                "id": 1000 + nk,
                "email": ident,
                "attributes": {"FIRSTNAME": f"U{nk}", "LTV": nk * 11 + 5},
            }),
        )
    return fx


@query(
    "q285_brevo_contacts_join",
    oracle="""
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_contacts,
      CAST(SUM(n.n_nationkey * 11 + 5) AS BIGINT) AS total_ltv,
      CAST(MAX(1000 + n.n_nationkey) AS BIGINT) AS max_contact_id
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q285_brevo_contacts_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Brevo): per-nation CRM contact
    hydration through BrevoClient.get_contact on a fixture wire,
    distributed by brevo_contacts_table, LTV rollup per region.
    Reference parity: brevo_tool.py get_contact as a TABLE."""
    from ..sources.business_source import BrevoClient, brevo_contacts_table

    nations = _nations(spark, sf_dir)
    fixtures = _brevo_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    ids = T(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("user"),
            F.col("n_nationkey").cast("string"),
            F.lit("@corp.example"),
        ).alias("identifier")
    )
    contacts = brevo_contacts_table(
        ids,
        lambda: BrevoClient("fixture-key", FixtureRestTransport(fixtures)),
    )
    joined = contacts.join(
        F.broadcast(nat_dim),
        contacts.identifier
        == F.concat(
            F.lit("user"),
            F.col("_dim_nk").cast("string"),
            F.lit("@corp.example"),
        ),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_contacts"),
            F.sum("ltv").cast("bigint").alias("total_ltv"),
            F.max("contact_id").cast("bigint").alias("max_contact_id"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q286 — Cal.com bookings→warehouse join: event type nk+1 per nation,
# (nk%3)+1 bookings, accepted when (nk+i)%2==0.
# ---------------------------------------------------------------------------
def _calcom_fixtures(nations):
    from ..sources.business_source import CALCOM_API_BASE

    fx = {}
    for nk, _name in nations:
        bookings = [
            {
                "id": nk * 10 + i,
                "status": "accepted" if (nk + i) % 2 == 0 else "cancelled",
                "startTime": f"2026-08-{(i % 7) + 1:02d}T09:00:00Z",
            }
            for i in range(1, (nk % 3) + 2)
        ]
        fx[FixtureRestTransport.key(
            "GET", f"{CALCOM_API_BASE}/bookings",
            {"limit": 50, "eventTypeId": nk + 1},
        )] = (200, jdump({"bookings": bookings}))
    return fx


@query(
    "q286_calcom_bookings_join",
    oracle="""
    WITH bk AS (
      SELECT n.n_regionkey, n.n_nationkey * 10 + i.i AS booking_id,
        CASE WHEN (n.n_nationkey + i.i) % 2 = 0
             THEN 'accepted' ELSE 'cancelled' END AS status
      FROM nation n CROSS JOIN (VALUES (1), (2), (3)) AS i(i)
      WHERE i.i <= (n.n_nationkey % 3) + 1
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_bookings,
      CAST(SUM(CASE WHEN status = 'accepted' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_accepted,
      CAST(MAX(booking_id) AS BIGINT) AS max_booking_id
    FROM bk JOIN region r ON bk.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q286_calcom_bookings_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Cal.com): per-nation event-type
    booking lists through CalcomClient.list_bookings on a fixture
    wire, distributed by calcom_bookings_table, acceptance rollup per
    region. Reference parity: calcom_tool.py list_bookings as a
    TABLE."""
    from ..sources.business_source import (
        CalcomClient,
        calcom_bookings_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _calcom_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    event_types = T(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 1).cast("bigint").alias("event_type_id")
    )
    bookings = calcom_bookings_table(
        event_types,
        lambda: CalcomClient("fixture-key", FixtureRestTransport(fixtures)),
        limit=50,
    )
    joined = bookings.join(
        F.broadcast(nat_dim),
        bookings.event_type_id == (F.col("_dim_nk") + 1).cast("bigint"),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bookings"),
            F.sum(F.when(F.col("status") == "accepted", 1).otherwise(0))
            .cast("bigint")
            .alias("n_accepted"),
            F.max("booking_id").cast("bigint").alias("max_booking_id"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q287 — Razorpay payments→warehouse join: the paged payments feed
# (page p holds nations nk%5==p, 2 payments each) joined back to
# nation via the buyer email, captured revenue per region+currency.
# ---------------------------------------------------------------------------
def _razorpay_fixtures(nations):
    from ..sources.business_source import RAZORPAY_API_BASE

    fx = {}
    for p in range(5):
        items = []
        for nk, _name in nations:
            if nk % 5 != p:
                continue
            for i in (1, 2):
                items.append({
                    "id": f"pay_{nk}_{i}",
                    "amount": nk * 1000 + i * 50,
                    "currency": "USD" if nk % 2 == 0 else "INR",
                    "status": "captured" if (nk + i) % 2 == 0 else "failed",
                    "method": "card",
                    "email": f"buyer{nk}@pay.example",
                    "created_at": 1700000000 + nk,
                })
        fx[FixtureRestTransport.key(
            "GET", f"{RAZORPAY_API_BASE}/payments",
            {"count": 100, "skip": p * 100},
        )] = (200, jdump({"count": len(items), "items": items}))
    return fx


@query(
    "q287_razorpay_payments_join",
    oracle="""
    WITH pays AS (
      SELECT n.n_regionkey,
        CASE WHEN n.n_nationkey % 2 = 0 THEN 'USD' ELSE 'INR' END
          AS currency,
        n.n_nationkey * 1000 + i.i * 50 AS amount,
        CASE WHEN (n.n_nationkey + i.i) % 2 = 0
             THEN 'captured' ELSE 'failed' END AS status
      FROM nation n CROSS JOIN (VALUES (1), (2)) AS i(i)
    )
    SELECT r.r_name AS region, currency,
      CAST(COUNT(*) AS BIGINT) AS n_payments,
      CAST(SUM(CASE WHEN status = 'captured' THEN amount ELSE 0 END)
        AS BIGINT) AS captured_amount
    FROM pays p JOIN region r ON p.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, currency
    ORDER BY region ASC, currency ASC
    """,
)
def q287_razorpay_payments_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Razorpay): the paged payments feed
    through RazorpayClient.list_payments on a fixture wire,
    distributed by razorpay_payments_table over a table of page
    numbers, joined back to nation via the buyer email and rolled up
    per region+currency. Reference parity: razorpay_tool.py
    list_payments as a paged TABLE."""
    from ..sources.business_source import (
        RazorpayClient,
        razorpay_payments_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _razorpay_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    pages = spark.range(5).select(F.col("id").cast("bigint").alias("page"))
    pays = razorpay_payments_table(
        pages,
        lambda: RazorpayClient(
            "fixture-key", "fixture-secret", FixtureRestTransport(fixtures)
        ),
        count=100,
    )
    joined = pays.join(
        F.broadcast(nat_dim),
        pays.email
        == F.concat(
            F.lit("buyer"),
            F.col("_dim_nk").cast("string"),
            F.lit("@pay.example"),
        ),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"), "currency")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_payments"),
            F.sum(
                F.when(F.col("status") == "captured", F.col("amount"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("captured_amount"),
        )
        .orderBy("region", "currency")
    )


# ---------------------------------------------------------------------------
# q288 — Google Maps geocode→warehouse join: one address per nation,
# arithmetic lat/lng, ZERO_RESULTS when nk%7==3, coverage per region.
# ---------------------------------------------------------------------------
def _maps_fixtures(nations):
    from ..sources.google_maps_source import GEOCODE_URL

    fx = {}
    for nk, name in nations:
        addr = f"{name} city center"
        if nk % 7 == 3:
            resp = {"status": "ZERO_RESULTS", "results": []}
        else:
            resp = {
                "status": "OK",
                "results": [{
                    "formatted_address": f"{addr}, Earth",
                    "geometry": {
                        "location": {
                            "lat": nk * 1.5 - 10.0,
                            "lng": nk * 3.0 - 30.0,
                        },
                        "location_type": "ROOFTOP",
                    },
                    "place_id": f"place{nk}",
                }],
            }
        fx[FixtureRestTransport.key(
            "GET", GEOCODE_URL, {"address": addr}
        )] = (200, jdump(resp))
    return fx


@query(
    "q288_maps_geocode_join",
    oracle="""
    WITH geo AS (
      SELECT n.n_regionkey,
        CASE WHEN n.n_nationkey % 7 <> 3
             THEN n.n_nationkey * 1.5 - 10.0 END AS lat
      FROM nation n
    )
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_addresses,
      CAST(COUNT(lat) AS BIGINT) AS n_geocoded,
      CAST(ROUND(SUM(lat), 2) AS DOUBLE) AS sum_lat
    FROM geo g JOIN region r ON g.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q288_maps_geocode_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Google Maps): per-nation geocoding
    through GoogleMapsClient.geocode on a fixture wire (including a
    ZERO_RESULTS nation), distributed by maps_geocode_table, geocode
    coverage per region. Reference parity: google_maps_tool.py
    geocode as a TABLE. Lat values are exact binary fractions
    (k·1.5−10), so the SUM is engine-exact."""
    from ..sources.google_maps_source import (
        GoogleMapsClient,
        maps_geocode_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _maps_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    addresses = T(spark, sf_dir, "nation").select(
        F.concat(F.col("n_name"), F.lit(" city center")).alias("address")
    )
    geo = maps_geocode_table(
        addresses,
        lambda: GoogleMapsClient(
            "fixture-key", FixtureRestTransport(fixtures)
        ),
    )
    joined = geo.join(
        F.broadcast(nat_dim),
        geo.address == F.concat(F.col("_dim_name"), F.lit(" city center")),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_addresses"),
            F.count("lat").cast("bigint").alias("n_geocoded"),
            F.round(F.sum("lat"), 2).cast("double").alias("sum_lat"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q289 — Google Docs corpus→warehouse join: doc-{nk} per nation,
# ((nk%3)+1) paragraphs of ((nk%5)+1) chars + newline each.
# ---------------------------------------------------------------------------
def _docs_fixtures(nations):
    from ..sources.google_docs_source import GOOGLE_DOCS_API_BASE

    fx = {}
    for nk, _name in nations:
        did = f"doc-{nk}"
        content = [
            {
                "paragraph": {
                    "elements": [
                        {"textRun": {"content": "x" * ((nk % 5) + 1) + "\n"}}
                    ]
                }
            }
            for _ in range((nk % 3) + 1)
        ]
        fx[FixtureRestTransport.key(
            "GET", f"{GOOGLE_DOCS_API_BASE}/documents/{did}"
        )] = (
            200,
            jdump({
                "documentId": did,
                "title": f"report {nk}",
                "body": {"content": content},
            }),
        )
    return fx


@query(
    "q289_google_docs_join",
    oracle="""
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(((n.n_nationkey % 3) + 1) * ((n.n_nationkey % 5) + 2))
        AS BIGINT) AS total_chars
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q289_google_docs_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (Google Docs): per-nation document
    hydration through GoogleDocsClient.get_document on a fixture
    wire, plain-text lengths extracted by the body-walk the reference
    tool uses, distributed by docs_documents_table. Reference parity:
    google_docs_tool.py get_document as a TABLE."""
    from ..sources.google_docs_source import (
        GoogleDocsClient,
        docs_documents_table,
    )

    nations = _nations(spark, sf_dir)
    fixtures = _docs_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    doc_ids = T(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("doc-"), F.col("n_nationkey").cast("string")
        ).alias("document_id")
    )
    docs = docs_documents_table(
        doc_ids,
        lambda: GoogleDocsClient(
            "fixture-token", FixtureRestTransport(fixtures)
        ),
    )
    joined = docs.join(
        F.broadcast(nat_dim),
        docs.document_id
        == F.concat(F.lit("doc-"), F.col("_dim_nk").cast("string")),
    ).join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q290 — outbound email receipts→warehouse join: one digest per
# nation through the Resend wire, receipt ids re-{nk}.
# ---------------------------------------------------------------------------
def _email_fixtures(nations):
    from ..sources.email_source import RESEND_API_BASE

    fx = {}
    for nk, name in nations:
        payload = {
            "from": "noreply@corp.example",
            "to": [f"ops{nk}@corp.example"],
            "subject": f"digest {name}",
            "html": "<p>ok</p>",
        }
        fx[FixtureRestTransport.key(
            "POST", f"{RESEND_API_BASE}/emails", None, payload
        )] = (200, jdump({"id": f"re-{nk}"}))
    return fx


@query(
    "q290_email_receipts_join",
    oracle="""
    SELECT r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_sent,
      CAST(SUM(LENGTH('re-' || CAST(n.n_nationkey AS VARCHAR)))
        AS BIGINT) AS sum_id_len
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region ASC
    """,
)
def q290_email_receipts_join(spark, sf_dir):
    """CONNECTOR→WAREHOUSE JOIN (outbound email): one digest per
    nation through EmailSender's Resend wire on fixtures, delivery
    receipts distributed by email_send_table and rolled up per
    region. Reference parity: email_tool.py send_email as a TABLE of
    sends."""
    from ..sources.email_source import EmailSender, email_send_table

    nations = _nations(spark, sf_dir)
    fixtures = _email_fixtures(nations)
    nat_dim, region = _dims(spark, sf_dir)
    outbox = T(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("ops"),
            F.col("n_nationkey").cast("string"),
            F.lit("@corp.example"),
        ).alias("to"),
        F.concat(F.lit("digest "), F.col("n_name")).alias("subject"),
        F.lit("<p>ok</p>").alias("html"),
    )
    receipts = email_send_table(
        outbox,
        lambda: EmailSender(
            FixtureRestTransport(fixtures),
            resend_api_key="fixture-key",
            from_email="noreply@corp.example",
        ),
        provider="resend",
    )
    joined = (
        receipts.filter(F.col("success"))
        .join(
            F.broadcast(nat_dim),
            receipts["to"]
            == F.concat(
                F.lit("ops"),
                F.col("_dim_nk").cast("string"),
                F.lit("@corp.example"),
            ),
        )
        .join(F.broadcast(region), F.col("_dim_rk") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sent"),
            F.sum(F.length("message_id")).cast("bigint").alias("sum_id_len"),
        )
        .orderBy("region")
    )
