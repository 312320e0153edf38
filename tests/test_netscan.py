"""Network-intelligence scanner family tests — pure analysis parity
with the reference scanners (http_headers_scanner / tech_stack_detector
/ ssl_tls_scanner / port_scanner / dns_security_scanner /
subdomain_enumerator / risk_scorer), live tiers exercised against
loopback stdlib servers, and the distributed + columnar Spark tiers."""

from __future__ import annotations

import json
import shutil
import socket
import subprocess
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from aden_hive_fork_spark.sources.netscan import (
    FixtureResolver,
    page_transport,
    analyze_ct_entries,
    analyze_security_headers,
    analyze_tls,
    classify_open_port,
    dns_security_scan,
    http_headers_scan,
    port_scan,
    risk_grade_columns,
    risk_score,
    scan_headers_table,
    score_category,
    score_to_grade,
    ssl_tls_scan,
    subdomain_enumerate,
    tech_stack_detect,
    ALL_CHECKS,
)
from aden_hive_fork_spark.sources.search_source import FixtureGetTransport


# ---------------------------------------------------------------------------
# loopback page server: one vhost with tunable headers + HTML + probes
# ---------------------------------------------------------------------------
SECURE_HEADERS = [
    ("Strict-Transport-Security", "max-age=31536000; includeSubDomains"),
    ("Content-Security-Policy", "default-src 'self'"),
    ("X-Frame-Options", "DENY"),
    ("X-Content-Type-Options", "nosniff"),
    ("Referrer-Policy", "strict-origin-when-cross-origin"),
    ("Permissions-Policy", "camera=()"),
]

TECH_HTML = b"""<html><head>
<script src="/static/jquery-3.6.0.min.js"></script>
<script>gtag('config', 'G-XYZ');</script>
<meta name="generator" content="WordPress 6.4">
</head><body class="wp-content">hello</body></html>
"""


class _PageHandler(BaseHTTPRequestHandler):
    # suppress the auto "Server: BaseHTTP/..." header so leaky-header
    # assertions see only the headers each route sends explicitly
    def send_response(self, code, message=None):
        self.send_response_only(code, message)
        self.send_header("Date", self.date_time_string())

    def do_GET(self):
        if self.path == "/leaky":
            self.send_response(200)
            self.send_header("Server", "Apache/2.4.57")
            self.send_header("X-Powered-By", "PHP/8.1.2")
            self.send_header("X-XSS-Protection", "1; mode=block")
            self.end_headers()
            self.wfile.write(b"ok")
        elif self.path == "/secure":
            self.send_response(200)
            for k, v in SECURE_HEADERS:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(b"ok")
        elif self.path == "/tech":
            self.send_response(200)
            self.send_header("Server", "nginx/1.25.3")
            self.send_header("X-Powered-By", "PHP/8.1.2")
            self.send_header("Via", "1.1 varnish")
            self.send_header(
                "Set-Cookie", "PHPSESSID=abc123; Secure; HttpOnly; SameSite=Lax"
            )
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(TECH_HTML)
        elif self.path == "/tech/robots.txt":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"User-agent: *\n")
        elif self.path == "/tech/wp-admin/":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"login")
        elif self.path == "/tech/admin/":
            self.send_response(403)
            self.end_headers()
        else:
            self.send_response(404)
            self.end_headers()

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def page_server():
    httpd = HTTPServer(("127.0.0.1", 0), _PageHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


# ---------------------------------------------------------------------------
# §1 security headers
# ---------------------------------------------------------------------------
def test_headers_scan_live_secure(page_server):
    out = http_headers_scan(f"{page_server}/secure")
    assert out["status_code"] == 200
    assert sorted(out["headers_present"]) == sorted(
        k for k, _ in SECURE_HEADERS
    )
    assert out["headers_missing"] == []
    assert out["leaky_headers"] == []
    assert out["grade_input"] == {
        "hsts": True, "csp": True, "x_frame_options": True,
        "x_content_type_options": True, "referrer_policy": True,
        "permissions_policy": True, "no_leaky_headers": True,
    }


def test_headers_scan_live_leaky(page_server):
    out = http_headers_scan(f"{page_server}/leaky")
    # all six OWASP headers missing, with severity + remediation
    assert {m["header"] for m in out["headers_missing"]} == {
        "Strict-Transport-Security", "Content-Security-Policy",
        "X-Frame-Options", "X-Content-Type-Options", "Referrer-Policy",
        "Permissions-Policy",
    }
    by_name = {m["header"]: m for m in out["headers_missing"]}
    assert by_name["Strict-Transport-Security"]["severity"] == "high"
    assert by_name["X-Frame-Options"]["severity"] == "medium"
    assert "Strict-Transport-Security" in by_name[
        "Strict-Transport-Security"]["remediation"]
    leaky = {l["header"]: l["value"] for l in out["leaky_headers"]}
    assert leaky["Server"] == "Apache/2.4.57"
    assert leaky["X-Powered-By"] == "PHP/8.1.2"
    assert "X-XSS-Protection (deprecated)" in out["headers_present"]
    assert out["grade_input"]["no_leaky_headers"] is False


def test_headers_scan_connection_failed():
    # closed loopback port → reference "Connection failed" envelope
    out = http_headers_scan("http://127.0.0.1:9", page_transport_short())
    assert "error" in out and out["error"].startswith("Connection failed")


def page_transport_short():
    from aden_hive_fork_spark.sources.netscan import page_transport

    return page_transport(timeout=2.0)


def test_headers_scan_auto_https_prefix():
    seen = []

    def transport(url, follow):
        seen.append(url)
        return {"status": 200, "url": url, "headers": [], "body": b""}

    http_headers_scan("example.com", transport)
    assert seen == ["https://example.com"]


# ---------------------------------------------------------------------------
# §2 tech stack
# ---------------------------------------------------------------------------
def test_tech_stack_detect_live(page_server):
    out = tech_stack_detect(f"{page_server}/tech")
    assert out["server"] == {
        "name": "nginx", "version": "1.25.3", "raw": "nginx/1.25.3"
    }
    assert out["framework"] == "PHP/8.1.2"  # from X-Powered-By
    assert out["language"] == "PHP"
    assert out["cms"] == "WordPress"  # wp-content beats meta generator
    assert "jQuery 3.6.0" in out["javascript_libraries"]
    assert out["analytics"] == ["Google Analytics"]
    assert out["cdn"] == "Varnish"  # Via: 1.1 varnish
    assert out["robots_txt"] is True
    assert out["security_txt"] is False
    assert "/admin/" not in out["interesting_paths"]  # 403 not interesting
    assert out["cookies"] == [
        {"name": "PHPSESSID", "secure": True, "httponly": True,
         "samesite": "Lax"}
    ]
    gi = out["grade_input"]
    assert gi["server_version_hidden"] is False
    assert gi["framework_version_hidden"] is False
    assert gi["cookies_secure"] is True and gi["cookies_httponly"] is True


def test_tech_stack_error_envelope():
    from aden_hive_fork_spark.sources.netscan import page_transport

    out = tech_stack_detect("http://127.0.0.1:9", page_transport(timeout=2.0))
    assert "error" in out and out["error"].startswith("Connection failed")


# ---------------------------------------------------------------------------
# §3 SSL/TLS — pure analysis + live loopback handshake
# ---------------------------------------------------------------------------
GOOD_CERT = {
    "subject": ((("commonName", "example.com"),),),
    "issuer": ((("organizationName", "Trusted CA"),),),
    "notBefore": "Jan  1 00:00:00 2026 GMT",
    "notAfter": "Jan  1 00:00:00 2027 GMT",
    "subjectAltName": (("DNS", "example.com"), ("DNS", "www.example.com")),
}
NOW = datetime(2026, 8, 14, tzinfo=timezone.utc)


def facts(**over):
    base = {
        "verify_error": None,
        "tls_version": "TLSv1.3",
        "cipher_name": "TLS_AES_256_GCM_SHA384",
        "cipher_bits": 256,
        "cert_der": b"\x30\x82",
        "cert_dict": GOOD_CERT,
    }
    base.update(over)
    return base


def test_tls_clean_scan():
    out = analyze_tls("example.com", 443, facts(), now=NOW)
    assert out["issues"] == []
    assert out["certificate"]["san"] == ["example.com", "www.example.com"]
    assert out["certificate"]["days_until_expiry"] == 140
    assert out["grade_input"] == {
        "tls_version_ok": True, "cert_valid": True,
        "cert_expiring_soon": False, "strong_cipher": True,
        "self_signed": False,
    }


def test_tls_findings_matrix():
    # insecure version
    out = analyze_tls("h", 443, facts(tls_version="TLSv1.1"), now=NOW)
    assert any("Insecure TLS version" in i["finding"] for i in out["issues"])
    assert out["grade_input"]["tls_version_ok"] is False
    # weak cipher + short key
    out = analyze_tls(
        "h", 443, facts(cipher_name="RC4-MD5", cipher_bits=40), now=NOW
    )
    fs = [i["finding"] for i in out["issues"]]
    assert any("Weak cipher suite" in f for f in fs)
    assert any("too short: 40 bits" in f for f in fs)
    # expired
    expired = dict(GOOD_CERT, notAfter="Jan  1 00:00:00 2026 GMT")
    out = analyze_tls("h", 443, facts(cert_dict=expired), now=NOW)
    assert any(i["finding"] == "SSL certificate has expired"
               and i["severity"] == "critical" for i in out["issues"])
    # expiring soon
    soon = dict(GOOD_CERT, notAfter="Sep  1 00:00:00 2026 GMT")
    out = analyze_tls("h", 443, facts(cert_dict=soon), now=NOW)
    assert any("expires in 18 days" in i["finding"] for i in out["issues"])
    assert out["grade_input"]["cert_expiring_soon"] is True
    # self-signed
    ss = dict(GOOD_CERT, issuer=GOOD_CERT["subject"])
    out = analyze_tls("h", 443, facts(cert_dict=ss), now=NOW)
    assert any("Self-signed" in i["finding"] for i in out["issues"])
    assert out["grade_input"]["self_signed"] is True


def test_tls_scan_error_envelopes():
    def refused(h, p):
        raise ConnectionRefusedError()

    out = ssl_tls_scan("https://example.com/x", connect=refused)
    assert out["error"].startswith("Connection to example.com:443 refused")

    def timeout(h, p):
        raise TimeoutError()

    assert "timed out" in ssl_tls_scan("example.com", connect=timeout)["error"]


@pytest.mark.skipif(shutil.which("openssl") is None,
                    reason="openssl CLI unavailable")
def test_tls_live_loopback_self_signed(tmp_path):
    """Real stdlib handshake against a loopback TLS server with a
    self-signed cert: exercises the verify-fail → unverified-reconnect
    path and the self-signed finding end to end."""
    import ssl

    key, crt = str(tmp_path / "k.pem"), str(tmp_path / "c.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", crt, "-days", "5",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(crt, key)
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            try:
                tls = ctx.wrap_socket(conn, server_side=True)
                tls.close()
            except Exception:
                pass

    threading.Thread(target=serve, daemon=True).start()
    try:
        out = ssl_tls_scan("localhost", port)
        assert "error" not in out
        assert out["tls_version"].startswith("TLSv1.")
        assert any("verification failed" in i["finding"]
                   for i in out["issues"])
        assert out["certificate"]["self_signed"] is True
        assert out["grade_input"]["self_signed"] is True
        assert len(out["certificate"]["sha256_fingerprint"]) == 64
        # cert expires in 5 days → expiring-soon finding too
        assert out["grade_input"]["cert_expiring_soon"] is True
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# §4 port scan
# ---------------------------------------------------------------------------
def test_port_classification():
    db = classify_open_port(5432)
    assert db["service"] == "PostgreSQL" and db["severity"] == "high"
    assert "exposed to internet" in db["finding"]
    admin = classify_open_port(3389, "banner")
    assert admin["service"] == "RDP" and "admin port" in admin["finding"]
    legacy = classify_open_port(21)
    assert legacy["severity"] == "medium" and "Legacy" in legacy["finding"]
    plain = classify_open_port(8080)
    assert "finding" not in plain and plain["service"] == "HTTP-Alt"


def test_port_scan_live_loopback():
    # one silent listener, one banner listener, one closed port
    silent = socket.create_server(("127.0.0.1", 0))
    banner_srv = socket.create_server(("127.0.0.1", 0))
    p_silent = silent.getsockname()[1]
    p_banner = banner_srv.getsockname()[1]
    closed = socket.socket()
    closed.bind(("127.0.0.1", 0))
    p_closed = closed.getsockname()[1]
    closed.close()  # bound then released → refused

    def banner_loop():
        while True:
            try:
                conn, _ = banner_srv.accept()
            except OSError:
                return
            conn.sendall(b"SSH-2.0-TestServer\r\n")
            conn.close()

    threading.Thread(target=banner_loop, daemon=True).start()
    silent_accept = threading.Thread(
        target=lambda: [c[0].close() for c in iter(
            lambda: _accept_or_none(silent), None)],
        daemon=True,
    )
    silent_accept.start()
    try:
        out = port_scan(
            "localhost",
            ports=f"{p_silent},{p_banner},{p_closed}",
            timeout=2.0,
        )
        assert out["ip"] == "127.0.0.1"
        assert out["ports_scanned"] == 3
        open_ports = {p["port"]: p for p in out["open_ports"]}
        assert set(open_ports) == {p_silent, p_banner}
        assert open_ports[p_banner]["banner"] == "SSH-2.0-TestServer"
        assert out["closed_ports"] == [p_closed]
        gi = out["grade_input"]
        assert gi["no_database_ports_exposed"] is True
        assert gi["only_web_ports"] is False
    finally:
        silent.close()
        banner_srv.close()


def _accept_or_none(srv):
    try:
        return srv.accept()
    except OSError:
        return None


def test_port_scan_errors():
    assert "Invalid port list" in port_scan("h", ports="80,abc")["error"]

    def no_resolve(h):
        raise socket.gaierror()

    out = port_scan("nope.invalid", ports="80", resolve=no_resolve)
    assert out["error"] == "Could not resolve hostname: nope.invalid"


def test_port_scan_grade_input_risky():
    # fixture probe: "open" for a db port and an admin port
    def probe(ip, port, timeout):
        return {"open": port in (5432, 3389), "banner": ""}

    out = port_scan("localhost", ports="5432,3389,80", probe=probe,
                    resolve=lambda h: "127.0.0.1")
    gi = out["grade_input"]
    assert gi["no_database_ports_exposed"] is False
    assert gi["no_admin_ports_exposed"] is False
    assert gi["no_legacy_ports_exposed"] is True


# ---------------------------------------------------------------------------
# §5 DNS security
# ---------------------------------------------------------------------------
def hardened_records(d="example.com"):
    return {
        (d, "TXT"): ["v=spf1 include:_spf.example.com -all"],
        (f"_dmarc.{d}", "TXT"): ["v=DMARC1; p=reject; rua=mailto:d@x.com"],
        (f"google._domainkey.{d}", "TXT"): ["v=DKIM1; k=rsa; p=MIIB"],
        (d, "DNSKEY"): ["257 3 13 mdsswUyr..."],
        (d, "MX"): ["10 mail.example.com."],
        (d, "CAA"): ['0 issue "letsencrypt.org"'],
        (d, "NS"): ["ns1.example.com.", "ns2.example.com."],
    }


def test_dns_scan_hardened_domain():
    out = dns_security_scan(
        "https://example.com/", resolver=FixtureResolver(hardened_records())
    )
    assert out["domain"] == "example.com"
    assert out["spf"] == {
        "present": True,
        "record": "v=spf1 include:_spf.example.com -all",
        "policy": "hardfail", "issues": [],
    }
    assert out["dmarc"]["policy"] == "reject"
    assert out["dkim"]["selectors_found"] == ["google"]
    assert out["dnssec"]["enabled"] is True
    assert out["mx_records"] == ["10 mail.example.com."]
    assert out["zone_transfer"]["vulnerable"] is False
    assert out["grade_input"] == {
        "spf_present": True, "spf_strict": True, "dmarc_present": True,
        "dmarc_enforcing": True, "dkim_found": True,
        "dnssec_enabled": True, "zone_transfer_blocked": True,
    }


def test_dns_scan_weak_policies():
    recs = hardened_records()
    recs[("example.com", "TXT")] = ["v=spf1 include:x ~all"]
    recs[("_dmarc.example.com", "TXT")] = ["v=DMARC1; p=none"]
    out = dns_security_scan("example.com", resolver=FixtureResolver(recs))
    assert out["spf"]["policy"] == "softfail"
    assert any("softfail" in i for i in out["spf"]["issues"])
    assert out["dmarc"]["policy"] == "none"
    assert any("p=quarantine or p=reject" in i
               for i in out["dmarc"]["issues"])
    gi = out["grade_input"]
    assert gi["spf_strict"] is False and gi["dmarc_enforcing"] is False


def test_dns_scan_unconfigured_domain():
    out = dns_security_scan("bare.com", resolver=FixtureResolver({}))
    assert out["spf"]["present"] is False
    assert "No SPF record found" in out["spf"]["issues"][0]
    assert out["dmarc"]["present"] is False
    assert out["dkim"]["selectors_found"] == []
    assert len(out["dkim"]["selectors_missing"]) == 8
    assert out["dnssec"]["enabled"] is False
    assert out["zone_transfer"] == {
        "vulnerable": False, "error": "Could not resolve NS records"
    }


def test_dns_zone_transfer_vulnerable():
    out = dns_security_scan(
        "example.com",
        resolver=FixtureResolver(hardened_records()),
        xfr=lambda ns, d: 42 if ns == "ns1.example.com." else None,
    )
    zt = out["zone_transfer"]
    assert zt["vulnerable"] is True and zt["record_count"] == 42
    assert zt["severity"] == "critical"
    assert out["grade_input"]["zone_transfer_blocked"] is False


def test_dns_missing_dependency_envelope():
    # sandbox has no dnspython → reference's exact error envelope
    out = dns_security_scan("example.com")
    assert out == {
        "error": (
            "dnspython is not installed. Install it with: "
            "pip install dnspython"
        )
    }


# ---------------------------------------------------------------------------
# §6 subdomain enumeration
# ---------------------------------------------------------------------------
CT_ENTRIES = [
    {"name_value": "www.example.com\nexample.com"},
    {"name_value": "*.example.com"},  # wildcard filtered
    {"name_value": "staging.example.com"},
    {"name_value": "admin.example.com"},
    {"name_value": "API.example.com"},  # lowercased
    {"name_value": "other-domain.org"},  # not ours
]


def test_ct_analysis():
    out = analyze_ct_entries("example.com", CT_ENTRIES)
    assert out["subdomains"] == [
        "admin.example.com", "api.example.com", "example.com",
        "staging.example.com", "www.example.com",
    ]
    reasons = {i["subdomain"]: i for i in out["interesting"]}
    assert reasons["staging.example.com"]["severity"] == "medium"
    assert reasons["admin.example.com"]["severity"] == "high"
    assert reasons["api.example.com"]["severity"] == "low"
    gi = out["grade_input"]
    assert gi["no_dev_staging_exposed"] is False
    assert gi["no_admin_exposed"] is False
    assert gi["reasonable_surface_area"] is True


def test_subdomain_enumerate_fixture_transport():
    t = FixtureGetTransport()
    t.fixtures[FixtureGetTransport.key(
        "https://crt.sh/", {"q": "%.example.com", "output": "json"}
    )] = (200, json.dumps(CT_ENTRIES).encode())
    out = subdomain_enumerate("https://example.com", t)
    assert out["total_found"] == 5
    assert out["source"] == "crt.sh (Certificate Transparency)"
    # error paths
    t2 = FixtureGetTransport()  # no fixture → 404
    out = subdomain_enumerate("example.com", t2)
    assert out["error"] == "crt.sh returned HTTP 404"
    t3 = FixtureGetTransport()
    t3.fixtures[FixtureGetTransport.key(
        "https://crt.sh/", {"q": "%.x.com", "output": "json"}
    )] = (200, b"<html>")
    assert "CT log query failed" in subdomain_enumerate("x.com", t3)["error"]


# ---------------------------------------------------------------------------
# §7 risk scorer — reference arithmetic parity
# ---------------------------------------------------------------------------
def test_score_to_grade_bounds():
    assert [score_to_grade(s) for s in (100, 90, 89, 75, 74, 60, 59, 40, 39, 0)
            ] == ["A", "A", "B", "B", "C", "C", "D", "D", "F", "F"]


def test_score_category_rules():
    checks = ALL_CHECKS["ssl_tls"]
    # all good → 100, no findings
    gi = {"tls_version_ok": True, "cert_valid": True,
          "cert_expiring_soon": False, "strong_cipher": True,
          "self_signed": False}
    assert score_category(gi, checks) == (100, [])
    # invert semantics: self_signed=True loses its 15 points
    gi2 = dict(gi, self_signed=True)
    score, findings = score_category(gi2, checks)
    assert score == 85 and findings == ["Self-signed certificate detected"]
    # missing key → half credit, no finding
    gi3 = {k: v for k, v in gi.items() if k != "cert_valid"}
    score, findings = score_category(gi3, checks)
    assert score == 85 and findings == []


def test_risk_score_full_and_skipped():
    perfect_headers = {"grade_input": {
        "hsts": True, "csp": True, "x_frame_options": True,
        "x_content_type_options": True, "referrer_policy": True,
        "permissions_policy": True, "no_leaky_headers": True}}
    bad_ssl = {"grade_input": {
        "tls_version_ok": False, "cert_valid": False,
        "cert_expiring_soon": True, "strong_cipher": False,
        "self_signed": True}}
    out = risk_score(ssl_results=bad_ssl, headers_results=perfect_headers)
    assert out["categories"]["ssl_tls"]["score"] == 0
    assert out["categories"]["ssl_tls"]["grade"] == "F"
    assert out["categories"]["http_headers"]["score"] == 100
    # only two categories scanned, equal 0.20 weights → mean
    assert out["overall_score"] == 50
    assert out["overall_grade"] == "D"
    skipped = out["categories"]["dns_security"]
    assert skipped["skipped"] is True and skipped["grade"] == "N/A"
    # worst category's findings first
    assert out["top_risks"][0].endswith("(Ssl Tls: F)")
    assert len(out["top_risks"]) == 5


def test_risk_score_json_string_inputs():
    js = json.dumps({"grade_input": {
        "hsts": True, "csp": False, "x_frame_options": True,
        "x_content_type_options": True, "referrer_policy": True,
        "permissions_policy": True, "no_leaky_headers": True}})
    out = risk_score(headers_results=js)
    assert out["categories"]["http_headers"]["score"] == 80
    assert risk_score(headers_results="not json")["categories"][
        "http_headers"]["skipped"] is True
    assert risk_score()["overall_score"] == 0


# ---------------------------------------------------------------------------
# §8 Spark tiers — columnar grading + distributed header scan
# ---------------------------------------------------------------------------
def test_risk_grade_columns_matches_driver_scorer(spark):
    rows = [
        # (hsts, csp, xfo, xcto, rp, pp, nlh, tls_ok, valid, expiring, strong, selfs)
        (True, True, True, True, True, True, True,
         True, True, False, True, False),
        (False, False, True, True, False, True, False,
         True, False, True, False, True),
        (True, None, True, False, True, False, True,
         False, True, False, True, False),
    ]
    cols = ["hsts", "csp", "x_frame_options", "x_content_type_options",
            "referrer_policy", "permissions_policy", "no_leaky_headers",
            "tls_version_ok", "cert_valid", "cert_expiring_soon",
            "strong_cipher", "self_signed"]
    df = spark.createDataFrame(rows, cols)
    out = risk_grade_columns(df, categories=["http_headers", "ssl_tls"])
    got = [r.asDict() for r in out.collect()]
    for row, res in zip(rows, got):
        gi = dict(zip(cols, row))
        h_score, _ = score_category(gi, ALL_CHECKS["http_headers"])
        s_score, _ = score_category(gi, ALL_CHECKS["ssl_tls"])
        assert res["http_headers_score"] == h_score
        assert res["ssl_tls_score"] == s_score
        assert res["http_headers_grade"] == score_to_grade(h_score)
        # equal weights → overall is the half-up-rounded mean
        exact = (h_score * 20 + s_score * 20) / 40
        assert res["overall_score"] == int(exact + 0.5)
        assert res["overall_grade"] == score_to_grade(res["overall_score"])


def test_risk_grade_columns_missing_category_half_credit(spark):
    df = spark.createDataFrame([(True,)], ["hsts"])
    out = risk_grade_columns(df, categories=["http_headers"]).collect()[0]
    # hsts earns 20; the six absent checks earn half credit: 10+7+7+5+5+5
    assert out["http_headers_score"] == 59
    assert out["http_headers_grade"] == "D"


def test_risk_grade_columns_plan_is_codegen_only(spark):
    df = spark.createDataFrame([(True, False)], ["hsts", "csp"])
    plan = risk_grade_columns(
        df, categories=["http_headers"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only column arithmetic


def test_scan_headers_table_distributed(spark, page_server):
    urls = spark.createDataFrame(
        [(f"{page_server}/secure",), (f"{page_server}/leaky",),
         ("http://127.0.0.1:9/dead",)],
        ["url"],
    )
    out = {r["url"]: r.asDict() for r in scan_headers_table(
        urls, transport_factory=lambda: page_transport(timeout=2.0)
    ).collect()}
    sec = out[f"{page_server}/secure"]
    assert sec["hsts"] and sec["csp"] and sec["no_leaky_headers"]
    assert sec["missing_high"] == 0 and sec["error"] is None
    leaky = out[f"{page_server}/leaky"]
    assert leaky["missing_high"] == 2 and leaky["missing_medium"] == 2
    assert leaky["leaky_count"] == 2 and leaky["no_leaky_headers"] is False
    dead = out["http://127.0.0.1:9/dead"]
    assert dead["error"].startswith("Connection failed")
    assert dead["status_code"] is None


def test_scan_headers_feeds_risk_grading(spark, page_server):
    """End-to-end: distributed scan → columnar risk grading, one plan."""
    urls = spark.createDataFrame([(f"{page_server}/secure",)], ["url"])
    scanned = scan_headers_table(
        urls, transport_factory=lambda: page_transport(timeout=2.0)
    )
    graded = risk_grade_columns(scanned, categories=["http_headers"])
    row = graded.collect()[0]
    assert row["http_headers_score"] == 100
    assert row["overall_grade"] == "A"
