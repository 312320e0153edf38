"""Network-intelligence scanner family — the reference's six security
scanners plus the weighted risk scorer, re-expressed for Spark.

Reference analogs (envelope parity, verified field-by-field):

- ``http_headers_scan``  — tools/src/aden_tools/tools/
  http_headers_scanner/http_headers_scanner.py:100-186 (OWASP header
  checks, leaky headers, grade_input).
- ``tech_stack_detect``  — tech_stack_detector/tech_stack_detector.py:
  115-424 (server/CDN/framework/JS-lib/CMS/cookie fingerprinting,
  path probes, grade_input).
- ``ssl_tls_scan``       — ssl_tls_scanner/ssl_tls_scanner.py:36-233
  (TLS version/cipher/cert analysis, issues, grade_input).
- ``port_scan``          — port_scanner/port_scanner.py:159-290
  (TCP connect probes, banner grab, risky-port findings).
- ``dns_security_scan``  — dns_security_scanner/dns_security_scanner.py:
  33-263 (SPF/DMARC/DKIM/DNSSEC/MX/CAA/zone-transfer).
- ``subdomain_enumerate``— subdomain_enumerator/subdomain_enumerator.py:
  77-183 (CT-log discovery, interesting-keyword findings).
- ``risk_score``         — risk_scorer/risk_scorer.py:16-290 (weighted
  category scores, letter grades, top risks).

Design split, same discipline as the vision / search / LLM adapters:

- **Pure analysis functions** take plain collected facts (header
  lists, cert dicts, DNS record texts, open-port lists, CT entries)
  and are deterministic — fully testable offline.
- **Probes/transports are injectable.** Live tiers use ONLY stdlib
  (urllib / ssl / socket) and are exercised against loopback servers
  in tests; fixture seams replay recorded data where the live
  protocol can't run in-sandbox (DNS rtype lookups need dnspython,
  CT logs need the internet).
- **Distributed tier** (``scan_headers_table``): a TABLE of URLs is
  scanned ON THE EXECUTORS via ``mapInPandas`` — map-only, no
  shuffle, per-row error envelopes so one dead host can't fail a
  10M-row scan stage (the ``fetch_urls`` crawl discipline).
- **Columnar risk grading** (``risk_grade_columns``): the scorer's
  arithmetic as pure JVM column expressions over boolean check
  columns — whole-stage-codegen, oracle-checkable (q113).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UA = "aden-hive-fork-spark/1.0"

# ---------------------------------------------------------------------------
# §1 HTTP security headers (http_headers_scanner.py:14-96 tables)
# ---------------------------------------------------------------------------
SECURITY_HEADERS = {
    "Strict-Transport-Security": {
        "severity": "high",
        "description": (
            "No HSTS header. Browsers may connect over plain HTTP, "
            "enabling man-in-the-middle attacks."
        ),
        "remediation": (
            "Add the header: Strict-Transport-Security: "
            "max-age=31536000; includeSubDomains"
        ),
    },
    "Content-Security-Policy": {
        "severity": "high",
        "description": (
            "No CSP header. The site is more vulnerable to XSS attacks "
            "from inline scripts and untrusted sources."
        ),
        "remediation": (
            "Add a Content-Security-Policy header. "
            "Start restrictive: default-src 'self'; script-src 'self'"
        ),
    },
    "X-Frame-Options": {
        "severity": "medium",
        "description": (
            "No X-Frame-Options header. The site may be vulnerable to "
            "clickjacking."
        ),
        "remediation": "Add the header: X-Frame-Options: DENY (or SAMEORIGIN)",
    },
    "X-Content-Type-Options": {
        "severity": "medium",
        "description": (
            "No X-Content-Type-Options header. Browsers may MIME-sniff "
            "responses, potentially executing malicious content."
        ),
        "remediation": "Add the header: X-Content-Type-Options: nosniff",
    },
    "Referrer-Policy": {
        "severity": "low",
        "description": (
            "No Referrer-Policy header. Full URLs (including query params) "
            "may leak to third-party sites via the Referer header."
        ),
        "remediation": (
            "Add the header: Referrer-Policy: strict-origin-when-cross-origin"
        ),
    },
    "Permissions-Policy": {
        "severity": "low",
        "description": (
            "No Permissions-Policy header. Browser features like camera, "
            "microphone, and geolocation are not explicitly restricted."
        ),
        "remediation": (
            "Add the header: Permissions-Policy: camera=(), microphone=(), "
            "geolocation=()"
        ),
    },
}

LEAKY_HEADERS = {
    "Server": {
        "severity": "low",
        "remediation": (
            "Remove or genericize the Server header to avoid version "
            "disclosure."
        ),
    },
    "X-Powered-By": {
        "severity": "low",
        "remediation": (
            "Remove the X-Powered-By header to hide the backend framework."
        ),
    },
    "X-AspNet-Version": {
        "severity": "low",
        "remediation": (
            "Remove the X-AspNet-Version header from IIS/ASP.NET "
            "configuration."
        ),
    },
    "X-AspNetMvc-Version": {
        "severity": "low",
        "remediation": "Remove the X-AspNetMvc-Version header.",
    },
    "X-Generator": {
        "severity": "low",
        "remediation": (
            "Remove the X-Generator header to hide the CMS/platform in use."
        ),
    },
}


def analyze_security_headers(url: str, status: int,
                             headers: list[tuple[str, str]]) -> dict:
    """Pure header analysis (http_headers_scanner.py:131-186 parity):
    present/missing OWASP headers, leaky headers, grade_input."""
    hmap: dict[str, str] = {}
    for k, v in headers:
        hmap.setdefault(k.lower(), v)
    lower = set(hmap)

    headers_present = []
    headers_missing = []
    for name, info in SECURITY_HEADERS.items():
        if name.lower() in lower:
            headers_present.append(name)
        else:
            headers_missing.append(
                {
                    "header": name,
                    "severity": info["severity"],
                    "description": info["description"],
                    "remediation": info["remediation"],
                }
            )

    leaky_found = []
    for name, info in LEAKY_HEADERS.items():
        value = hmap.get(name.lower())
        if value:
            leaky_found.append(
                {
                    "header": name,
                    "value": value,
                    "severity": info["severity"],
                    "remediation": info["remediation"],
                }
            )

    if hmap.get("x-xss-protection"):
        headers_present.append("X-XSS-Protection (deprecated)")

    grade_input = {
        "hsts": "strict-transport-security" in lower,
        "csp": "content-security-policy" in lower,
        "x_frame_options": "x-frame-options" in lower,
        "x_content_type_options": "x-content-type-options" in lower,
        "referrer_policy": "referrer-policy" in lower,
        "permissions_policy": "permissions-policy" in lower,
        "no_leaky_headers": len(leaky_found) == 0,
    }
    return {
        "url": url,
        "status_code": status,
        "headers_present": headers_present,
        "headers_missing": headers_missing,
        "leaky_headers": leaky_found,
        "grade_input": grade_input,
    }


def page_transport(timeout: float = 15.0, max_bytes: int = 1 << 20):
    """Live GET transport for the page scanners (stdlib urllib):
    ``send(url, follow_redirects=True) -> {status, url, headers, body}``.
    Non-2xx responses are returned (not raised); transport failures
    raise and the scan functions map them to error envelopes."""

    def send(url: str, follow_redirects: bool = True) -> dict:
        import urllib.error
        import urllib.request

        if follow_redirects:
            opener = urllib.request.build_opener()
        else:
            class _NoRedirect(urllib.request.HTTPRedirectHandler):
                def redirect_request(self, *a, **kw):
                    return None

            opener = urllib.request.build_opener(_NoRedirect())
        req = urllib.request.Request(url, headers={"User-Agent": _UA})
        try:
            with opener.open(req, timeout=timeout) as resp:
                return {
                    "status": resp.status,
                    "url": resp.geturl(),
                    "headers": list(resp.headers.items()),
                    "body": resp.read(max_bytes),
                }
        except urllib.error.HTTPError as e:  # non-2xx WITH a response
            try:
                body = e.read(max_bytes)
            except Exception:
                body = b""
            return {
                "status": e.code,
                "url": url,
                "headers": list(e.headers.items()) if e.headers else [],
                "body": body,
            }

    return send


def _transport_error(url: str, e: Exception, what: str) -> dict:
    """Map transport exceptions to the reference error envelopes
    (http_headers_scanner.py:123-129)."""
    import urllib.error

    if isinstance(e, urllib.error.URLError):
        reason = getattr(e, "reason", e)
        if isinstance(reason, (TimeoutError, OSError)) and isinstance(
            reason, TimeoutError
        ):
            return {"error": f"Request to {url} timed out"}
        return {"error": f"Connection failed: {reason}"}
    if isinstance(e, TimeoutError):
        return {"error": f"Request to {url} timed out"}
    return {"error": f"{what} failed: {e}"}


def http_headers_scan(url: str, transport=None,
                      follow_redirects: bool = True) -> dict:
    """Scan one URL for OWASP security headers
    (http_headers_scanner.py:100-186)."""
    if not url.startswith(("http://", "https://")):
        url = "https://" + url
    transport = transport or page_transport()
    try:
        resp = transport(url, follow_redirects)
    except Exception as e:
        return _transport_error(url, e, "Request")
    return analyze_security_headers(resp["url"], resp["status"],
                                    resp["headers"])


# ---------------------------------------------------------------------------
# §2 Tech stack detection (tech_stack_detector.py:17-112 tables)
# ---------------------------------------------------------------------------
JS_PATTERNS = {
    "React": [r"react(?:\.min)?\.js", r"data-reactroot", r"__NEXT_DATA__"],
    "Angular": [r"angular(?:\.min)?\.js", r"ng-app", r"ng-version"],
    "Vue.js": [r"vue(?:\.min)?\.js", r"data-v-[a-f0-9]", r"__vue__"],
    "jQuery": [r"jquery[.-](\d+\.\d+(?:\.\d+)?)", r"jquery(?:\.min)?\.js"],
    "Bootstrap": [
        r"bootstrap[.-](\d+\.\d+(?:\.\d+)?)",
        r"bootstrap(?:\.min)?\.(?:js|css)",
    ],
    "Tailwind CSS": [r"tailwind"],
    "Svelte": [r"svelte", r"__svelte"],
    "Next.js": [r"_next/static", r"__NEXT_DATA__"],
    "Nuxt.js": [r"__nuxt", r"_nuxt/"],
}

COOKIE_TECH_MAP = {
    "PHPSESSID": "PHP",
    "JSESSIONID": "Java",
    "ASP.NET_SessionId": "ASP.NET",
    "csrftoken": "Django",
    "laravel_session": "Laravel",
    "rack.session": "Ruby/Rails",
    "connect.sid": "Node.js/Express",
    "_rails_session": "Ruby on Rails",
}

ANALYTICS_PATTERNS = {
    "Google Analytics": [
        r"google-analytics\.com/analytics\.js",
        r"googletagmanager\.com",
        r"gtag\(",
    ],
    "Facebook Pixel": [r"connect\.facebook\.net"],
    "Hotjar": [r"static\.hotjar\.com"],
    "Mixpanel": [r"cdn\.mxpnl\.com"],
    "Segment": [r"cdn\.segment\.com"],
}

CDN_HEADERS = {
    "cf-ray": "Cloudflare",
    "x-cdn": None,
    "x-served-by": "Fastly",
    "x-amz-cf-id": "AWS CloudFront",
    "x-cache": None,
    "via": None,
    "x-vercel-id": "Vercel",
    "x-netlify-request-id": "Netlify",
    "fly-request-id": "Fly.io",
}

PROBE_PATHS = {
    "/wp-admin/": "WordPress",
    "/wp-json/wp/v2/": "WordPress",
    "/wp-login.php": "WordPress",
    "/administrator/": "Joomla",
    "/user/login": "Drupal",
    "/admin/": None,
    "/api/": None,
    "/.well-known/security.txt": None,
    "/robots.txt": None,
    "/sitemap.xml": None,
}


def detect_server(hmap: dict[str, str]) -> dict | None:
    server_header = hmap.get("server")
    if not server_header:
        return None
    m = re.match(r"^([\w.-]+)(?:/(\S+))?", server_header)
    if m:
        return {"name": m.group(1), "version": m.group(2),
                "raw": server_header}
    return {"name": server_header, "version": None, "raw": server_header}


def detect_cdn(hmap: dict[str, str]) -> str | None:
    for name, cdn in CDN_HEADERS.items():
        value = hmap.get(name)
        if value:
            if cdn:
                return cdn
            vl = value.lower()
            for needle, label in (
                ("cloudflare", "Cloudflare"),
                ("cloudfront", "AWS CloudFront"),
                ("fastly", "Fastly"),
                ("akamai", "Akamai"),
                ("varnish", "Varnish"),
            ):
                if needle in vl:
                    return label
    return None


def detect_js_libraries(html: str) -> list[str]:
    found = []
    for lib, patterns in JS_PATTERNS.items():
        for pat in patterns:
            if re.search(pat, html, re.I):
                vm = re.search(
                    rf"{re.escape(lib.lower())}[/-](\d+\.\d+(?:\.\d+)?)",
                    html, re.I,
                )
                found.append(f"{lib} {vm.group(1)}" if vm else lib)
                break
    return found


def detect_analytics(html: str) -> list[str]:
    return [
        name
        for name, pats in ANALYTICS_PATTERNS.items()
        if any(re.search(p, html, re.I) for p in pats)
    ]


def detect_cms_from_html(html: str) -> str | None:
    if "wp-content" in html or "wp-includes" in html:
        return "WordPress"
    if "Drupal" in html or "drupal.js" in html:
        return "Drupal"
    if "/media/jui/" in html or "Joomla" in html:
        return "Joomla"
    if "cdn.shopify.com" in html:
        return "Shopify"
    if "squarespace" in html.lower():
        return "Squarespace"
    if "wix.com" in html:
        return "Wix"
    if "ghost-" in html or "ghost/" in html:
        return "Ghost"
    gen = re.search(
        r'<meta[^>]+name=["\']generator["\'][^>]+content=["\'](.*?)["\']',
        html, re.I,
    ) or re.search(
        r'<meta[^>]+content=["\'](.*?)["\'][^>]+name=["\']generator["\']',
        html, re.I,
    )
    return gen.group(1) if gen else None


def detect_framework_from_html(html: str) -> str | None:
    if "csrfmiddlewaretoken" in html:
        return "Django"
    if "csrf-token" in html and "data-turbo" in html:
        return "Ruby on Rails"
    if "laravel" in html.lower():
        return "Laravel"
    return None


def analyze_cookies(headers: list[tuple[str, str]]) -> list[dict]:
    """Security-flag analysis of raw Set-Cookie headers
    (tech_stack_detector.py:395-424)."""
    result = []
    for k, raw in headers:
        if k.lower() != "set-cookie":
            continue
        name = raw.split("=", 1)[0].strip()
        parts = [p.strip().lower() for p in raw.split(";")]
        samesite = None
        for part in parts:
            if part.startswith("samesite="):
                samesite = part.split("=", 1)[1].strip().capitalize()
        result.append(
            {
                "name": name,
                "secure": "secure" in parts,
                "httponly": "httponly" in parts,
                "samesite": samesite,
            }
        )
    return result


def _has_version(value: str) -> bool:
    return bool(re.search(r"\d+\.\d+", value))


def tech_stack_detect(url: str, transport=None) -> dict:
    """Passive tech-stack fingerprint of one site
    (tech_stack_detector.py:115-243): one main GET + path probes
    through the same transport, then pure analysis."""
    if not url.startswith(("http://", "https://")):
        url = "https://" + url
    base_url = url.rstrip("/")
    transport = transport or page_transport()
    try:
        resp = transport(base_url, True)
    except Exception as e:
        return _transport_error(url, e, "Detection")

    html = resp["body"].decode("utf-8", errors="replace")
    hmap: dict[str, str] = {}
    for k, v in resp["headers"]:
        hmap.setdefault(k.lower(), v)

    server = detect_server(hmap)
    cdn = detect_cdn(hmap)
    framework = hmap.get("x-powered-by") or None
    cookies = analyze_cookies(resp["headers"])

    language = None
    powered = (hmap.get("x-powered-by") or "").lower()
    if "php" in powered:
        language = "PHP"
    elif "asp.net" in powered:
        language = "ASP.NET"
    elif "express" in powered:
        language = "Node.js"
    if not language:
        for c in cookies:
            tech = COOKIE_TECH_MAP.get(c["name"])
            if tech:
                language = tech
                break

    js_libs = detect_js_libraries(html)
    analytics = detect_analytics(html)
    cms = detect_cms_from_html(html)

    security_txt = False
    robots_txt = False
    interesting_paths = []
    cms_from_paths = None
    for path, tech in PROBE_PATHS.items():
        try:
            probe = transport(f"{base_url}{path}", False)
        except Exception:
            continue
        code = probe["status"]
        if code in (200, 301, 302, 403):
            if path == "/.well-known/security.txt":
                security_txt = code == 200
            elif path == "/robots.txt":
                robots_txt = code == 200
            elif tech and code in (200, 301, 302):
                cms_from_paths = tech
            elif code in (200, 301, 302):
                interesting_paths.append(path)

    if not cms and cms_from_paths:
        cms = cms_from_paths
    if not framework:
        framework = detect_framework_from_html(html)

    server_version_hidden = not (server and server.get("version"))
    grade_input = {
        "server_version_hidden": server_version_hidden,
        "framework_version_hidden": framework is None
        or not _has_version(framework),
        "security_txt_present": security_txt,
        "cookies_secure": all(c["secure"] for c in cookies)
        if cookies else True,
        "cookies_httponly": all(c["httponly"] for c in cookies)
        if cookies else True,
    }
    return {
        "url": resp["url"],
        "server": server,
        "framework": framework,
        "language": language,
        "cms": cms,
        "javascript_libraries": js_libs,
        "cdn": cdn,
        "analytics": analytics,
        "security_txt": security_txt,
        "robots_txt": robots_txt,
        "interesting_paths": interesting_paths,
        "cookies": cookies,
        "grade_input": grade_input,
    }


# ---------------------------------------------------------------------------
# §3 SSL/TLS (ssl_tls_scanner.py:19-256)
# ---------------------------------------------------------------------------
WEAK_CIPHERS = {"RC4", "DES", "3DES", "MD5", "NULL", "EXPORT", "anon"}
INSECURE_TLS_VERSIONS = {"TLSv1", "TLSv1.0", "TLSv1.1", "SSLv2", "SSLv3"}


def _clean_host(hostname: str) -> str:
    hostname = hostname.replace("https://", "").replace("http://", "")
    hostname = hostname.strip("/").split("/")[0]
    if ":" in hostname:
        hostname = hostname.split(":")[0]
    return hostname


def _format_dn(dn_tuple) -> str:
    parts = []
    for rdn in dn_tuple:
        for attr_type, attr_value in rdn:
            parts.append(f"{attr_type}={attr_value}")
    return ", ".join(parts)


def _parse_cert_date(date_str: str):
    if not date_str:
        return None
    for fmt in ("%b %d %H:%M:%S %Y %Z", "%b  %d %H:%M:%S %Y %Z"):
        try:
            return datetime.strptime(date_str, fmt).replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            continue
    return None


def tls_connect_facts(hostname: str, port: int, timeout: float = 10.0) -> dict:
    """Live TLS handshake facts via stdlib ssl (ssl_tls_scanner.py:
    63-105): verify first; on verification failure, reconnect
    unverified and record the error as a finding-to-be."""
    import socket
    import ssl

    facts: dict = {"verify_error": None}
    ctx = ssl.create_default_context()
    conn = ctx.wrap_socket(socket.socket(), server_hostname=hostname)
    conn.settimeout(timeout)
    try:
        conn.connect((hostname, port))
    except ssl.SSLCertVerificationError as e:
        conn.close()
        facts["verify_error"] = str(e)
        ctx2 = ssl.create_default_context()
        ctx2.check_hostname = False
        ctx2.verify_mode = ssl.CERT_NONE
        conn = ctx2.wrap_socket(socket.socket(), server_hostname=hostname)
        conn.settimeout(timeout)
        try:
            conn.connect((hostname, port))
        except BaseException:
            conn.close()
            raise
    except BaseException:
        conn.close()  # refused/timeout must not leak the socket
        raise
    try:
        facts["tls_version"] = conn.version() or "unknown"
        cipher = conn.cipher()
        facts["cipher_name"] = cipher[0] if cipher else "unknown"
        facts["cipher_bits"] = cipher[2] if cipher else 0
        facts["cert_der"] = conn.getpeercert(binary_form=True)
        facts["cert_dict"] = conn.getpeercert() or {}
    finally:
        conn.close()
    # Unverified handshakes return an empty cert dict from getpeercert();
    # recover subject/issuer/validity from the DER via ssl's test helper
    # when available, else leave empty (issues still include the
    # verification failure).
    if not facts["cert_dict"] and facts.get("cert_der"):
        try:
            import ssl as _ssl

            pem = _ssl.DER_cert_to_PEM_cert(facts["cert_der"])
            facts["cert_dict"] = _ssl._ssl._test_decode_cert_pem(pem)  # type: ignore[attr-defined]
        except Exception:
            try:
                import os
                import tempfile

                fd, path = tempfile.mkstemp(suffix=".pem")
                with os.fdopen(fd, "w") as f:
                    f.write(_ssl.DER_cert_to_PEM_cert(facts["cert_der"]))
                facts["cert_dict"] = _ssl._ssl._test_decode_cert(path)  # type: ignore[attr-defined]
                os.unlink(path)
            except Exception:
                facts["cert_dict"] = {}
    return facts


def analyze_tls(hostname: str, port: int, facts: dict, now=None) -> dict:
    """Pure TLS analysis (ssl_tls_scanner.py:107-233): version/cipher/
    certificate checks → issues + grade_input. ``now`` injectable for
    deterministic expiry tests."""
    import hashlib

    issues: list[dict] = []
    if facts.get("verify_error"):
        issues.append(
            {
                "severity": "critical",
                "finding": (
                    "SSL certificate verification failed: "
                    f"{facts['verify_error']}"
                ),
                "remediation": (
                    "Obtain a valid certificate from a trusted CA. "
                    "Let's Encrypt provides free certificates."
                ),
            }
        )

    tls_version = facts.get("tls_version", "unknown")
    cipher_name = facts.get("cipher_name", "unknown")
    cipher_bits = facts.get("cipher_bits", 0)
    cert_dict = facts.get("cert_dict") or {}
    cert_der = facts.get("cert_der")

    subject = _format_dn(cert_dict.get("subject", ()))
    issuer = _format_dn(cert_dict.get("issuer", ()))
    not_before_str = cert_dict.get("notBefore", "")
    not_after_str = cert_dict.get("notAfter", "")
    not_before = _parse_cert_date(not_before_str)
    not_after = _parse_cert_date(not_after_str)
    now = now or datetime.now(timezone.utc)
    days_until_expiry = (not_after - now).days if not_after else None

    san_list = [v for t, v in cert_dict.get("subjectAltName", ())
                if t == "DNS"]
    self_signed = subject == issuer
    cert_sha256 = hashlib.sha256(cert_der).hexdigest() if cert_der else ""

    tls_version_ok = tls_version not in INSECURE_TLS_VERSIONS
    if not tls_version_ok:
        issues.append(
            {
                "severity": "high",
                "finding": f"Insecure TLS version: {tls_version}",
                "remediation": (
                    "Disable TLS 1.0 and 1.1 in your server configuration. "
                    "Use TLS 1.2 or 1.3 only."
                ),
            }
        )

    strong_cipher = True
    if any(weak in cipher_name.upper() for weak in WEAK_CIPHERS):
        strong_cipher = False
        issues.append(
            {
                "severity": "high",
                "finding": f"Weak cipher suite: {cipher_name}",
                "remediation": (
                    "Configure your server to use strong cipher suites "
                    "only. Prefer AES-GCM and ChaCha20-Poly1305."
                ),
            }
        )
    if cipher_bits and cipher_bits < 128:
        strong_cipher = False
        issues.append(
            {
                "severity": "high",
                "finding": (
                    f"Cipher key length too short: {cipher_bits} bits"
                ),
                "remediation": (
                    "Use cipher suites with at least 128-bit keys."
                ),
            }
        )

    cert_valid = True
    cert_expiring_soon = False
    if not_after and now > not_after:
        cert_valid = False
        issues.append(
            {
                "severity": "critical",
                "finding": "SSL certificate has expired",
                "remediation": "Renew the SSL certificate immediately.",
            }
        )
    elif days_until_expiry is not None and days_until_expiry <= 30:
        cert_expiring_soon = True
        issues.append(
            {
                "severity": "medium",
                "finding": (
                    f"SSL certificate expires in {days_until_expiry} days"
                ),
                "remediation": (
                    "Renew the SSL certificate before it expires."
                ),
            }
        )
    if self_signed:
        cert_valid = False
        issues.append(
            {
                "severity": "high",
                "finding": "Self-signed certificate detected",
                "remediation": (
                    "Replace with a certificate from a trusted CA. "
                    "Let's Encrypt provides free certificates."
                ),
            }
        )

    return {
        "hostname": hostname,
        "port": port,
        "tls_version": tls_version,
        "cipher": cipher_name,
        "cipher_bits": cipher_bits,
        "certificate": {
            "subject": subject,
            "issuer": issuer,
            "not_before": not_before.isoformat()
            if not_before else not_before_str,
            "not_after": not_after.isoformat()
            if not_after else not_after_str,
            "days_until_expiry": days_until_expiry,
            "san": san_list,
            "self_signed": self_signed,
            "sha256_fingerprint": cert_sha256,
        },
        "issues": issues,
        "grade_input": {
            "tls_version_ok": tls_version_ok,
            "cert_valid": cert_valid,
            "cert_expiring_soon": cert_expiring_soon,
            "strong_cipher": strong_cipher,
            "self_signed": self_signed,
        },
    }


def ssl_tls_scan(hostname: str, port: int = 443, connect=None,
                 now=None) -> dict:
    """Scan one host's TLS configuration (ssl_tls_scanner.py:36-233).
    ``connect(hostname, port) -> facts`` is injectable; default is the
    live stdlib handshake."""
    hostname = _clean_host(hostname)
    connect = connect or tls_connect_facts
    try:
        facts = connect(hostname, port)
    except TimeoutError:
        return {"error": f"Connection to {hostname}:{port} timed out"}
    except ConnectionRefusedError:
        return {
            "error": (
                f"Connection to {hostname}:{port} refused. "
                "Port may be closed."
            )
        }
    except OSError as e:
        return {"error": f"Connection failed: {e}"}
    return analyze_tls(hostname, port, facts, now=now)


# ---------------------------------------------------------------------------
# §4 Port scan (port_scanner.py:17-290)
# ---------------------------------------------------------------------------
PORT_SERVICE_MAP = {
    21: "FTP", 22: "SSH", 23: "Telnet", 25: "SMTP", 53: "DNS",
    80: "HTTP", 110: "POP3", 143: "IMAP", 443: "HTTPS", 445: "SMB",
    993: "IMAPS", 995: "POP3S", 1433: "MSSQL", 3306: "MySQL",
    3389: "RDP", 5432: "PostgreSQL", 5900: "VNC", 6379: "Redis",
    8080: "HTTP-Alt", 8443: "HTTPS-Alt",
}
TOP20_PORTS = sorted(PORT_SERVICE_MAP)
TOP100_PORTS = sorted(
    set(TOP20_PORTS)
    | {8, 20, 69, 111, 119, 123, 135, 137, 138, 139, 161, 162, 179, 389,
       443, 465, 514, 515, 520, 587, 631, 636, 873, 902, 989, 990, 1080,
       1194, 1443, 1521, 1723, 2049, 2082, 2083, 2086, 2087, 2096, 2181,
       2222, 3000, 3128, 4443, 5000, 5001, 5060, 5222, 5601, 5984, 6443,
       6660, 6661, 6662, 6663, 6664, 6665, 6666, 6667, 7001, 7002, 7443,
       8000, 8008, 8081, 8082, 8083, 8088, 8443, 8888, 9000, 9090, 9200,
       9300, 9443, 10000, 11211, 27017, 27018}
)
DATABASE_PORTS = {1433, 3306, 5432, 6379, 27017, 27018, 9200, 9300, 5984,
                  11211}
ADMIN_PORTS = {3389, 5900, 2082, 2083, 2086, 2087, 10000}
LEGACY_PORTS = {21, 23, 110, 143, 445}

PORT_FINDINGS = {
    "database": {
        "severity": "high",
        "remediation": (
            "Restrict database ports to localhost or VPN only. "
            "Use firewall rules to block public access."
        ),
    },
    "admin": {
        "severity": "high",
        "remediation": (
            "Restrict remote admin ports to VPN or trusted IP ranges. "
            "Never expose RDP/VNC directly to the internet."
        ),
    },
    "legacy": {
        "severity": "medium",
        "remediation": (
            "Replace legacy protocols with secure alternatives. "
            "Use SFTP instead of FTP, SSH instead of Telnet, "
            "IMAPS/POP3S instead of IMAP/POP3."
        ),
    },
}


def classify_open_port(port: int, banner: str = "") -> dict:
    """Pure per-port classification (port_scanner.py:218-243)."""
    entry = {
        "port": port,
        "service": PORT_SERVICE_MAP.get(port, "unknown"),
        "banner": banner,
    }
    if port in DATABASE_PORTS:
        entry["severity"] = PORT_FINDINGS["database"]["severity"]
        entry["finding"] = (
            f"{entry['service']} port ({port}) exposed to internet"
        )
        entry["remediation"] = PORT_FINDINGS["database"]["remediation"]
    elif port in ADMIN_PORTS:
        entry["severity"] = PORT_FINDINGS["admin"]["severity"]
        entry["finding"] = (
            f"{entry['service']} admin port ({port}) exposed to internet"
        )
        entry["remediation"] = PORT_FINDINGS["admin"]["remediation"]
    elif port in LEGACY_PORTS:
        entry["severity"] = PORT_FINDINGS["legacy"]["severity"]
        entry["finding"] = (
            f"Legacy protocol {entry['service']} ({port}) still active"
        )
        entry["remediation"] = PORT_FINDINGS["legacy"]["remediation"]
    return entry


def _tcp_probe(ip: str, port: int, timeout: float) -> dict:
    """TCP connect + best-effort banner grab (port_scanner.py:269-290)."""
    import socket

    try:
        with socket.create_connection((ip, port), timeout=timeout) as s:
            banner = ""
            try:
                s.settimeout(2.0)
                banner = s.recv(256).decode("utf-8", errors="ignore").strip()
            except Exception:
                pass
            return {"open": True, "banner": banner}
    except (TimeoutError, ConnectionRefusedError, OSError):
        return {"open": False}


def port_scan(hostname: str, ports: str = "top20", timeout: float = 3.0,
              probe=None, resolve=None) -> dict:
    """Scan one host's ports (port_scanner.py:159-266). ``probe`` and
    ``resolve`` are injectable (loopback tests / fixture replays);
    concurrency is a 20-thread pool, mirroring the reference's
    semaphore(20)."""
    from concurrent.futures import ThreadPoolExecutor

    hostname = _clean_host(hostname)
    timeout = min(timeout, 10.0)

    if ports == "top20":
        port_list = TOP20_PORTS
    elif ports == "top100":
        port_list = TOP100_PORTS
    else:
        try:
            port_list = sorted(
                {int(p.strip()) for p in ports.split(",") if p.strip()}
            )
        except ValueError:
            return {
                "error": (
                    f"Invalid port list: {ports}. "
                    "Use 'top20', 'top100', or '80,443'"
                )
            }

    if resolve is None:
        import socket

        resolve = socket.gethostbyname
    try:
        ip = resolve(hostname)
    except OSError:
        return {"error": f"Could not resolve hostname: {hostname}"}

    probe = probe or _tcp_probe
    open_ports = []
    closed_ports = []
    with ThreadPoolExecutor(max_workers=20) as pool:
        for port, result in zip(
            port_list,
            pool.map(lambda p: probe(ip, p, timeout), port_list),
        ):
            if result["open"]:
                open_ports.append(
                    classify_open_port(port, result.get("banner", ""))
                )
            else:
                closed_ports.append(port)

    open_ports.sort(key=lambda x: x["port"])
    open_nums = {p["port"] for p in open_ports}
    grade_input = {
        "no_database_ports_exposed": not (open_nums & DATABASE_PORTS),
        "no_admin_ports_exposed": not (open_nums & ADMIN_PORTS),
        "no_legacy_ports_exposed": not (open_nums & LEGACY_PORTS),
        "only_web_ports": open_nums <= {80, 443, 8080, 8443},
    }
    return {
        "hostname": hostname,
        "ip": ip,
        "ports_scanned": len(port_list),
        "open_ports": open_ports,
        "closed_ports": sorted(closed_ports),
        "grade_input": grade_input,
    }


# ---------------------------------------------------------------------------
# §5 DNS security (dns_security_scanner.py:28-263)
# ---------------------------------------------------------------------------
DKIM_SELECTORS = ["default", "google", "selector1", "selector2", "k1",
                  "mail", "dkim", "s1"]


class FixtureResolver:
    """Offline resolver: ``records`` maps (name, rtype) -> list of
    record texts (TXT records unquoted; MX as "pref exchange").
    Missing keys raise LookupError — the 'no answer' signal."""

    def __init__(self, records: dict[tuple[str, str], list[str]]):
        self.records = dict(records)

    def __call__(self, name: str, rtype: str) -> list[str]:
        try:
            return self.records[(name, rtype)]
        except KeyError:
            raise LookupError(f"no answer for {name} {rtype}")


def dnspython_resolver(timeout: float = 10.0):
    """Live resolver built on dnspython when installed (the reference's
    hard dependency, dns_security_scanner.py:12-26). Raises ImportError
    otherwise — ``dns_security_scan`` maps that to the reference's
    error envelope. Arbitrary-rtype lookups (TXT/DNSKEY/MX/CAA/NS)
    need dnspython; stdlib socket only resolves A records."""
    import dns.resolver  # noqa: F401 — ImportError is the gate

    resolver = dns.resolver.Resolver()
    resolver.timeout = timeout
    resolver.lifetime = timeout

    def query(name: str, rtype: str) -> list[str]:
        import dns.exception

        try:
            answers = resolver.resolve(name, rtype)
        except dns.exception.DNSException as e:
            raise LookupError(str(e))
        if rtype == "MX":
            return [f"{r.preference} {r.exchange}" for r in answers]
        return [r.to_text().strip('"') for r in answers]

    return query


def _check_spf(resolver, domain: str) -> dict:
    try:
        for txt in resolver(domain, "TXT"):
            if txt.startswith("v=spf1"):
                issues = []
                if "~all" in txt:
                    policy = "softfail"
                    issues.append(
                        "Uses ~all (softfail) instead of -all (hardfail). "
                        "Spoofed emails may still be delivered."
                    )
                elif "-all" in txt:
                    policy = "hardfail"
                elif "+all" in txt:
                    policy = "pass_all"
                    issues.append(
                        "Uses +all which allows ANY server to send email "
                        "for this domain. This effectively disables SPF "
                        "protection."
                    )
                elif "?all" in txt:
                    policy = "neutral"
                    issues.append(
                        "Uses ?all (neutral). SPF results are not used "
                        "for filtering."
                    )
                else:
                    policy = "unknown"
                    issues.append("No 'all' mechanism found in SPF record.")
                return {"present": True, "record": txt, "policy": policy,
                        "issues": issues}
    except LookupError:
        pass
    return {
        "present": False,
        "record": None,
        "policy": None,
        "issues": [
            "No SPF record found. Any server can send email as this domain."
        ],
    }


def _check_dmarc(resolver, domain: str) -> dict:
    try:
        for txt in resolver(f"_dmarc.{domain}", "TXT"):
            if txt.startswith("v=DMARC1"):
                issues = []
                policy = "none"
                for part in txt.split(";"):
                    part = part.strip()
                    if part.startswith("p="):
                        policy = part[2:].strip()
                if policy == "none":
                    issues.append(
                        "DMARC policy is 'none' — spoofed emails are not "
                        "blocked. Upgrade to p=quarantine or p=reject."
                    )
                return {"present": True, "record": txt, "policy": policy,
                        "issues": issues}
    except LookupError:
        pass
    return {
        "present": False,
        "record": None,
        "policy": None,
        "issues": [
            "No DMARC record found. Email spoofing is not actively "
            "monitored or blocked."
        ],
    }


def _check_dkim(resolver, domain: str) -> dict:
    found, missing = [], []
    for selector in DKIM_SELECTORS:
        try:
            if resolver(f"{selector}._domainkey.{domain}", "TXT"):
                found.append(selector)
            else:
                missing.append(selector)
        except LookupError:
            missing.append(selector)
    return {"selectors_found": found, "selectors_missing": missing}


def _check_dnssec(resolver, domain: str) -> dict:
    try:
        if resolver(domain, "DNSKEY"):
            return {"enabled": True, "issues": []}
    except LookupError:
        pass
    return {
        "enabled": False,
        "issues": [
            "DNSSEC not enabled. The domain is vulnerable to DNS spoofing "
            "and cache poisoning."
        ],
    }


def _check_zone_transfer(resolver, domain: str, xfr=None) -> dict:
    try:
        nameservers = resolver(domain, "NS")
    except LookupError:
        return {"vulnerable": False, "error": "Could not resolve NS records"}
    if xfr is None:
        return {"vulnerable": False}
    for ns_host in nameservers:
        try:
            n_records = xfr(ns_host, domain)
        except Exception:
            continue
        if n_records:
            return {
                "vulnerable": True,
                "nameserver": ns_host,
                "record_count": n_records,
                "severity": "critical",
                "finding": f"Zone transfer allowed on {ns_host}",
                "remediation": (
                    "Disable AXFR for public-facing nameservers. Restrict "
                    "zone transfers to authorized secondary DNS servers "
                    "only."
                ),
            }
    return {"vulnerable": False}


def dns_security_scan(domain: str, resolver=None, xfr=None) -> dict:
    """Scan one domain's DNS security posture
    (dns_security_scanner.py:33-96). ``resolver(name, rtype)`` is
    injectable; default builds a dnspython resolver and mirrors the
    reference's missing-dependency envelope when it isn't installed."""
    if resolver is None:
        try:
            resolver = dnspython_resolver()
        except ImportError:
            return {
                "error": (
                    "dnspython is not installed. Install it with: "
                    "pip install dnspython"
                ),
            }
    domain = _clean_host(domain)

    spf = _check_spf(resolver, domain)
    dmarc = _check_dmarc(resolver, domain)
    dkim = _check_dkim(resolver, domain)
    dnssec = _check_dnssec(resolver, domain)
    try:
        mx = resolver(domain, "MX")
    except LookupError:
        mx = []
    try:
        caa = resolver(domain, "CAA")
    except LookupError:
        caa = []
    zone_transfer = _check_zone_transfer(resolver, domain, xfr=xfr)

    grade_input = {
        "spf_present": spf["present"],
        "spf_strict": spf.get("policy") == "hardfail",
        "dmarc_present": dmarc["present"],
        "dmarc_enforcing": dmarc.get("policy") in ("quarantine", "reject"),
        "dkim_found": len(dkim.get("selectors_found", [])) > 0,
        "dnssec_enabled": dnssec["enabled"],
        "zone_transfer_blocked": not zone_transfer["vulnerable"],
    }
    return {
        "domain": domain,
        "spf": spf,
        "dmarc": dmarc,
        "dkim": dkim,
        "dnssec": dnssec,
        "mx_records": mx,
        "caa_records": caa,
        "zone_transfer": zone_transfer,
        "grade_input": grade_input,
    }


# ---------------------------------------------------------------------------
# §6 Subdomain enumeration (subdomain_enumerator.py:16-183)
# ---------------------------------------------------------------------------
INTERESTING_KEYWORDS = {
    "staging": {
        "reason": "Staging environment exposed publicly",
        "severity": "medium",
        "remediation": "Restrict staging to VPN or internal network access.",
    },
    "dev": {
        "reason": "Development environment exposed publicly",
        "severity": "medium",
        "remediation": (
            "Restrict development servers to internal access only."
        ),
    },
    "test": {
        "reason": "Test environment exposed publicly",
        "severity": "medium",
        "remediation": "Restrict test servers to internal access only.",
    },
    "admin": {
        "reason": "Admin panel subdomain exposed publicly",
        "severity": "high",
        "remediation": "Restrict admin panels to VPN or trusted IP ranges.",
    },
    "internal": {
        "reason": "Internal subdomain exposed in CT logs",
        "severity": "medium",
        "remediation": (
            "Review if internal subdomains should have public certificates."
        ),
    },
    "vpn": {
        "reason": "VPN endpoint discoverable via CT logs",
        "severity": "low",
        "remediation": (
            "Consider if VPN endpoint exposure is acceptable for your "
            "threat model."
        ),
    },
    "api": {
        "reason": "API subdomain discovered — potential attack surface",
        "severity": "low",
        "remediation": (
            "Ensure API is properly authenticated and rate-limited."
        ),
    },
    "mail": {
        "reason": "Mail server subdomain discovered",
        "severity": "info",
        "remediation": (
            "Ensure mail server has proper SPF, DKIM, and DMARC "
            "configuration."
        ),
    },
    "ftp": {
        "reason": "FTP subdomain discovered — legacy protocol",
        "severity": "medium",
        "remediation": (
            "Replace FTP with SFTP. Restrict access to trusted networks."
        ),
    },
    "debug": {
        "reason": "Debug subdomain exposed publicly",
        "severity": "high",
        "remediation": (
            "Remove debug endpoints from production. Restrict to internal "
            "access."
        ),
    },
    "backup": {
        "reason": "Backup subdomain exposed publicly",
        "severity": "high",
        "remediation": (
            "Restrict backup infrastructure to internal access only."
        ),
    },
}

CRTSH_URL = "https://crt.sh/"


def analyze_ct_entries(domain: str, entries: list[dict],
                       max_results: int = 50) -> dict:
    """Pure CT-log analysis (subdomain_enumerator.py:124-183):
    name extraction, wildcard filter, interesting-keyword findings,
    grade_input."""
    max_results = min(max_results, 200)
    raw_names: set[str] = set()
    for entry in entries:
        for name in entry.get("name_value", "").split("\n"):
            name = name.strip().lower()
            if name and name.endswith(f".{domain}") or name == domain:
                raw_names.add(name)
    subdomains = sorted(
        {n for n in raw_names if not n.startswith("*.")}
    )[:max_results]

    interesting = []
    for sub in subdomains:
        prefix = sub.replace(f".{domain}", "").lower()
        for keyword, info in INTERESTING_KEYWORDS.items():
            if re.search(rf"\b{keyword}\b", prefix) or prefix == keyword:
                interesting.append(
                    {
                        "subdomain": sub,
                        "reason": info["reason"],
                        "severity": info["severity"],
                        "remediation": info["remediation"],
                    }
                )
                break

    has_dev_staging = any(
        i["severity"] in ("medium", "high")
        and any(kw in i["subdomain"]
                for kw in ("staging", "dev", "test", "debug"))
        for i in interesting
    )
    has_admin = any(
        any(kw in i["subdomain"] for kw in ("admin", "backup"))
        for i in interesting
    )
    grade_input = {
        "no_dev_staging_exposed": not has_dev_staging,
        "no_admin_exposed": not has_admin,
        "reasonable_surface_area": len(subdomains) < 50,
    }
    return {
        "domain": domain,
        "source": "crt.sh (Certificate Transparency)",
        "total_found": len(subdomains),
        "subdomains": subdomains,
        "interesting": interesting,
        "grade_input": grade_input,
    }


def subdomain_enumerate(domain: str, transport, max_results: int = 50) -> dict:
    """Passive subdomain discovery via CT logs
    (subdomain_enumerator.py:77-183). ``transport`` is the GET seam
    from search_source (``(url, params, headers) -> (status, body)``)
    — ``FixtureGetTransport`` replays recorded crt.sh responses."""
    import json

    domain = _clean_host(domain)
    try:
        status, body = transport(
            CRTSH_URL, {"q": f"%.{domain}", "output": "json"}, {}
        )
    except TimeoutError:
        return {"error": "crt.sh request timed out (try again later)",
                "domain": domain}
    except Exception as e:
        return {"error": f"CT log query failed: {e}", "domain": domain}
    if status != 200:
        return {"error": f"crt.sh returned HTTP {status}", "domain": domain}
    try:
        entries = json.loads(body)
    except ValueError as e:
        return {"error": f"CT log query failed: {e}", "domain": domain}
    return analyze_ct_entries(domain, entries, max_results)


# ---------------------------------------------------------------------------
# §7 Risk scorer (risk_scorer.py:16-290) — driver tier + columnar tier
# ---------------------------------------------------------------------------
GRADE_SCALE = {
    "A": "90-100: Excellent security posture",
    "B": "75-89: Good, minor improvements needed",
    "C": "60-74: Fair, notable security gaps",
    "D": "40-59: Poor, significant vulnerabilities",
    "F": "0-39: Critical, immediate action required",
}

CATEGORY_WEIGHTS = {
    "ssl_tls": 0.20,
    "http_headers": 0.20,
    "dns_security": 0.15,
    "network_exposure": 0.15,
    "technology": 0.15,
    "attack_surface": 0.15,
}

SSL_CHECKS = {
    "tls_version_ok": {"points": 25, "finding": "Insecure TLS version in use"},
    "cert_valid": {"points": 30,
                   "finding": "SSL certificate is invalid or untrusted"},
    "cert_expiring_soon": {"points": 10,
                           "finding": "SSL certificate expiring soon",
                           "invert": True},
    "strong_cipher": {"points": 20, "finding": "Weak cipher suite in use"},
    "self_signed": {"points": 15,
                    "finding": "Self-signed certificate detected",
                    "invert": True},
}

HEADERS_CHECKS = {
    "hsts": {"points": 20,
             "finding": "Missing Strict-Transport-Security header"},
    "csp": {"points": 20,
            "finding": "Missing Content-Security-Policy header"},
    "x_frame_options": {"points": 15,
                        "finding": "Missing X-Frame-Options header"},
    "x_content_type_options": {
        "points": 15, "finding": "Missing X-Content-Type-Options header"},
    "referrer_policy": {"points": 10,
                        "finding": "Missing Referrer-Policy header"},
    "permissions_policy": {"points": 10,
                           "finding": "Missing Permissions-Policy header"},
    "no_leaky_headers": {"points": 10,
                         "finding": "Server information leaked via headers"},
}

DNS_CHECKS = {
    "spf_present": {"points": 15, "finding": "No SPF record found"},
    "spf_strict": {"points": 10,
                   "finding": "SPF policy is not strict (hardfail)"},
    "dmarc_present": {"points": 20, "finding": "No DMARC record found"},
    "dmarc_enforcing": {"points": 15,
                        "finding": "DMARC policy is not enforcing"},
    "dkim_found": {"points": 15, "finding": "No DKIM selector found"},
    "dnssec_enabled": {"points": 15, "finding": "DNSSEC not enabled"},
    "zone_transfer_blocked": {"points": 10,
                              "finding": "DNS zone transfer allowed"},
}

NETWORK_CHECKS = {
    "no_database_ports_exposed": {
        "points": 35, "finding": "Database port(s) exposed to internet"},
    "no_admin_ports_exposed": {
        "points": 30,
        "finding": "Admin/remote access port(s) exposed to internet"},
    "no_legacy_ports_exposed": {
        "points": 20, "finding": "Legacy protocol port(s) still active"},
    "only_web_ports": {"points": 15, "finding": "Non-web ports open"},
}

TECH_CHECKS = {
    "server_version_hidden": {
        "points": 25, "finding": "Server version disclosed in headers"},
    "framework_version_hidden": {
        "points": 20, "finding": "Framework/runtime version disclosed"},
    "security_txt_present": {"points": 20,
                             "finding": "No security.txt file found"},
    "cookies_secure": {"points": 20,
                       "finding": "Cookies missing Secure flag"},
    "cookies_httponly": {"points": 15,
                         "finding": "Cookies missing HttpOnly flag"},
}

SURFACE_CHECKS = {
    "no_dev_staging_exposed": {
        "points": 40, "finding": "Dev/staging environment subdomains exposed"},
    "no_admin_exposed": {"points": 35,
                         "finding": "Admin/backup subdomains exposed"},
    "reasonable_surface_area": {
        "points": 25, "finding": "Large attack surface (many subdomains)"},
}

ALL_CHECKS = {
    "ssl_tls": SSL_CHECKS,
    "http_headers": HEADERS_CHECKS,
    "dns_security": DNS_CHECKS,
    "network_exposure": NETWORK_CHECKS,
    "technology": TECH_CHECKS,
    "attack_surface": SURFACE_CHECKS,
}

# Category -> scanner-output kwarg of risk_score, reference order
_CATEGORY_INPUTS = {
    "ssl_tls": "ssl_results",
    "http_headers": "headers_results",
    "dns_security": "dns_results",
    "network_exposure": "ports_results",
    "technology": "tech_results",
    "attack_surface": "subdomain_results",
}


def score_to_grade(score: int) -> str:
    if score >= 90:
        return "A"
    if score >= 75:
        return "B"
    if score >= 60:
        return "C"
    if score >= 40:
        return "D"
    return "F"


def _coerce_results(data) -> dict | None:
    """Accept a dict directly or the reference's JSON-string input
    (risk_scorer.py:136-144)."""
    import json

    if isinstance(data, dict):
        return data
    if not data or not str(data).strip():
        return None
    try:
        parsed = json.loads(data)
        return parsed if isinstance(parsed, dict) else None
    except (ValueError, TypeError):
        return None


def score_category(grade_input: dict, checks: dict) -> tuple[int, list[str]]:
    """risk_scorer.py:147-174 parity: equal-points checks, half credit
    for missing keys, invert flags. All category point totals sum to
    100, so the score needs no rounding."""
    total_possible = sum(c["points"] for c in checks.values())
    earned = 0
    findings = []
    for key, check in checks.items():
        value = grade_input.get(key)
        invert = check.get("invert", False)
        if value is None:
            earned += check["points"] // 2
            continue
        passed = (not value) if invert else bool(value)
        if passed:
            earned += check["points"]
        else:
            findings.append(check["finding"])
    score = round((earned / total_possible) * 100) if total_possible else 50
    return score, findings


def risk_score(ssl_results=None, headers_results=None, dns_results=None,
               ports_results=None, tech_results=None,
               subdomain_results=None) -> dict:
    """Weighted risk score over scanner outputs
    (risk_scorer.py:181-290). Inputs may be the scanner envelopes
    themselves or JSON strings (reference signature); None/empty skips
    the category and redistributes its weight."""
    kwargs = {
        "ssl_results": ssl_results,
        "headers_results": headers_results,
        "dns_results": dns_results,
        "ports_results": ports_results,
        "tech_results": tech_results,
        "subdomain_results": subdomain_results,
    }
    categories = {}
    all_findings: list[tuple[str, str, int]] = []
    weighted_sum = 0.0
    total_weight = 0.0

    for category, checks in ALL_CHECKS.items():
        raw = _coerce_results(kwargs[_CATEGORY_INPUTS[category]])
        weight = CATEGORY_WEIGHTS[category]
        if raw is None:
            categories[category] = {
                "score": None, "grade": "N/A", "weight": weight,
                "findings_count": 0, "skipped": True,
            }
            continue
        grade_input = raw.get("grade_input", raw)
        score, findings = score_category(grade_input, checks)
        categories[category] = {
            "score": score, "grade": score_to_grade(score),
            "weight": weight, "findings_count": len(findings),
            "skipped": False,
        }
        weighted_sum += score * weight
        total_weight += weight
        for f in findings:
            all_findings.append((category, f, score))

    overall_score = round(weighted_sum / total_weight) if total_weight else 0
    all_findings.sort(key=lambda x: (x[2], x[0]))
    top_risks = [
        f"{finding} ({category.replace('_', ' ').title()}: "
        f"{categories[category]['grade']})"
        for category, finding, _ in all_findings[:10]
    ]
    return {
        "overall_score": overall_score,
        "overall_grade": score_to_grade(overall_score),
        "categories": categories,
        "top_risks": top_risks,
        "grade_scale": GRADE_SCALE,
    }


# integer weights (x100) for the exact columnar tier
_INT_WEIGHTS = {k: int(v * 100) for k, v in CATEGORY_WEIGHTS.items()}


def risk_grade_columns(df: DataFrame,
                       categories: list[str] | None = None) -> DataFrame:
    """Columnar risk grading — the scorer's arithmetic as pure JVM
    column expressions over one row per scanned asset.

    Input: boolean columns named by check key (``hsts``, ``cert_valid``,
    ...) for each category in ``categories`` (default: all six).
    A missing COLUMN gets the reference's half credit (points // 2, the
    'missing data' rule); a NULL value in a present column likewise.

    Output: ``<category>_score`` int, ``<category>_grade`` string per
    category, plus ``overall_score`` / ``overall_grade``. Category
    point totals are all 100, so scores are exact integers; the overall
    is round-half-UP in exact integer arithmetic ((2*Σsw + W) div 2W) —
    documented divergence from the driver tier's Python round() (banker)
    only at exact .5 ties. No UDFs, no shuffle: whole-stage codegen."""
    categories = categories or list(ALL_CHECKS)
    cols = set(df.columns)
    out = df
    weighted = F.lit(0)
    total_w = 0
    for cat in categories:
        checks = ALL_CHECKS[cat]
        earned = F.lit(0)
        for key, check in checks.items():
            pts, half = check["points"], check["points"] // 2
            if key not in cols:
                earned = earned + F.lit(half)
                continue
            c = F.col(key)
            passed = ~c if check.get("invert", False) else c
            earned = earned + F.when(c.isNull(), half).when(
                passed, pts
            ).otherwise(0)
        score = earned  # totals are 100 → score == earned points
        out = out.withColumn(f"{cat}_score", score.cast("int"))
        out = out.withColumn(f"{cat}_grade", _grade_expr(F.col(f"{cat}_score")))
        weighted = weighted + F.col(f"{cat}_score") * _INT_WEIGHTS[cat]
        total_w += _INT_WEIGHTS[cat]
    overall = (weighted * 2 + F.lit(total_w)).cast("long")
    out = out.withColumn(
        "overall_score",
        F.floor(overall / F.lit(2 * total_w)).cast("int"),
    )
    out = out.withColumn("overall_grade", _grade_expr(F.col("overall_score")))
    return out


def _grade_expr(score):
    return (
        F.when(score >= 90, "A")
        .when(score >= 75, "B")
        .when(score >= 60, "C")
        .when(score >= 40, "D")
        .otherwise("F")
    )


# ---------------------------------------------------------------------------
# §8 Distributed scan tier — a TABLE of URLs scanned on the executors
# ---------------------------------------------------------------------------
SCAN_SCHEMA = (
    "url string, status_code int, headers_present array<string>,"
    " missing_high int, missing_medium int, missing_low int,"
    " leaky_count int, hsts boolean, csp boolean,"
    " x_frame_options boolean, x_content_type_options boolean,"
    " referrer_policy boolean, permissions_policy boolean,"
    " no_leaky_headers boolean, error string"
)


def scan_headers_table(urls: DataFrame, url_col: str = "url",
                       timeout_s: float = 10.0,
                       transport_factory: Callable | None = None,
                       ) -> DataFrame:
    """Security-header scan of every URL in a table, ON THE EXECUTORS
    (``mapInPandas`` — the ``fetch_urls`` crawl discipline): map-only,
    no shuffle, per-row error envelopes, grade_input flattened to
    boolean columns that feed ``risk_grade_columns`` directly.

    ``transport_factory`` (picklable by value — use a lambda/closure)
    builds the per-executor transport; default is the live stdlib GET.
    Partition the input by host (``http_source.partition_by_host``)
    for per-host politeness at crawl scale."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        transport = (transport_factory() if transport_factory
                     else page_transport(timeout=timeout_s))
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                base = {
                    "url": url, "status_code": None,
                    "headers_present": None, "missing_high": None,
                    "missing_medium": None, "missing_low": None,
                    "leaky_count": None, "hsts": None, "csp": None,
                    "x_frame_options": None,
                    "x_content_type_options": None,
                    "referrer_policy": None, "permissions_policy": None,
                    "no_leaky_headers": None, "error": None,
                }
                env = http_headers_scan(str(url), transport=transport)
                if "error" in env:
                    base["error"] = env["error"]
                else:
                    sev = [m["severity"] for m in env["headers_missing"]]
                    gi = env["grade_input"]
                    base.update(
                        status_code=env["status_code"],
                        headers_present=env["headers_present"],
                        missing_high=sev.count("high"),
                        missing_medium=sev.count("medium"),
                        missing_low=sev.count("low"),
                        leaky_count=len(env["leaky_headers"]),
                        **gi,
                    )
                rows.append(base)
            yield pd.DataFrame(
                rows, columns=[f.split()[0] for f in SCAN_SCHEMA.split(",")]
            )

    return urls.select(url_col).mapInPandas(run, SCAN_SCHEMA)
