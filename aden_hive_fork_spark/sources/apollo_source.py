"""Apollo.io enrichment connector — person/company enrichment and
filtered search with envelope parity, on the pluggable REST
transport seam.

Reference analogs (tools/src/aden_tools/tools/apollo_tool/
apollo_tool.py): X-Api-Key client (:30-43); error map
``_handle_response`` (:45-70 — 401 key, 403 credits with help, 404,
422 invalid params with detail, 429, else detail); person
enrichment ``/people/match`` (:72-144 — match-by email/linkedin/
name+domain, reveal flags, graceful ``match_found: False``,
flattened person + embedded organization envelope); company
enrichment ``/organizations/enrich`` (:146-196 — flattened
funding/size/tech envelope); people search ``/mixed_people/search``
(:198-270 — filter body with person_titles/seniorities/locations/
employee ranges/industry tags/technology uids, pagination envelope);
company search ``/mixed_companies/search`` (:272-330).

Executor tier: ``apollo_enrich_table`` enriches a TABLE of emails
(mapInPandas, map-only, per-row error envelopes) — CRM enrichment as
a columnar step before identity resolution / dedup.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

APOLLO_API_BASE = "https://api.apollo.io/api/v1"

NO_CREDS = {
    "error": "Apollo credentials not configured",
    "help": "Set APOLLO_API_KEY environment variable",
}


def _person_envelope(person: dict) -> dict:
    org = person.get("organization") or {}
    return {
        "id": person.get("id"),
        "first_name": person.get("first_name"),
        "last_name": person.get("last_name"),
        "name": person.get("name"),
        "title": person.get("title"),
        "email": person.get("email"),
        "email_status": person.get("email_status"),
        "phone_numbers": person.get("phone_numbers", []),
        "linkedin_url": person.get("linkedin_url"),
        "twitter_url": person.get("twitter_url"),
        "city": person.get("city"),
        "state": person.get("state"),
        "country": person.get("country"),
        "organization": {
            "id": org.get("id"),
            "name": org.get("name"),
            "domain": org.get("primary_domain"),
            "industry": org.get("industry"),
            "employee_count": org.get("estimated_num_employees"),
        },
    }


class ApolloClient:
    """Apollo API client. ``transport(method, url, params, json_body,
    headers) -> (status, bytes)``."""

    def __init__(self, api_key: str, transport):
        self._api_key = api_key
        self.transport = transport

    @property
    def _headers(self) -> dict[str, str]:
        return {
            "Content-Type": "application/json",
            "Accept": "application/json",
            "Cache-Control": "no-cache",
            "X-Api-Key": self._api_key,
        }

    def _handle(self, status: int, body: bytes) -> dict:
        def detail():
            try:
                return json.loads(body).get(
                    "error", body.decode(errors="replace"))
            except Exception:
                return body.decode(errors="replace")

        if status == 401:
            return {"error": "Invalid Apollo API key"}
        if status == 403:
            return {
                "error": "Insufficient credits or permissions. "
                         "Check your Apollo plan.",
                "help": "Apollo uses export credits for enrichment.",
            }
        if status == 404:
            return {"error": "Resource not found"}
        if status == 422:
            return {"error": f"Invalid parameters: {detail()}"}
        if status == 429:
            return {"error": "Apollo rate limit exceeded. Try again later."}
        if status >= 400:
            return {"error": f"Apollo API error (HTTP {status}): "
                             f"{detail()}"}
        try:
            return json.loads(body)
        except Exception:
            return {}

    def _post(self, path: str, body: dict, params: dict | None = None
              ) -> dict:
        try:
            status, rbody = self.transport(
                "POST", f"{APOLLO_API_BASE}{path}", params, body,
                self._headers,
            )
        except Exception as e:
            return {"error": f"Network error: {e}"}
        return self._handle(status, rbody)

    def enrich_person(self, email=None, linkedin_url=None, first_name=None,
                      last_name=None, name=None, domain=None,
                      reveal_personal_emails: bool = False,
                      reveal_phone_number: bool = False) -> dict:
        body: dict = {
            "reveal_personal_emails": reveal_personal_emails,
            "reveal_phone_number": reveal_phone_number,
        }
        for k, v in (("email", email), ("linkedin_url", linkedin_url),
                     ("first_name", first_name), ("last_name", last_name),
                     ("name", name), ("domain", domain)):
            if v:
                body[k] = v
        result = self._post(
            "/people/match", body,
            params=body if not email and not linkedin_url else None,
        )
        if "error" in result:
            return result
        if result.get("person") is None:
            return {"match_found": False,
                    "message": "No matching person found"}
        return {"match_found": True,
                "person": _person_envelope(result["person"])}

    def enrich_company(self, domain: str) -> dict:
        result = self._post("/organizations/enrich", {"domain": domain})
        if "error" in result:
            return result
        if result.get("organization") is None:
            return {"match_found": False,
                    "message": "No matching company found"}
        org = result["organization"]
        return {
            "match_found": True,
            "organization": {
                "id": org.get("id"),
                "name": org.get("name"),
                "domain": org.get("primary_domain"),
                "website_url": org.get("website_url"),
                "linkedin_url": org.get("linkedin_url"),
                "twitter_url": org.get("twitter_url"),
                "facebook_url": org.get("facebook_url"),
                "industry": org.get("industry"),
                "keywords": org.get("keywords", []),
                "employee_count": org.get("estimated_num_employees"),
                "employee_count_range": org.get("employee_count_range"),
                "annual_revenue": org.get("annual_revenue"),
                "annual_revenue_printed": org.get("annual_revenue_printed"),
                "total_funding": org.get("total_funding"),
                "total_funding_printed": org.get("total_funding_printed"),
                "latest_funding_round_date": org.get(
                    "latest_funding_round_date"),
                "latest_funding_stage": org.get("latest_funding_stage"),
                "founded_year": org.get("founded_year"),
                "phone": org.get("phone"),
                "city": org.get("city"),
                "state": org.get("state"),
                "country": org.get("country"),
                "street_address": org.get("street_address"),
                "technologies": org.get("technologies", []),
                "short_description": org.get("short_description"),
            },
        }

    def search_people(self, titles=None, seniorities=None, locations=None,
                      company_sizes=None, industries=None,
                      technologies=None, limit: int = 10) -> dict:
        body: dict = {"per_page": min(limit, 100), "page": 1}
        if titles:
            body["person_titles"] = titles
        if seniorities:
            body["person_seniorities"] = seniorities
        if locations:
            body["person_locations"] = locations
        if company_sizes:
            body["organization_num_employees_ranges"] = company_sizes
        if industries:
            body["organization_industry_tag_ids"] = industries
        if technologies:
            body["currently_using_any_of_technology_uids"] = technologies
        result = self._post("/mixed_people/search", body)
        if "error" in result:
            return result
        people = result.get("people", [])
        pg = result.get("pagination", {})
        return {
            "total": pg.get("total_entries", len(people)),
            "page": pg.get("page", 1),
            "per_page": pg.get("per_page", limit),
            "results": [
                {
                    "id": p.get("id"),
                    "first_name": p.get("first_name"),
                    "last_name": p.get("last_name"),
                    "name": p.get("name"),
                    "title": p.get("title"),
                    "email": p.get("email"),
                    "email_status": p.get("email_status"),
                    "linkedin_url": p.get("linkedin_url"),
                    "city": p.get("city"),
                    "state": p.get("state"),
                    "country": p.get("country"),
                    "seniority": p.get("seniority"),
                    "organization": {
                        "id": (p.get("organization") or {}).get("id"),
                        "name": (p.get("organization") or {}).get("name"),
                        "domain": (p.get("organization") or {}).get(
                            "primary_domain"),
                    },
                }
                for p in people
            ],
        }

    def search_companies(self, industries=None, employee_counts=None,
                         locations=None, technologies=None,
                         limit: int = 10) -> dict:
        body: dict = {"per_page": min(limit, 100), "page": 1}
        if industries:
            body["organization_industry_tag_ids"] = industries
        if employee_counts:
            body["organization_num_employees_ranges"] = employee_counts
        if locations:
            body["organization_locations"] = locations
        if technologies:
            body["currently_using_any_of_technology_uids"] = technologies
        result = self._post("/mixed_companies/search", body)
        if "error" in result:
            return result
        orgs = result.get("organizations", [])
        pg = result.get("pagination", {})
        return {
            "total": pg.get("total_entries", len(orgs)),
            "page": pg.get("page", 1),
            "per_page": pg.get("per_page", limit),
            "results": [
                {
                    "id": o.get("id"),
                    "name": o.get("name"),
                    "domain": o.get("primary_domain"),
                    "website_url": o.get("website_url"),
                    "linkedin_url": o.get("linkedin_url"),
                    "industry": o.get("industry"),
                    "employee_count": o.get("estimated_num_employees"),
                    "employee_count_range": o.get("employee_count_range"),
                    "annual_revenue_printed": o.get(
                        "annual_revenue_printed"),
                    "city": o.get("city"),
                    "state": o.get("state"),
                    "country": o.get("country"),
                    "short_description": o.get("short_description"),
                }
                for o in orgs
            ],
        }


ENRICH_SCHEMA = (
    "email string, match_found boolean, person_id string, name string, "
    "title string, org_name string, org_domain string, error string"
)


def apollo_enrich_table(emails: DataFrame, client_factory,
                        email_col: str = "email") -> DataFrame:
    """Enrich a TABLE of emails on the executors (mapInPandas,
    map-only, per-row error envelopes). ``client_factory`` must
    pickle by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in ENRICH_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for email in pdf[email_col]:
                env = client.enrich_person(email=str(email))
                if "error" in env:
                    rows.append({"email": email, "match_found": None,
                                 "person_id": None, "name": None,
                                 "title": None, "org_name": None,
                                 "org_domain": None, "error": env["error"]})
                    continue
                if not env["match_found"]:
                    rows.append({"email": email, "match_found": False,
                                 "person_id": None, "name": None,
                                 "title": None, "org_name": None,
                                 "org_domain": None, "error": None})
                    continue
                p = env["person"]
                rows.append({
                    "email": email, "match_found": True,
                    "person_id": p.get("id"), "name": p.get("name"),
                    "title": p.get("title"),
                    "org_name": p["organization"].get("name"),
                    "org_domain": p["organization"].get("domain"),
                    "error": None,
                })
            yield pd.DataFrame(rows, columns=cols)

    return emails.select(email_col).mapInPandas(run, ENRICH_SCHEMA)
