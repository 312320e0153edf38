"""Vision extraction — pluggable analog of the reference's Vision-API
tool (tools/src/aden_tools/tools/vision_tool/vision_tool.py:35-520),
closing the §2.A row 36 label/text/properties gap.

The reference routes every call through a cloud Vision API client.
This sandbox has no network, so the design splits the seam the same
way as the LLM and search tiers (SURVEY §7.5): a DETERMINISTIC LOCAL
tier computes everything a pixel decoder can honestly compute —
heuristic content labels, embedded tEXt metadata as the OCR analog,
dominant colors + crop hints from the real pixel histogram — and the
API-dependent detectors (faces, objects, logos, landmarks) route to a
pluggable ``api_backend``; without one they return the reference's
not-configured error envelope (vision_tool.py:361-369) instead of
fabricating detections.

Envelope parity (result shapes match the reference client):
- ``detect_labels``        → ``{"labels": [{"description", "score"}]}``
  (vision_tool.py:115-131)
- ``detect_text``          → ``{"text", "blocks": [{"text", "bounds"}]}``
  (vision_tool.py:133-156)
- ``get_image_properties`` → ``{"colors": [{"red","green","blue",
  "score","pixel_fraction"}], "crop_hints": [{"bounds","confidence"}]}``
  (vision_tool.py:254-290)
- ``_load_image`` errors   → File not found / Not a file / 10MB cap
  (vision_tool.py:42-72)

Two tiers by cardinality, like search_source: driver-side client for
one image, ``annotate_images`` (Arrow-batched mapInPandas) for a
corpus — at 100 TB the binary column comes from binaryFile ingest and
annotation is map-only, no shuffle.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

MAX_FILE_SIZE = 10 * 1024 * 1024  # reference parity: 10MB cap


def _label_heuristics(feats: dict) -> list[dict]:
    """Deterministic content labels from honest pixel statistics.

    Every label is a *measured* property (brightness band, contrast
    band, palette size, aspect, resolution) with its driving statistic
    as the confidence — not a guess at semantics the pixels can't
    support. Scores are in [0,1], rounded to 3 like the reference.
    """
    labels: list[tuple[str, float]] = []
    b, c = feats["brightness"], feats["contrast"]
    w, h, ch = feats["width"], feats["height"], feats["channels"]
    if b >= 0.7:
        labels.append(("bright", b))
    elif b <= 0.3:
        labels.append(("dark", 1.0 - b))
    else:
        labels.append(("midtone", 1.0 - abs(b - 0.5)))
    labels.append(("textured", min(1.0, c * 4)) if c >= 0.15 else ("flat", 1.0 - c * 4))
    labels.append(
        ("palette-limited", 1.0 - feats["n_colors"] / 4096.0)
        if feats["n_colors"] <= 64
        else ("colorful", min(1.0, feats["n_colors"] / 4096.0))
    )
    aspect = w / h if h else 1.0
    if aspect >= 1.5:
        labels.append(("wide", min(1.0, aspect / 3)))
    elif aspect <= 1 / 1.5:
        labels.append(("tall", min(1.0, 1 / (aspect * 3) if aspect else 1.0)))
    else:
        labels.append(("squarish", 1.0 - abs(aspect - 1.0)))
    if ch == 1:
        labels.append(("grayscale", 1.0))
    if ch == 4:
        labels.append(("has-alpha", 1.0))
    labels.append(
        ("high-resolution", min(1.0, max(w, h) / 4096.0))
        if max(w, h) >= 1024
        else ("thumbnail", 1.0 - max(w, h) / 1024.0)
    )
    labels.sort(key=lambda ls: (-ls[1], ls[0]))
    return [{"description": d, "score": round(s, 3)} for d, s in labels]


def _png_annotations(b: bytes, max_labels: int = 10) -> dict | None:
    """All local-tier annotations for one PNG byte string, or None if
    the bytes don't decode. Shared by the client and the distributed
    annotator so the two tiers agree exactly."""
    import numpy as np

    from .png_codec import png_decode, png_features, png_text_chunks

    feats = png_features(b)
    if feats is None:
        return None
    labels = _label_heuristics(feats)[:max_labels]
    texts = png_text_chunks(b)
    full_text = "\n".join(v for _, v in texts)
    blocks = [{"text": v, "bounds": []} for _, v in texts]
    img = png_decode(b)
    flat = img.reshape(-1, img.shape[2])[:, :3]
    if flat.shape[1] < 3:  # grayscale -> replicate
        flat = np.repeat(flat[:, :1], 3, axis=1)
    # full-image histogram: np.unique over every pixel (decode is
    # already size-capped upstream, so this is at most a few MB) —
    # score/pixel_fraction describe the WHOLE image, no sampling.
    colors, counts = np.unique(flat, axis=0, return_counts=True)
    order = np.argsort(-counts, kind="stable")[:5]
    total = float(counts.sum())
    dom = [
        {
            "red": int(colors[i][0]),
            "green": int(colors[i][1]),
            "blue": int(colors[i][2]),
            "score": round(float(counts[i]) / total, 3),
            "pixel_fraction": round(float(counts[i]) / total, 3),
        }
        for i in order
    ]
    w, h = feats["width"], feats["height"]
    crop = [
        {
            "bounds": [
                {"x": 0, "y": 0},
                {"x": w - 1, "y": 0},
                {"x": w - 1, "y": h - 1},
                {"x": 0, "y": h - 1},
            ],
            "confidence": 1.0,
        }
    ]
    return {
        "labels": labels,
        "text": full_text,
        "blocks": blocks,
        "colors": dom,
        "crop_hints": crop,
    }


class LocalVisionClient:
    """Deterministic local vision tier + pluggable API seam.

    ``api_backend``: optional callable ``(image_bytes, feature) ->
    dict`` for the detectors with no local analog; None models the
    reference's unconfigured-credentials state (vision_tool.py:361-369).
    """

    def __init__(self, api_backend: Callable[[bytes, str], dict] | None = None):
        self.api_backend = api_backend

    # -- reference _load_image parity (vision_tool.py:42-72) --------------
    def _load_bytes(self, image_source: str) -> bytes | dict:
        if isinstance(image_source, (bytes, bytearray)):
            return bytes(image_source)
        if image_source.startswith(("http://", "https://")):
            return {
                "error": "URL image sources require a network backend",
                "help": "Fetch with sources.http_source.fetch_urls, then pass bytes",
            }
        if not os.path.exists(image_source):
            return {"error": f"File not found: {image_source}"}
        if not os.path.isfile(image_source):
            return {"error": f"Not a file: {image_source}"}
        size = os.path.getsize(image_source)
        if size > MAX_FILE_SIZE:
            return {"error": f"File exceeds 10MB limit ({size / (1024 * 1024):.1f}MB)"}
        with open(image_source, "rb") as f:
            return f.read()

    def _local(self, image_source, max_labels: int = 10) -> dict:
        b = self._load_bytes(image_source)
        if isinstance(b, dict):
            return b
        ann = _png_annotations(b, max_labels=max_labels)
        if ann is None:
            return {"error": "Invalid request. Check image format and size."}
        return ann

    # -- locally-computable detectors -------------------------------------
    def detect_labels(self, image_source, max_results: int = 10) -> dict:
        out = self._local(image_source, max_labels=min(max(1, max_results), 100))
        return out if "error" in out else {"labels": out["labels"]}

    def detect_text(self, image_source) -> dict:
        out = self._local(image_source)
        if "error" in out:
            return out
        return {"text": out["text"], "blocks": out["blocks"]}

    def get_image_properties(self, image_source) -> dict:
        out = self._local(image_source)
        if "error" in out:
            return out
        return {"colors": out["colors"], "crop_hints": out["crop_hints"]}

    # -- API-only detectors: route to the pluggable backend ----------------
    def _api(self, image_source, feature: str) -> dict:
        if self.api_backend is None:
            return {
                "error": "Vision API backend not configured",
                "help": "Construct LocalVisionClient(api_backend=...) with a client",
            }
        b = self._load_bytes(image_source)
        if isinstance(b, dict):
            return b
        return self.api_backend(b, feature)

    def detect_faces(self, image_source, max_faces: int = 10) -> dict:
        return self._api(image_source, "FACE_DETECTION")

    def localize_objects(self, image_source, max_objects: int = 10) -> dict:
        return self._api(image_source, "OBJECT_LOCALIZATION")

    def detect_logos(self, image_source, max_logos: int = 5) -> dict:
        return self._api(image_source, "LOGO_DETECTION")

    def detect_landmarks(self, image_source, max_landmarks: int = 5) -> dict:
        return self._api(image_source, "LANDMARK_DETECTION")


# ---------------------------------------------------------------------------
# distributed tier
# ---------------------------------------------------------------------------
ANNOTATE_SCHEMA = (
    "path string, mime string,"
    " labels array<struct<description string, score double>>,"
    " text string,"
    " colors array<struct<red int, green int, blue int,"
    " score double, pixel_fraction double>>,"
    " error string"
)


def annotate_images(
    df: DataFrame, content_col: str = "content", max_labels: int = 10
) -> DataFrame:
    """Corpus-scale vision annotation: labels + embedded text +
    dominant colors per asset, Arrow-batched on the executors.

    Map-only (no shuffle); non-PNG/undecodable assets get an error
    ENVELOPE row, never an exception — one corrupt asset can't fail a
    100 TB annotation stage. Same per-image code path as
    ``LocalVisionClient``, so driver and cluster tiers agree."""
    from .binary import sniff_mime

    cols = [c for c in ("path", content_col) if c in df.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                b = r.get(content_col)
                b = bytes(b) if b is not None else b""
                mime = sniff_mime(b)
                row = {
                    "path": r.get("path", ""),
                    "mime": mime,
                    "labels": None,
                    "text": None,
                    "colors": None,
                    "error": None,
                }
                if mime != "image/png":
                    row["error"] = f"unsupported_mime:{mime}"
                else:
                    ann = _png_annotations(b, max_labels=max_labels)
                    if ann is None:
                        row["error"] = "decode_failed"
                    else:
                        row["labels"] = [
                            (l["description"], l["score"]) for l in ann["labels"]
                        ]
                        row["text"] = ann["text"]
                        row["colors"] = [
                            (
                                c["red"],
                                c["green"],
                                c["blue"],
                                c["score"],
                                c["pixel_fraction"],
                            )
                            for c in ann["colors"]
                        ]
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["path", "mime", "labels", "text", "colors", "error"]
            )

    return df.select(*cols).mapInPandas(run, ANNOTATE_SCHEMA)


# ---------------------------------------------------------------------------
# Concrete REST backend for the api_backend seam — the public Vision
# ``images:annotate`` wire format (request: {"requests": [{"image":
# {"content": b64}, "features": [{"type", "maxResults"}]}]}; response:
# {"responses": [{<feature>Annotations: [...]}]}), with the same status
# →error mapping and annotation→envelope parsing as the reference
# client (vision_tool.py:60-174). Transport is pluggable so the SAME
# parsing code runs against live HTTP (urllib) or recorded fixtures —
# record/replay keeps the adapter fully testable offline.
# ---------------------------------------------------------------------------
_FEATURE_MAX = {
    "FACE_DETECTION": 10,
    "OBJECT_LOCALIZATION": 10,
    "LOGO_DETECTION": 5,
    "LANDMARK_DETECTION": 5,
}


class RestVisionBackend:
    """``api_backend`` callable for ``LocalVisionClient``: maps
    (image_bytes, feature) through the public annotate REST shape.

    ``transport(request_json: dict) -> (status_code, body_bytes)``.
    Use ``http_transport(url, api_key)`` for a live endpoint or
    ``FixtureVisionTransport`` for recorded responses.
    """

    def __init__(self, transport: Callable[[dict], tuple[int, bytes]]):
        self.transport = transport

    def __call__(self, image_bytes: bytes, feature: str) -> dict:
        import base64

        req = {
            "requests": [
                {
                    "image": {
                        "content": base64.b64encode(image_bytes).decode("ascii")
                    },
                    "features": [
                        {
                            "type": feature,
                            "maxResults": _FEATURE_MAX.get(feature, 10),
                        }
                    ],
                }
            ]
        }
        try:
            status, body = self.transport(req)
        except TimeoutError:
            return {"error": "Request timed out"}
        except OSError as e:  # pragma: no cover - live-transport only
            return {"error": f"Network error: {e}"}
        result = self._handle_response(status, body)
        if "error" in result:
            return result
        return self._parse(feature, result)

    # status mapping — reference vision_tool.py:91-103 parity
    @staticmethod
    def _handle_response(status: int, body: bytes) -> dict:
        import json

        if status == 400:
            return {"error": "Invalid request. Check image format and size."}
        if status == 401:
            return {"error": "Invalid API key"}
        if status == 403:
            return {"error": "API key not authorized for the Vision API"}
        if status == 429:
            return {"error": "Rate limit exceeded. Try again later."}
        if status != 200:
            return {"error": f"Vision API error (HTTP {status})"}
        try:
            data = json.loads(body)
        except ValueError:
            return {"error": "Malformed API response"}
        responses = data.get("responses", [])
        if not responses:
            return {"error": "Empty response from API"}
        result = responses[0]
        if "error" in result:
            return {"error": result["error"].get("message", "Unknown API error")}
        return result

    # annotation → envelope parsing — vision_tool.py:108-174 parity
    @staticmethod
    def _parse(feature: str, result: dict) -> dict:
        if feature == "FACE_DETECTION":
            return {
                "faces": [
                    {
                        "joy": f.get("joyLikelihood", "UNKNOWN"),
                        "sorrow": f.get("sorrowLikelihood", "UNKNOWN"),
                        "anger": f.get("angerLikelihood", "UNKNOWN"),
                        "surprise": f.get("surpriseLikelihood", "UNKNOWN"),
                        "confidence": round(f.get("detectionConfidence", 0), 3),
                        "bounds": f.get("boundingPoly", {}).get("vertices", []),
                    }
                    for f in result.get("faceAnnotations", [])
                ]
            }
        if feature == "OBJECT_LOCALIZATION":
            return {
                "objects": [
                    {
                        "name": o.get("name", ""),
                        "score": round(o.get("score", 0), 3),
                        "bounds": o.get("boundingPoly", {}).get(
                            "normalizedVertices", []
                        ),
                    }
                    for o in result.get("localizedObjectAnnotations", [])
                ]
            }
        if feature == "LOGO_DETECTION":
            return {
                "logos": [
                    {
                        "description": lg.get("description", ""),
                        "score": round(lg.get("score", 0), 3),
                    }
                    for lg in result.get("logoAnnotations", [])
                ]
            }
        if feature == "LANDMARK_DETECTION":
            landmarks = []
            for lm in result.get("landmarkAnnotations", []):
                location = {}
                locations = lm.get("locations", [])
                if locations:
                    lat_lng = locations[0].get("latLng", {})
                    location = {
                        "latitude": lat_lng.get("latitude"),
                        "longitude": lat_lng.get("longitude"),
                    }
                landmarks.append(
                    {
                        "description": lm.get("description", ""),
                        "score": round(lm.get("score", 0), 3),
                        "location": location,
                    }
                )
            return {"landmarks": landmarks}
        return {"error": f"Unsupported feature: {feature}"}


def http_transport(url: str, api_key: str, timeout: float = 30.0):
    """Live transport for ``RestVisionBackend`` (stdlib urllib — the
    sandbox has no network, so this path is exercised via recorded
    fixtures; the request/parse layers above are transport-agnostic)."""

    def send(req: dict) -> tuple[int, bytes]:
        import json
        import urllib.error
        import urllib.request

        data = json.dumps(req).encode()
        r = urllib.request.Request(
            f"{url}?key={api_key}",
            data=data,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(r, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return send


class FixtureVisionTransport:
    """Record/replay transport: responses keyed by (feature,
    sha256(image)[:16]). ``record`` mode wraps a live transport and
    stores every response for later offline replay (the pattern the
    LLM tier uses as well)."""

    def __init__(self, fixtures: dict | None = None,
                 live: Callable[[dict], tuple[int, bytes]] | None = None):
        self.fixtures: dict[tuple[str, str], tuple[int, bytes]] = dict(
            fixtures or {}
        )
        self.live = live

    @staticmethod
    def _key(req: dict) -> tuple[str, str]:
        import base64
        import hashlib

        r = req["requests"][0]
        feature = r["features"][0]["type"]
        img = base64.b64decode(r["image"]["content"])
        return feature, hashlib.sha256(img).hexdigest()[:16]

    def __call__(self, req: dict) -> tuple[int, bytes]:
        key = self._key(req)
        if key in self.fixtures:
            return self.fixtures[key]
        if self.live is not None:  # record mode
            resp = self.live(req)
            self.fixtures[key] = resp
            return resp
        return 404, b'{"error": {"message": "no fixture for request"}}'
