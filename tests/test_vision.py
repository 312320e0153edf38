"""Vision extraction (sources/vision) — envelope parity with the
reference vision tool (vision_tool.py:35-520): local deterministic
tier (labels / tEXt text / dominant colors), load-image error
envelopes, pluggable API backend routing, and the distributed
annotator's error-as-data contract."""

from __future__ import annotations

import numpy as np
import pytest

from aden_hive_fork_spark.sources.png_codec import png_encode, png_text_chunks
from aden_hive_fork_spark.sources.vision import LocalVisionClient, annotate_images


def _png(value: int = 230, size: int = 8, texts=None) -> bytes:
    img = np.full((size, size, 3), value, dtype=np.uint8)
    return png_encode(img, texts=texts)


def _two_tone_png() -> bytes:
    """Left half red, right half blue — exact 0.5 pixel fractions."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :4] = [200, 10, 10]
    img[:, 4:] = [10, 10, 200]
    return png_encode(img)


# -- _load_image error parity (vision_tool.py:42-72) -----------------------
def test_file_not_found_envelope(tmp_path):
    c = LocalVisionClient()
    out = c.detect_labels(str(tmp_path / "nope.png"))
    assert out == {"error": f"File not found: {tmp_path / 'nope.png'}"}


def test_not_a_file_envelope(tmp_path):
    c = LocalVisionClient()
    out = c.detect_labels(str(tmp_path))
    assert out["error"].startswith("Not a file:")


def test_size_cap_envelope(tmp_path):
    p = tmp_path / "big.png"
    p.write_bytes(b"\x00" * (10 * 1024 * 1024 + 1))
    out = LocalVisionClient().detect_labels(str(p))
    assert "exceeds 10MB limit" in out["error"]


def test_url_requires_backend():
    out = LocalVisionClient().detect_labels("https://example.com/x.png")
    assert "network backend" in out["error"]


def test_undecodable_bytes_envelope():
    out = LocalVisionClient().detect_labels(b"not a png")
    assert out == {"error": "Invalid request. Check image format and size."}


# -- local detectors -------------------------------------------------------
def test_detect_labels_bright_flat(tmp_path):
    p = tmp_path / "bright.png"
    p.write_bytes(_png(value=240))
    out = LocalVisionClient().detect_labels(str(p))
    descs = [l["description"] for l in out["labels"]]
    assert "bright" in descs and "flat" in descs and "palette-limited" in descs
    assert all(0.0 <= l["score"] <= 1.0 for l in out["labels"])
    # deterministic: same image, same labels
    assert out == LocalVisionClient().detect_labels(str(p))


def test_detect_labels_max_results_clamp():
    out = LocalVisionClient().detect_labels(_png(), max_results=2)
    assert len(out["labels"]) == 2


def test_detect_text_reads_text_chunks():
    b = _png(texts={"caption": "hello world", "author": "fixture"})
    assert ("caption", "hello world") in png_text_chunks(b)
    out = LocalVisionClient().detect_text(b)
    assert "hello world" in out["text"] and "fixture" in out["text"]
    assert {bl["text"] for bl in out["blocks"]} == {"hello world", "fixture"}


def test_detect_text_empty_without_chunks():
    out = LocalVisionClient().detect_text(_png())
    assert out == {"text": "", "blocks": []}


def test_image_properties_dominant_colors():
    out = LocalVisionClient().get_image_properties(_two_tone_png())
    top2 = {(c["red"], c["green"], c["blue"]): c["pixel_fraction"] for c in out["colors"][:2]}
    assert top2 == {(200, 10, 10): 0.5, (10, 10, 200): 0.5}
    hint = out["crop_hints"][0]
    assert hint["confidence"] == 1.0 and hint["bounds"][2] == {"x": 7, "y": 7}


# -- API seam --------------------------------------------------------------
def test_api_detectors_unconfigured():
    c = LocalVisionClient()
    for fn in (c.detect_faces, c.localize_objects, c.detect_logos, c.detect_landmarks):
        out = fn(_png())
        assert out["error"] == "Vision API backend not configured"


def test_api_backend_routing():
    calls = []

    def backend(b: bytes, feature: str) -> dict:
        calls.append(feature)
        return {"faces": [], "feature": feature}

    c = LocalVisionClient(api_backend=backend)
    out = c.detect_faces(_png())
    assert out["feature"] == "FACE_DETECTION" and calls == ["FACE_DETECTION"]
    # load errors still short-circuit before the backend
    err = c.detect_faces("/no/such/file.png")
    assert "File not found" in err["error"] and len(calls) == 1


# -- distributed tier ------------------------------------------------------
def test_annotate_images_matches_client_and_envelopes(spark):
    rows = [
        ("a.png", _png(value=240, texts={"caption": "sunny"})),
        ("b.bin", b"\x00\x01\x02 not an image"),
        ("c.png", b"\x89PNG\r\n\x1a\n truncated"),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: r.asDict(recursive=True) for r in annotate_images(df).collect()}
    assert got["b.bin"]["error"].startswith("unsupported_mime")
    assert got["c.png"]["error"] == "decode_failed"
    a = got["a.png"]
    assert a["error"] is None and a["text"] == "sunny"
    client = LocalVisionClient().detect_labels(rows[0][1])
    assert [l["description"] for l in a["labels"]] == [
        l["description"] for l in client["labels"]
    ]


def test_png_text_chunk_validation():
    """Spec-invalid tEXt entries raise clear errors — review r3."""
    import pytest as _pytest

    for bad in ({"caption": "snow ☃"}, {"": "x"}, {"k" * 80: "x"}, {"a\x00b": "x"}, {"k": "a\x00b"}):
        with _pytest.raises(ValueError):
            _png(texts=bad)


# ---------------------------------------------------------------------------
# RestVisionBackend conformance (VERDICT r3 #5): recorded public-API
# responses drive the api_backend seam; envelopes must match the
# reference client's shapes (vision_tool.py:108-174).
# ---------------------------------------------------------------------------
def _fixture_transport(img: bytes, feature: str, payload: dict, status=200):
    import hashlib
    import json

    from aden_hive_fork_spark.sources.vision import FixtureVisionTransport

    key = (feature, hashlib.sha256(img).hexdigest()[:16])
    return FixtureVisionTransport(
        {key: (status, json.dumps(payload).encode())}
    )


def test_rest_backend_faces_envelope():
    from aden_hive_fork_spark.sources.vision import (
        LocalVisionClient,
        RestVisionBackend,
    )

    img = b"\xff\xd8\xfffake-jpeg-bytes"
    recorded = {
        "responses": [
            {
                "faceAnnotations": [
                    {
                        "joyLikelihood": "VERY_LIKELY",
                        "sorrowLikelihood": "VERY_UNLIKELY",
                        "angerLikelihood": "UNLIKELY",
                        "surpriseLikelihood": "POSSIBLE",
                        "detectionConfidence": 0.9876,
                        "boundingPoly": {
                            "vertices": [{"x": 1, "y": 2}, {"x": 30, "y": 2}]
                        },
                    }
                ]
            }
        ]
    }
    backend = RestVisionBackend(
        _fixture_transport(img, "FACE_DETECTION", recorded)
    )
    client = LocalVisionClient(api_backend=backend)
    out = client.detect_faces(img)
    assert out == {
        "faces": [
            {
                "joy": "VERY_LIKELY",
                "sorrow": "VERY_UNLIKELY",
                "anger": "UNLIKELY",
                "surprise": "POSSIBLE",
                "confidence": 0.988,
                "bounds": [{"x": 1, "y": 2}, {"x": 30, "y": 2}],
            }
        ]
    }


def test_rest_backend_objects_logos_landmarks():
    from aden_hive_fork_spark.sources.vision import (
        LocalVisionClient,
        RestVisionBackend,
    )

    img = b"\x89PNG\r\n\x1a\nfakepng"
    cases = {
        "OBJECT_LOCALIZATION": (
            {
                "responses": [
                    {
                        "localizedObjectAnnotations": [
                            {
                                "name": "Cat",
                                "score": 0.77777,
                                "boundingPoly": {
                                    "normalizedVertices": [{"x": 0.1, "y": 0.2}]
                                },
                            }
                        ]
                    }
                ]
            },
            {"objects": [{"name": "Cat", "score": 0.778,
                          "bounds": [{"x": 0.1, "y": 0.2}]}]},
        ),
        "LOGO_DETECTION": (
            {"responses": [{"logoAnnotations": [
                {"description": "ACME", "score": 0.5}]}]},
            {"logos": [{"description": "ACME", "score": 0.5}]},
        ),
        "LANDMARK_DETECTION": (
            {
                "responses": [
                    {
                        "landmarkAnnotations": [
                            {
                                "description": "Big Tower",
                                "score": 0.9,
                                "locations": [
                                    {"latLng": {"latitude": 48.858,
                                                "longitude": 2.294}}
                                ],
                            }
                        ]
                    }
                ]
            },
            {"landmarks": [{"description": "Big Tower", "score": 0.9,
                            "location": {"latitude": 48.858,
                                         "longitude": 2.294}}]},
        ),
    }
    for feature, (recorded, want) in cases.items():
        backend = RestVisionBackend(_fixture_transport(img, feature, recorded))
        client = LocalVisionClient(api_backend=backend)
        got = {
            "OBJECT_LOCALIZATION": client.localize_objects,
            "LOGO_DETECTION": client.detect_logos,
            "LANDMARK_DETECTION": client.detect_landmarks,
        }[feature](img)
        assert got == want, feature


def test_rest_backend_error_mapping():
    from aden_hive_fork_spark.sources.vision import RestVisionBackend

    img = b"\xff\xd8\xffx"
    for status, msg in [
        (400, "Invalid request. Check image format and size."),
        (401, "Invalid API key"),
        (429, "Rate limit exceeded. Try again later."),
        (500, "Vision API error (HTTP 500)"),
    ]:
        backend = RestVisionBackend(lambda req, s=status: (s, b"{}"))
        assert backend(img, "FACE_DETECTION") == {"error": msg}
    # API-level error object inside a 200
    import json

    payload = {"responses": [{"error": {"message": "quota exhausted"}}]}
    backend = RestVisionBackend(lambda req: (200, json.dumps(payload).encode()))
    assert backend(img, "FACE_DETECTION") == {"error": "quota exhausted"}
    # missing fixture
    from aden_hive_fork_spark.sources.vision import FixtureVisionTransport

    backend = RestVisionBackend(FixtureVisionTransport())
    assert "error" in backend(img, "LOGO_DETECTION")


def test_fixture_transport_record_mode():
    """record mode captures live responses for later offline replay."""
    import json

    from aden_hive_fork_spark.sources.vision import (
        FixtureVisionTransport,
        RestVisionBackend,
    )

    calls = []

    def live(req):
        calls.append(req)
        return 200, json.dumps(
            {"responses": [{"logoAnnotations": []}]}
        ).encode()

    rec = FixtureVisionTransport(live=live)
    backend = RestVisionBackend(rec)
    img = b"\xff\xd8\xffimg"
    assert backend(img, "LOGO_DETECTION") == {"logos": []}
    assert len(calls) == 1
    # replay from the recorded dict with NO live transport
    replay = FixtureVisionTransport(fixtures=rec.fixtures)
    backend2 = RestVisionBackend(replay)
    assert backend2(img, "LOGO_DETECTION") == {"logos": []}
    assert len(calls) == 1  # not called again
