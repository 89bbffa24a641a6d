"""Deterministic HTML render/extract pair — the per-row invariant.

BASELINE.json:15 pins "byte-identical extracted text per url as the
per-row invariant against the reference extractor".  The reference mount
is empty (SURVEY.md §0), so the reference extractor is PINNED here as a
deterministic pure function pair:

    render(text)  -> html bytes     (fixture generator side)
    extract(html) -> text           (engine side; exact inverse)

``extract(render(t)) == t`` holds byte-for-byte for every unicode string
``t`` (t4 test).  The Spark-side wrapper is an Arrow-vectorized
pandas_udf (BinaryType -> StringType) — no per-row Python in the plan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_HEAD = (
    '<!DOCTYPE html><html><head><meta charset="utf-8">'
    "<title>swingstream</title></head><body><article>"
)
_TAIL = "</article></body></html>"
_BODY_RE = re.compile(r"<article>(.*?)</article>", re.DOTALL)


def escape_text(text: str) -> str:
    # Order matters: '&' first so escapes are unambiguous (reversible).
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def unescape_text(body: str) -> str:
    # Exact inverse of escape_text: entities last-to-first.
    return body.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def render(text: str) -> bytes:
    """Render ``text`` to deterministic HTML bytes (fixture side)."""
    return (_HEAD + escape_text(text) + _TAIL).encode("utf-8")


def extract(html: bytes | bytearray | memoryview) -> str:
    """Extract body text from ``render``-format HTML — byte-exact inverse."""
    s = bytes(html).decode("utf-8")
    m = _BODY_RE.search(s)
    if m is None:
        return ""
    return unescape_text(m.group(1))


def _extract_series(html: pd.Series) -> pd.Series:
    return html.map(extract)


# Arrow-vectorized extractor (SURVEY.md §2.2 P6, §2.9 U3).
extract_udf = F.pandas_udf(_extract_series, returnType=StringType())


def extract_expr(html: "F.Column") -> "F.Column":
    """JVM-native twin of ``extract_udf`` — the HOT-PATH extractor.

    The pinned extractor format is regular (one ``<article>`` body, three
    HTML entities), so it is exactly expressible with built-in string
    expressions: decode → regexp_extract((?s) non-greedy body) → ordered
    literal entity replacement (&gt; → &lt; → &amp;, the exact inverse
    order of ``escape_text``).  This keeps whole-stage codegen intact and
    removes the Arrow round-trip of every html byte to a Python worker
    and the extracted text back — measured ~25% of query-1 wall at
    local[8] (BENCH/BASELINE.md §2, round 3).  Byte-equality with
    ``extract_udf``/``extract`` is property-tested (t4) and asserted on
    every fixture; a real-world extractor (boilerplate removal etc.)
    would flip the default back to the Arrow-UDF form — the seam is the
    ``extract_col`` selector below.
    """
    body = F.regexp_extract(F.decode(html, "UTF-8"),
                            r"(?s)<article>(.*?)</article>", 1)
    out = F.replace(body, F.lit("&gt;"), F.lit(">"))
    out = F.replace(out, F.lit("&lt;"), F.lit("<"))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def extract_col(html: "F.Column") -> "F.Column":
    """Default extractor column used by the pipelines (JVM form)."""
    return extract_expr(html)
