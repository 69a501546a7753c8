"""Fallback changeset-XML source: no `xml` data source required.

SURVEY §7 phase 2 names the risky bit of a hand-rolled XML scan:
``<changeset>`` elements spanning partition splits (the reference dodges
it with a single contiguous 1 MiB buffer, src/main.rs:293-294).  The
Spark-native dodge: read with the *text* source using
``lineSep="</changeset>"`` — the framing is then done by Spark's
splittable line reader, so every row holds at most one complete
changeset element regardless of how the file was split, and bz2 decode
comes from the same Hadoop codec path as the main source.

Parsing is ``mapInPandas`` + ElementTree per Arrow batch: Python, but
vectorized at the transport layer and embarrassingly parallel — the
acceptable fallback cost when the JVM `xml` source is absent (Spark
<4 without the spark-xml package).  Semantics replicated from the
reference exactly like sources/changesets.py:
- 12 recognized attributes, unknown dropped (src/main.rs:207-221)
- description = last <tag k="comment"> child (:240-247)
- open = value == "true" (:211); defaults id=0/open=false/
  num_changes=0/comments_count=0 (:40-55)
- attribute values kept verbatim (quick_xml trims text, not attributes)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osm_changesets_to_parquet_spark.schemas import CHANGESET_SCHEMA

_COLS = [f.name for f in CHANGESET_SCHEMA.fields]


class ChangesetParseError(ValueError):
    """Reference-parity parse-failure report (src/main.rs:344-363): the
    reference prints byte position, changesets processed so far, the
    last successfully parsed changeset id, the underlying error, and
    bounded head/tail snippets of the buffer at the error.  This
    exception carries the same fields structurally AND renders them in
    the message, so the report survives Spark's task-failure
    stringification to the driver."""

    SNIPPET = 500  # the reference's bound: first/last 500 bytes

    def __init__(
        self,
        position: int,
        rows_parsed: int,
        last_changeset_id: int | None,
        error: str,
        fragment: str,
    ) -> None:
        head = fragment[: self.SNIPPET]
        tail = fragment[-self.SNIPPET :]
        msg = (
            "=== XML PARSE ERROR ===\n"
            f"Position: {position}\n"
            # counters are TASK-scoped (each partition counts its own
            # byte range), unlike the reference's single-threaded global
            # count — label them so a multi-partition read can't mislead
            # someone gauging progress through a corrupt dump (ADVICE r07)
            f"Changesets processed (this task): {rows_parsed}\n"
            f"Last changeset ID: "
            f"{last_changeset_id if last_changeset_id is not None else 'none'}\n"
            f"Error: {error}\n"
            f"Buffer content at error (first {self.SNIPPET} bytes):\n{head}\n"
            f"Buffer content at error (last {self.SNIPPET} bytes):\n{tail}\n"
            "======================="
        )
        super().__init__(msg)
        self.position = position
        self.rows_parsed = rows_parsed
        self.last_changeset_id = last_changeset_id
        self.error = error
        self.buffer_head = head
        self.buffer_tail = tail


def _fragment_error(frag: str) -> str:
    """The underlying ElementTree error for a fragment that failed the
    strict parse — re-parsed here purely for the diagnostic report."""
    import xml.etree.ElementTree as ET

    start = frag.find("<changeset")
    if start < 0:
        return "no <changeset start tag in fragment"
    try:
        ET.fromstring("<r>" + frag[start:].replace("</osm>", "") + "</r>")
    except ET.ParseError as e:
        return str(e)
    return "element parsed only when force-closed (truncated input)"


def _parse_fragment(frag: str, retry_close: bool = True) -> list[dict]:
    """Parse one lineSep-framed fragment into changeset rows.

    A fragment ends where a '</changeset>' terminator was consumed by
    the line reader — so it holds any number of *self-closing* elements
    followed by at most one unclosed element-with-children.  Parse under
    a synthetic root, re-appending the eaten terminator when needed.

    ``retry_close=False`` disables the terminator re-append: the
    byte-range framing of changesets_pyds never consumes terminators
    (fragments run to the next '<changeset' start), so there a fragment
    needing the retry is TRUNCATED — force-closing it would turn an
    incomplete element into a silently-partial row.
    """
    import xml.etree.ElementTree as ET

    start = frag.find("<changeset")
    if start < 0:
        return []
    # a trailing </osm> lands in the final fragment when the file ends
    # with self-closing elements; it can never appear unescaped inside
    # a changeset element, so dropping the literal is safe
    xml = frag[start:].replace("</osm>", "")
    root = None
    for suffix in ("", "</changeset>") if retry_close else ("",):
        try:
            root = ET.fromstring("<r>" + xml + suffix + "</r>")
            break
        except ET.ParseError:
            continue
    if root is None:
        return []
    return [_parse_element(el) for el in root.findall("changeset")]


def _parse_element(el) -> dict:
    a = el.attrib

    def as_long(name):
        v = a.get(name)
        try:
            return int(v) if v is not None else None
        except ValueError:
            return None

    def as_double(name):
        v = a.get(name)
        try:
            return float(v) if v is not None else None
        except ValueError:
            return None

    def as_ts(name):
        v = a.get(name)
        if not v:
            return None
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts

    description = None
    for child in el:
        if child.tag == "tag" and child.attrib.get("k") == "comment":
            description = child.attrib.get("v")  # last one wins
    return {
        "id": as_long("id") or 0,
        "created_at": as_ts("created_at"),
        "closed_at": as_ts("closed_at"),
        "open": a.get("open") == "true",
        "user": a.get("user"),
        "uid": as_long("uid"),
        "min_lat": as_double("min_lat"),
        "min_lon": as_double("min_lon"),
        "max_lat": as_double("max_lat"),
        "max_lon": as_double("max_lon"),
        "num_changes": as_long("num_changes") or 0,
        "comments_count": as_long("comments_count") or 0,
        "description": description,
    }


def read_changesets_xml_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Changeset XML -> the declared 13-column schema, without the `xml`
    data source.  Splittable: framing is Spark's own line reader."""
    raw = spark.read.option("lineSep", "</changeset>").text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for v in pdf["value"] for r in _parse_fragment(v)]
            out = pd.DataFrame(rows, columns=_COLS)
            if not rows:
                out = out.astype(object)
            yield out

    return raw.mapInPandas(parse, schema=CHANGESET_SCHEMA)
