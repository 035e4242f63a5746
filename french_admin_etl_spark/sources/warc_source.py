"""WARC (ISO 28500) web-archive source — the container 100-TB text
corpora actually arrive in (Common-Crawl-style layouts: many ~1 GiB
``.warc.gz`` segments).

Spark-first shape: ``spark.read.format("binaryFile")`` gives one row per
archive file, and an Arrow ``mapInPandas`` batch parser (the engine's U3
batch-transform seam — never per-row Python in a driver loop) explodes
each file into one row per WARC record. Gzipped WARCs are per-record (or
whole-file) gzip MEMBER streams and therefore NOT byte-splittable — the
unit of parallelism is the FILE, which is the right 100-TB posture
anyway: crawl corpora ship as 10^4-10^5 independent segment files, so
file-level parallelism saturates a 1000-executor cluster while each task
holds exactly one segment (bounded memory, no shuffle; the scan is
embarrassingly parallel). Records stream out of a decompress-as-you-go
parser, so a task never materializes more than one record beyond the raw
file bytes Spark's binaryFile scan already holds.

Per-record error isolation follows the engine's S9 contract (row-level
dead-letter, the batch survives — the same drop-on-error posture as
``operators/validate.py``): a malformed record yields a row with
``error`` set and null
fields instead of failing the file; a file that isn't WARC at all yields
a single errored row carrying its path.

Payloads are truncated at ``payload_limit`` bytes with a ``truncated``
flag — an unbounded crawl response (multi-GiB video bodies exist in real
crawls) must not be able to blow a task's Arrow batch.

Reference: the reference engine's extractors normalize remote CSV/JSON
payloads into typed rows (``internal/extractors/*.go``); this source is
the same extract-normalize contract applied to the web-archive container
format, which the reference does not cover — it belongs to the
training-data extension surface.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("record_offset", T.LongType()),  # byte offset (plain)
        T.StructField("warc_type", T.StringType()),
        T.StructField("warc_record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — per-record
    members are the standard ``.warc.gz`` layout so skippers can seek;
    a concatenation decompresses to the plain WARC byte stream."""
    out = bytearray()
    while data:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        data = d.unused_data
    return bytes(out)


def _parse_http_payload(body: bytes):
    """Split an application/http payload into (status, content-type,
    entity body). Returns (None, None, body) when it isn't HTTP."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, body
    head = body[:head_end].decode("latin-1", "replace").split("\r\n")
    try:
        status = int(head[0].split(None, 2)[1])
    except (IndexError, ValueError):
        return None, None, body
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body[head_end + 4 :]


def parse_warc_bytes(
    data: bytes, source_file: str = "", payload_limit: int = 1 << 20
) -> Iterator[dict]:
    """Stream records out of one WARC file's bytes (plain or .warc.gz).
    Yields plain dicts in WARC_RECORD_SCHEMA field order. A malformed
    record yields an errored row and parsing stops at it (WARC framing
    is sequential — after a broken Content-Length there is no resync
    point); earlier records in the file are unaffected."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except Exception as exc:  # noqa: BLE001 — one errored row per file
            yield {"source_file": source_file, "error": f"gzip: {exc}"}
            return
    buf = io.BytesIO(data)
    while True:
        offset = buf.tell()
        # skip inter-record blank lines (two CRLFs terminate the prior
        # record; tolerate extras from sloppy writers)
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            offset = buf.tell()
            line = buf.readline()
        if not line:
            return  # clean EOF
        if not line.startswith(b"WARC/"):
            yield {
                "source_file": source_file,
                "record_offset": offset,
                "error": f"bad record marker {line[:20]!r}",
            }
            return
        headers: dict[str, str] = {}
        while True:
            hl = buf.readline()
            if hl in (b"\r\n", b"\n"):
                break
            if not hl:
                yield {
                    "source_file": source_file,
                    "record_offset": offset,
                    "error": "EOF inside WARC header block",
                }
                return
            k, sep, v = hl.decode("latin-1", "replace").partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            yield {
                "source_file": source_file,
                "record_offset": offset,
                "error": "missing/bad Content-Length",
            }
            return
        body = buf.read(clen)
        if len(body) != clen:
            yield {
                "source_file": source_file,
                "record_offset": offset,
                "error": f"record body truncated ({len(body)}/{clen})",
            }
            return
        ctype = headers.get("content-type")
        status = http_ctype = None
        payload = body
        if ctype and ctype.split(";")[0].strip() == "application/http":
            status, http_ctype, payload = _parse_http_payload(body)
        truncated = len(payload) > payload_limit
        yield {
            "source_file": source_file,
            "record_offset": offset,
            "warc_type": headers.get("warc-type"),
            "warc_record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_content_type": ctype,
            "content_length": clen,
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": payload[:payload_limit],
            "truncated": truncated,
            "error": None,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    payload_limit: int = 1 << 20,
    path_glob: str | None = None,
) -> DataFrame:
    """One row per WARC record across every archive under ``path``.

    The plan is binaryFile scan → ArrowEvalPython(mapInPandas): file-
    parallel, shuffle-free, payloads bounded at ``payload_limit``."""
    import pandas as pd

    fields = [f.name for f in WARC_RECORD_SCHEMA.fields]

    def parse_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path_v, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(
                    bytes(content), str(path_v), payload_limit
                ):
                    rows.append([rec.get(f) for f in fields])
            yield pd.DataFrame(rows, columns=fields)

    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(parse_files, schema=WARC_RECORD_SCHEMA)


def warc_documents(
    spark: SparkSession,
    path: str,
    payload_limit: int = 1 << 20,
    text_types: tuple = ("text/html", "text/plain"),
) -> DataFrame:
    """The bridge into the training-data pipeline: text records projected
    to the engine's documents-table shape (doc_id, url, fetched_at,
    content) — feed it to the dedup / quality / language operators
    directly. Two record shapes qualify:

    - ``response`` records whose HTTP payload is a 200 with a text
      content-type (raw crawl ``.warc.gz``);
    - ``conversion`` records with a text WARC content-type — the
      Common-Crawl WET layout, where the extracted plain text IS the
      record body (no HTTP envelope).

    Everything below stays JVM-side Column expressions on the
    already-parsed scan."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path, payload_limit=payload_limit)
    http_base = F.trim(F.split(F.col("http_content_type"), ";").getItem(0))
    warc_base = F.trim(F.split(F.col("warc_content_type"), ";").getItem(0))
    is_http_text = (
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & http_base.isin(*text_types)
    )
    is_wet_text = (F.col("warc_type") == "conversion") & warc_base.isin(*text_types)
    return (
        recs.where(F.col("error").isNull())
        .where(is_http_text | is_wet_text)
        .select(
            F.col("warc_record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.col("payload").cast("string").alias("content"),
            F.col("truncated"),
        )
    )
