"""Deterministic synthetic Common-Crawl-style page table.

Schema per BASELINE.json input_hint / FIXTURES.md §B:
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

The generator realizes a chosen layer-A topology as hyperlinks: page i's
html contains one <a href> per out-edge (i -> j). ``text`` is the
oracle column — computed with the SAME pure function the distributed
extractor uses, so the byte-identical invariant is testable end-to-end.

Generation is itself distributed (spark.range + join with the adjacency
lists + one Arrow-batch mapInPandas) so the small-scale generator is
the same code shape that would synthesize terabytes.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HOSTS = 97  # pages spread over this many hosts (prime)
EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def url_of(i: int) -> str:
    """Zero-padded page number: lexicographic url order == numeric id
    order, so sorted-url id assignment round-trips the topology."""
    return f"https://site{i % N_HOSTS}.example/p{i:08d}"


def html_of(i: int, targets: list[int]) -> bytes:
    links = "\n".join(
        f'<a href="{url_of(j)}">Link from {i} to page {j}</a>' for j in targets
    )
    return (
        f"<html><head><title>Page {i}</title>"
        f"<script>var x={i};</script></head>\n"
        f"<body>\n<h1>Page {i}</h1>\n"
        f"<p>Deterministic body text for page {i} with {len(targets)} outlinks.</p>\n"
        f"{links}\n</body></html>"
    ).encode("utf-8")


def synth_pages(
    spark: SparkSession,
    n: int,
    edges: list[tuple[int, int]] | DataFrame,
    num_partitions: int = 8,
) -> DataFrame:
    """Distributed deterministic page-table synthesis for a topology.

    edges: (src, dst) pairs — page src links to page dst, duplicates
    kept (duplicate hrefs on the page).
    """
    if isinstance(edges, DataFrame):
        edf = edges.select("src", "dst")
    else:
        # Arrow path: a pandas frame ships the whole edge list in one
        # Arrow batch instead of the row-by-row verifier/converter of
        # the plain-list createDataFrame (guide §6 "Arrow for driver
        # transfers"; measured 2.5s -> ~0.1s at 20k edges).
        pdf = pd.DataFrame(list(edges) or None, columns=["src", "dst"]).astype("int64")
        edf = spark.createDataFrame(pdf, schema="src long, dst long")
    adj = edf.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("targets"))
    base = (
        spark.range(n)
        .withColumnRenamed("id", "page_id")
        .join(adj, F.col("page_id") == F.col("src"), "left")
        .select("page_id", F.coalesce("targets", F.array()).alias("targets"))
        .repartition(num_partitions, "page_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for pid, targets in zip(pdf["page_id"], pdf["targets"]):
                pid = int(pid)
                html = html_of(pid, [int(t) for t in targets])
                urls.append(url_of(pid))
                tss.append(EPOCH + _dt.timedelta(seconds=pid))
                htmls.append(html)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "html": htmls,
                    "lang": ["en"] * len(urls),
                }
            )

    raw_schema = T.StructType([f for f in PAGES_SCHEMA if f.name != "text"])
    # ``text`` is attached OUTSIDE the opaque generator as an Arrow-UDF
    # projection of html — the SAME pure function (byte-identical
    # values), but visible to Catalyst: consumers that never read
    # ``text`` (the link-ingest path reads only url+html) get the whole
    # extraction pruned away instead of paying for it inside
    # mapInPandas, which defeats column pruning (guide §4.1/§4.2).
    from olive_spark.ingest.extract import _extract_text_udf

    return base.mapInPandas(gen, schema=raw_schema).select(
        "url",
        "warc_ts",
        "html",
        _extract_text_udf(F.col("html")).alias("text"),
        "lang",
    )
