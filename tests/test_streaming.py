"""Streaming ingest: incremental page batches -> accumulated edge table."""

from __future__ import annotations

from olive_spark.fixtures import ordered_graph_9
from olive_spark.ingest.pages import synth_pages
from olive_spark.streaming import stream_pages_to_edges, streaming_link_rates


def test_incremental_edge_ingest(spark, tmp_path):
    """Two page batches arrive; each availableNow pass extracts only the
    new batch (exactly-once via checkpoint); edges accumulate to the
    full topology."""
    n, e = ordered_graph_9()
    pages = synth_pages(spark, n, e, num_partitions=2).cache()
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: pages 0..4
    pages.filter("url < 'https://site5'").write.mode("append").parquet(pages_dir)
    q = stream_pages_to_edges(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    assert 0 < n1 < len(e)

    # batch 2: remaining pages -> edge count reaches the full topology
    pages.filter("url >= 'https://site5'").write.mode("append").parquet(pages_dir)
    q = stream_pages_to_edges(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()
    edges = spark.read.parquet(out_dir)
    assert edges.count() == len(e)
    # hash ids: distinct src/dst counts match the topology's
    srcs = {x[0] for x in e}
    assert edges.select("src").distinct().count() == len(srcs)

    # re-running with the same checkpoint adds nothing (exactly-once)
    q = stream_pages_to_edges(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == len(e)
    pages.unpersist()


def test_streaming_link_rates(spark, tmp_path):
    """Windowed watermarked aggregation over the page stream."""
    n, e = ordered_graph_9()
    pages = synth_pages(spark, n, e, num_partitions=2)
    pages_dir = str(tmp_path / "pages2")
    pages.write.mode("append").parquet(pages_dir)

    from olive_spark.ingest.pages import PAGES_SCHEMA

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    agg = streaming_link_rates(stream, window="1 minute")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("rates")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes all: total links == topology edges
    rows = spark.sql("SELECT SUM(links) AS l, SUM(pages) AS p FROM rates").first()
    # pages have warc_ts = epoch + i seconds -> one or two 1-min windows
    assert rows["p"] == n or rows["p"] is None  # late-window semantics may hold back the tail
    if rows["p"] == n:
        assert rows["l"] == len(e)
