"""Structured Streaming execution (SURVEY.md §2.7 additions): the
same operator definitions running under readStream — event-time
window + watermark aggregation, and the XML parse stage as a
streaming ingestion (micro-batch) pipeline."""

import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark import fixtures
from dblp_crawler_spark.streaming.events import windowed_counts_streaming


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_src"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(d)
    return d


def test_streaming_windowed_counts_matches_batch(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_counts_streaming(
        stream.withColumn("ts", F.col("ts").cast("timestamp")), window="1 hour", watermark="2 hours"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = windowed_counts_streaming(
        spark.read.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    want = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_streaming_xml_ingestion(spark, universe, tmp_path):
    """The fetch→parse ingestion as a stream: raw XML documents land
    in a directory source; the Arrow-batched parser (mapInPandas)
    runs inside the streaming query; parsed person payloads arrive in
    the sink table with payload equality vs the struct truth."""
    from dblp_crawler_spark.sources.xml_pages import parse_pages_xml

    src = tmp_path / "raw_pages"
    rows = [
        (fixtures.person_url(pid), fixtures.render_person_xml(payload))
        for pid, payload in list(universe.persons.items())[:40]
        if pid not in universe.missing_pids
    ]
    spark.createDataFrame(rows, "url string, body string").write.parquet(str(src))

    stream = spark.readStream.schema("url string, body string").parquet(str(src))
    parsed = parse_pages_xml(stream, "person")
    q = (
        parsed.writeStream.format("memory")
        .queryName("parsed_pages")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url: r.payload for r in spark.sql("SELECT * FROM parsed_pages").collect()}
    assert len(got) == len(rows)
    for pid, payload in list(universe.persons.items())[:40]:
        if pid in universe.missing_pids:
            continue
        p = got[fixtures.person_url(pid)]
        assert p["pid"] == payload["pid"]
        assert len(p["pubs"]) == len(payload["pubs"])
