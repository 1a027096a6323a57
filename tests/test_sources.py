"""Source readers: text lines, typed CSV (permissive), ragged TSV
adjacency — the reference's input formats (FIXTURES.md group A)."""

from __future__ import annotations

import pyspark.sql.functions as F

from crane_spark.sources import (
    pagerank_edges_from_tsv,
    read_text_lines,
    twitter_rows_from_csv,
)


def test_read_text_lines(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha beta\ngamma\n")
    df = read_text_lines(spark, str(p))
    assert [r["value"] for r in df.orderBy("value").collect()] == ["alpha beta", "gamma"]


def test_twitter_csv_permissive_malformed(spark, tmp_path):
    """Malformed int -> null (divergence from the reference, which
    crashes and replays forever — SURVEY.md §2.1 note)."""
    p = tmp_path / "twitter.csv"
    p.write_text("aaa,0\nbbb,99\nbad,notanint\nccc,51\n")
    df = twitter_rows_from_csv(spark, str(p))
    rows = df.orderBy("name").collect()
    assert [(r["name"], r["val"]) for r in rows] == [
        ("aaa", 0),
        ("bad", None),
        ("bbb", 99),
        ("ccc", 51),
    ]
    kept = df.filter(F.col("val") > 50).count()
    assert kept == 2  # null filtered out, not crashed


def test_pagerank_ragged_tsv(spark, tmp_path):
    p = tmp_path / "edges.tsv"
    p.write_text("1\t2\t3\n2\n3\t1\n")  # row '2' has no outlinks
    edges = pagerank_edges_from_tsv(spark, str(p))
    got = sorted((r["src"], r["dst"]) for r in edges.collect())
    assert got == [("1", "2"), ("1", "3"), ("3", "1")]


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from crane_spark.sources import read_orc
    from crane_spark.tables import table

    out = str(tmp_path / "nation_orc")
    table(spark, sf_dir, "nation").write.orc(out)
    back = read_orc(spark, out)
    assert back.count() == 25
    flt = back.filter(F.col("n_regionkey") == 0).select("n_name")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    # the ORC scan must receive the filter and prune to the 2 read columns
    assert "PushedFilters: [" in plan and "n_regionkey" in plan
    assert flt.count() == 5


def test_json_roundtrip(spark, tmp_path):
    import json

    p = tmp_path / "data.json"
    p.write_text(
        "\n".join(json.dumps({"id": i, "tags": ["a", "b"][: i % 3]}) for i in range(4))
    )
    df = spark.read.json(str(p))
    assert df.count() == 4
    assert df.filter(F.size("tags") == 2).count() == 1


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Spark 4 built-in XML source: write a dimension table as XML,
    read it back with an explicit rowTag, values survive. XML is the
    classic enterprise-feed format a production ingest layer must
    accept; downstream everything is columnar."""
    from crane_spark.tables import table

    out = str(tmp_path / "nation_xml")
    nation = table(spark, sf_dir, "nation")
    nation.write.format("xml").option("rowTag", "nation").mode("overwrite").save(out)
    back = spark.read.format("xml").option("rowTag", "nation").load(out)
    assert back.count() == 25
    orig = {(r["n_nationkey"], r["n_name"]) for r in nation.collect()}
    got = {(r["n_nationkey"], r["n_name"]) for r in back.collect()}
    assert got == orig


def test_binary_asset_source(spark, tmp_path):
    """binaryFile ingestion -> asset schema -> stubbed multimodal
    feature extraction end-to-end (SURVEY.md §2.2 multimodal edge)."""
    from crane_spark.llm.multimodal import extract_features
    from crane_spark.sources.files import read_binary_assets

    payloads = {
        "a.png": b"\x89PNG fake" * 40,
        "b.jpg": b"\xff\xd8 fake jpeg" * 30,
        "notes.txt": b"not media",
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    assets = read_binary_assets(spark, str(tmp_path), glob="*.{png,jpg}")
    rows = {r["mime"]: r for r in assets.collect()}
    assert set(rows) == {"image/png", "image/jpeg"}
    assert rows["image/png"]["data"] == payloads["a.png"]
    assert rows["image/png"]["length"] == len(payloads["a.png"])
    assert all(r["asset_id"] is not None for r in rows.values())

    # metadata-only projection must not read blob contents: the scan's
    # ReadSchema should exclude `content`.
    meta = read_binary_assets(spark, str(tmp_path)).select("path", "length")
    scan_line = [
        line
        for line in meta._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan" in line
    ][0]
    assert "content" not in scan_line

    feats = extract_features(
        assets.select("asset_id", "data", "mime"), fake=True
    ).collect()
    assert len(feats) == 2 and all(len(f["feature"]) == 4 for f in feats)
    by_mime = {f["mime"]: f for f in feats}
    assert by_mime["image/png"]["n_bytes"] == len(payloads["a.png"])


def test_binary_asset_source_streaming(spark, tmp_path):
    """The same binaryFile edge as an availableNow stream."""
    from crane_spark.sources.files import read_binary_assets

    (tmp_path / "x.wav").write_bytes(b"RIFF fake wav" * 10)
    stream = read_binary_assets(spark, str(tmp_path), streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("bin_assets")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("select mime, length from bin_assets").collect()
    assert [(r["mime"], r["length"]) for r in got] == [("audio/wav", 130)]


def test_input_file_provenance(spark, tmp_path):
    """Ingest-time provenance tagging with input_file_name(): every
    row records which physical file produced it — the lineage column a
    100 TB multi-source corpus build carries from day one."""
    from pyspark.sql import functions as F

    for name, rows in {"src_a": ["x", "y"], "src_b": ["z"]}.items():
        spark.createDataFrame([(r,) for r in rows], "value string").coalesce(
            1
        ).write.mode("overwrite").text(str(tmp_path / name))
    df = (
        spark.read.text(str(tmp_path / "src_*"))
        .withColumn("src_file", F.input_file_name())
        .withColumn(
            "source", F.regexp_extract("src_file", r"(src_[ab])", 1)
        )
    )
    got = {r["value"]: r["source"] for r in df.collect()}
    assert got == {"x": "src_a", "y": "src_a", "z": "src_b"}
    counts = {r["source"]: r["n"] for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"src_a": 2, "src_b": 1}


def test_parquet_schema_evolution_merge_and_union(spark, tmp_path):
    """Additive schema evolution: later files add columns; mergeSchema
    reads the union schema with nulls for pre-evolution files, and
    union_evolved aligns separately-read frames by name."""
    from crane_spark.sources.files import read_parquet_evolved, union_evolved

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(p + "/d=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.parquet(p + "/d=2")
    # reordered columns in a third writer: must align by name, not position
    spark.createDataFrame(
        [("c", 3, 1.5)], "s string, id long, score double"
    ).write.parquet(p + "/d=3")

    df = read_parquet_evolved(spark, p + "/d=1", p + "/d=2", p + "/d=3")
    assert set(df.columns) == {"id", "s", "score"}
    rows = {(r["id"], r["s"], r["score"]) for r in df.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5), (3, "c", 1.5)}

    # filter on an evolved column still prunes to a pushed filter
    plan = df.filter("score > 2")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(score), GreaterThan(score,2.0)" in plan

    a = spark.read.parquet(p + "/d=1")
    b = spark.read.parquet(p + "/d=3")
    u = union_evolved(a, b)
    assert u.columns[:2] == ["id", "s"]  # first frame dictates prefix order
    got = {(r["id"], r["s"], r["score"]) for r in u.collect()}
    assert got == {(1, "a", None), (3, "c", 1.5)}


def test_parquet_schema_evolution_streaming_twin(spark, tmp_path):
    from crane_spark.sources.files import read_parquet_evolved

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.mode("append").parquet(p)
    stream = read_parquet_evolved(spark, p, streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("evolved_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r["id"], r["s"], r["score"])
        for r in spark.sql("select * from evolved_stream").collect()
    }
    assert rows == {(1, "a", None), (2, "b", 9.5)}


def test_ignore_corrupt_parquet_files(spark, tmp_path):
    """Fleet reality at 100 TB: a few corrupt files must not kill a
    scan. Default config fails loudly (correctness first); flipping
    spark.sql.files.ignoreCorruptFiles recovers every healthy row."""
    import glob

    p = str(tmp_path / "t")
    spark.range(100).repartition(4).write.parquet(p)
    victim = sorted(glob.glob(p + "/part-*.parquet"))[0]
    with open(victim, "r+b") as fh:
        fh.truncate(40)  # destroy footer + magic
    import pytest as _pytest

    with _pytest.raises(Exception):
        # fails at footer read (schema inference) or at scan — either
        # way, loudly
        spark.read.parquet(p).count()
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        # explicit schema: inference itself would read the torn footer
        got = spark.read.schema("id bigint").parquet(p).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert got == 75  # 3 of 4 equal files survive


def test_json_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE JSON parsing lands malformed rows in a corrupt-record
    column instead of dropping them silently — the quarantine-and-audit
    pattern for untrusted feeds."""
    from pyspark.sql import types as T

    src = tmp_path / "j"
    src.mkdir()
    (src / "a.json").write_text(
        '{"id": 1, "v": "ok"}\n'
        "{this is not json}\n"
        '{"id": 3, "v": "fine"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src))
    ).cache()
    try:
        ok = {(r["id"], r["v"]) for r in df.filter("_corrupt_record IS NULL").collect()}
        bad = [r["_corrupt_record"] for r in df.filter("_corrupt_record IS NOT NULL").collect()]
        assert ok == {(1, "ok"), (3, "fine")}
        assert bad == ["{this is not json}"]
    finally:
        df.unpersist()


def test_evolved_streaming_read_rejects_multiple_paths(spark, tmp_path):
    """readStream.parquet takes one directory; a multi-path streaming
    request must fail loudly instead of silently reading only the
    first path (the silent-truncation bug fixed in round 2)."""
    import pytest

    from crane_spark.sources.files import read_parquet_evolved

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(3).write.parquet(p1)
    spark.range(3).write.parquet(p2)
    with pytest.raises(ValueError, match="exactly one"):
        read_parquet_evolved(spark, p1, p2, streaming=True)
