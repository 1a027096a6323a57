"""File sources: text lines, typed CSV, JSON — batch and streaming
from the same call (the reference's only source is a text file drained
line-by-line through the spout, /root/reference/util.py:13-25; its CSV
'formats' are comma- and tab-split bolts, see below).

Every reader takes ``streaming=True`` to return the readStream twin of
the batch frame — same schema, same downstream plan (SURVEY.md §1.4:
spout -> readStream on a directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# TwitterUserFilter input: `name,val` rows, no header
# (ref app/twitter_user_filter_topology.py:13 splits on ',';
# app/twitter_1k.csv shape: "aaa,0").
TWITTER_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("val", T.IntegerType()),
    ]
)

# PageRank input: tab-separated ragged adjacency rows — src + 0..k
# outlinks (ref app/page_rank_topology.py:13 splits on '\t'; rows with
# no outlinks contribute nothing, :14-17). Read as one raw line and
# split in the engine: CSV readers dislike ragged rows.
PAGERANK_RAW_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def read_text_lines(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """One row per text line, column ``value`` (the spout, op A)."""
    if streaming:
        return spark.readStream.schema(PAGERANK_RAW_SCHEMA).text(path)
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
    streaming: bool = False,
) -> DataFrame:
    """Typed CSV in PERMISSIVE mode: malformed numeric fields become
    null instead of crashing the job — a deliberate divergence from the
    reference, whose FilterBolt dies on a bad int and replays the batch
    forever (twitter_user_filter_topology.py:14; SURVEY.md §2.1)."""
    reader = spark.readStream if streaming else spark.read
    return reader.csv(
        path, schema=schema, sep=sep, header=header, mode="PERMISSIVE"
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    streaming: bool = False,
) -> DataFrame:
    if streaming:
        if schema is None:
            raise ValueError("streaming JSON requires an explicit schema")
        return spark.readStream.schema(schema).json(path)
    return spark.read.json(path) if schema is None else spark.read.schema(schema).json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Columnar ORC twin of the parquet path (JVM-native reader:
    predicate pushdown and column pruning apply exactly as for
    parquet). Batch infers the schema from file footers; streaming
    needs it up front like every file stream."""
    if streaming:
        if schema is None:
            raise ValueError("streaming ORC requires an explicit schema")
        return spark.readStream.schema(schema).orc(path)
    return spark.read.orc(path) if schema is None else spark.read.schema(schema).orc(path)


def twitter_rows_from_csv(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    return read_csv(spark, path, TWITTER_SCHEMA, sep=",", streaming=streaming)


def pagerank_edges_from_tsv(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Ragged TSV adjacency -> normalized (src, dst) edge list.

    Mirrors ParseNeighborsBolt: split on tab, first field is the
    source, the rest are outlinks; rows with no outlinks vanish (the
    explode of an empty slice emits nothing, exactly like the
    reference's loop over an empty url list)."""
    lines = read_text_lines(spark, path, streaming=streaming)
    fields = F.split(F.col("value"), "\t")
    return (
        lines.select(
            F.element_at(fields, 1).alias("src"),
            F.explode(F.slice(fields, 2, F.greatest(F.size(fields) - 1, F.lit(0)))).alias(
                "dst"
            ),
        )
        .filter(F.col("dst") != "")
    )


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Raw media files as a multimodal asset table via the built-in
    ``binaryFile`` source — the ingestion edge for image/audio/video
    blobs (decode itself is the stubbed step, llm/multimodal.py).

    Output matches the asset-column convention:
    ``asset_id`` (stable 64-bit hash of the file path), ``data``
    (binary payload), ``mime`` (from the extension), ``path``,
    ``length``. The source prunes columns: a query that never touches
    ``data`` (e.g. a size audit) reads file metadata only, no blob
    I/O. At 100 TB, payload partition sizing is governed by
    ``spark.sql.files.maxPartitionBytes``; files never split, so one
    asset always lands whole in one task.
    """
    # binaryFile's schema is fixed by the source; file streams always
    # need it stated up front.
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile").schema(binary_schema)
        if streaming
        else spark.read.format("binaryFile")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "png", "image/png")
        .when(ext == "wav", "audio/wav")
        .when(ext == "mp4", "video/mp4")
        .otherwise(F.concat(F.lit("application/"), ext))
    )
    return df.select(
        F.xxhash64("path").alias("asset_id"),
        F.col("content").alias("data"),
        mime.alias("mime"),
        "path",
        "length",
    )


def read_parquet_evolved(
    spark: SparkSession, *paths: str, streaming: bool = False
) -> DataFrame:
    """Read parquet written under an EVOLVING schema as one DataFrame
    with the union schema (``mergeSchema``): columns added by later
    writers appear as nulls in older files, reordered columns align by
    name, and the scan still prunes/pushes down per file.

    At 100 TB a table accretes schema versions for years; requiring a
    full rewrite per added column is a non-starter, so additive
    evolution must be a READ-side property. Schema merging is exactly
    that — footer-only union at planning time, no data pass. (The
    reference is schema-less by construction — a tuple's payload is
    whatever a bolt emits, util.py:41-44 — so evolution "worked" there
    by positional convention; here it works with real types.)

    ``streaming=True`` returns the readStream twin pinned to the same
    merged schema (streaming sources need an explicit schema).
    """
    merged = spark.read.option("mergeSchema", "true").parquet(*paths)
    if not streaming:
        return merged
    # readStream.parquet takes exactly one directory; silently reading
    # only paths[0] would drop the rest of a multi-path request, so
    # refuse loudly. Callers with several roots should point the stream
    # at a common parent directory or union per-path streams.
    if len(paths) != 1:
        raise ValueError(
            "read_parquet_evolved(streaming=True) supports exactly one "
            f"path (got {len(paths)}); stream a common parent directory "
            "or union one stream per path"
        )
    return (
        spark.readStream.schema(merged.schema)
        .option("mergeSchema", "true")
        .parquet(paths[0])
    )


def union_evolved(*frames: DataFrame) -> DataFrame:
    """Multiset union of frames with ADDITIVELY different schemas:
    align columns by NAME (never position) and fill columns missing on
    either side with nulls — the DataFrame-level counterpart of
    ``read_parquet_evolved`` for sources that were read separately
    (different formats, different stores, a migration boundary).
    Column order follows the first frame, then first-appearance of
    added columns, so the output schema is deterministic."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
