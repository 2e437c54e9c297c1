"""Binary media ingest — E1 directory scan + E2 key derivation + multimodal
columns (SURVEY §2.a E1/E2, §1.4, north-star multimodal).

The reference scans directory roots per datatype and derives the clip key
from the relative path: ``"_".join(rel_path.with_suffix("").parts)``
(dpl/processor/engine.py:97-98, dpl/common.py:13-27). Spark-first:

- ``spark.read.format("binaryFile")`` with ``pathGlobFilter`` /
  ``recursiveFileLookup`` is the scan (distributed listing, no driver walk);
- the key is a column expression over ``path`` — stays in codegen;
- media cells are **opaque binary columns + typed metadata structs**
  (length, modification time, probed attributes), the 100 TB-safe
  representation: decode happens late, inside Arrow-batched UDFs, only for
  rows that survive pushed-down filters.

ffmpeg-backed transcode/demux (N2-N5) is feature-gated: the binary is not
in this runtime, so ``video_to_frames`` raises unless ffmpeg is present —
the frame-grain schema and partitioning contract is exercised in tests via
the deterministic fake decoder (operators.models.fake_decode_image).
"""

from __future__ import annotations

import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FFMPEG = shutil.which("ffmpeg")


def clip_name_from_path(path: Column, root: str) -> Column:
    """E2: relative path, suffix stripped, parts joined with '_'
    (engine.py:97-98) — as a pure string expression."""
    rel = F.regexp_replace(path, f"^file:{root.rstrip('/')}/", "")
    no_suffix = F.regexp_replace(rel, r"\.[^./]+$", "")
    return F.regexp_replace(no_suffix, "/", "_")


def scan_binary_dir(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    recursive: bool = True,
) -> DataFrame:
    """E1 source scan: one row per file with clip_name key + binary payload
    + metadata struct. Deterministic order comes from orderBy(path) at the
    consumer (E4), never from listing order."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(root)
    )
    return df.select(
        clip_name_from_path(F.col("path"), root).alias("clip_name"),
        F.col("path"),
        F.col("content"),
        F.struct(
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("modified_at"),
        ).alias("meta"),
    )


def image_frames_from_dir(spark: SparkSession, root: str, glob: str = "*.jpg") -> DataFrame:
    """FolderType image-sequence ingest (datatype.py:42-57): frame rows keyed
    (clip_name, frame_idx) — frame_idx parsed from the %06d filename."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    frame_idx = F.regexp_extract(F.col("path"), r"(\d+)\.[^.]+$", 1).cast("bigint")
    clip_dir = F.regexp_replace(F.col("path"), r"/[^/]+$", "")
    return files.select(
        clip_name_from_path(clip_dir, root).alias("clip_name"),
        frame_idx.alias("frame_idx"),
        F.col("content").alias("image"),
        F.col("length").alias("n_bytes"),
    )


def video_to_frames(df: DataFrame, video_col: str = "content") -> DataFrame:
    """N2 demux (video → frame rows). Requires the external ffmpeg binary
    (dpl/processor/nodes/ffmpeg.py:18-21); feature-gated in this runtime."""
    if FFMPEG is None:
        raise NotImplementedError(
            "ffmpeg not available in this runtime; frame-grain ingest is "
            "exercised via image_frames_from_dir + fake decode in tests"
        )
    raise NotImplementedError("ffmpeg demux UDF not yet implemented")
