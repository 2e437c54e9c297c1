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

ffmpeg-backed transcode/demux (N2-N5) runs the real subprocess pipeline
(``mapInPandas`` → temp file → ffmpeg → read outputs back as rows) with the
reference's exact command templates (dpl/processor/nodes/ffmpeg.py:13-26).
The GATE is the binary, not the code: when no ffmpeg executable is
available the operators raise NotImplementedError driver-side; tests
exercise the full subprocess path against a stub executable.
"""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FFMPEG = shutil.which("ffmpeg")

# Reference command templates (dpl/processor/nodes/ffmpeg.py:13-26), as arg
# vectors: same flags, no shell. `< /dev/null` becomes stdin=DEVNULL;
# stdout/stderr are swallowed exactly like the reference's sp.run call.
_FFMPEG_BASE_ARGS = ("-hide_banner", "-loglevel", "panic", "-nostats")
_FFMPEG_TO_IMG_ARGS = ("-start_number", "0", "-qscale:v", "3")


def _resolve_ffmpeg(ffmpeg_exe: str | None) -> str:
    """Driver-side gate: fail fast when the binary is absent (the reference
    assumes ffmpeg on PATH; this runtime usually lacks it). An explicit
    ``ffmpeg_exe`` bypasses PATH — also how tests inject a stub binary,
    since live python workers do not see driver-side PATH edits."""
    exe = ffmpeg_exe or shutil.which("ffmpeg")
    if exe is None:
        raise NotImplementedError(
            "ffmpeg not available in this runtime; pass ffmpeg_exe= or add "
            "the binary to PATH (frame-grain semantics are also covered by "
            "image_frames_from_dir + fake decode in tests)"
        )
    return exe


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


def video_to_frames(
    df: DataFrame,
    video_col: str = "content",
    key_col: str = "clip_name",
    ext: str = ".jpg",
    ffmpeg_exe: str | None = None,
) -> DataFrame:
    """N2 demux: video binary → one row per frame (key, frame_idx, image).

    The reference shells out per clip with FFMPEG_TO_IMG_CMD
    (dpl/processor/nodes/ffmpeg.py:18-21,114-133: ``-start_number 0
    -qscale:v 3 {target}/%6d{ext} -y``) under a joblib process pool; here
    the pool is the executor fleet — ``mapInPandas`` writes each video to
    a task-local temp file, runs the same command, and yields the produced
    frame files as rows. Each clip demuxes inside its own generator step,
    so one giant video never holds a whole batch's frames in memory.
    A failed clip yields one error row (E8 containment; the reference's
    sp.run ignores failures silently — checked returncode is a deliberate
    upgrade routed to the error channel, not an abort)."""
    exe = _resolve_ffmpeg(ffmpeg_exe)
    cols = [key_col, "frame_idx", "image", "error"]
    out_schema = f"{key_col} string, frame_idx bigint, image binary, error string"

    def demux(batches):
        import os
        import re
        import subprocess
        import tempfile

        for pdf in batches:
            for name, blob in zip(pdf[key_col], pdf[video_col]):
                rows = []
                try:
                    with tempfile.TemporaryDirectory() as td:
                        src = os.path.join(td, "in.video")
                        with open(src, "wb") as fh:
                            fh.write(bytes(blob))
                        tgt = os.path.join(td, "frames")
                        os.makedirs(tgt)
                        cmd = [
                            exe, *_FFMPEG_BASE_ARGS, "-i", src,
                            *_FFMPEG_TO_IMG_ARGS,
                            os.path.join(tgt, f"%06d{ext}"), "-y",
                        ]
                        subprocess.run(
                            cmd,
                            stdin=subprocess.DEVNULL,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT,
                            check=True,
                        )
                        for fn in sorted(os.listdir(tgt)):
                            m = re.match(r"\s*(\d+)", fn)
                            if not m:
                                continue
                            with open(os.path.join(tgt, fn), "rb") as fh:
                                rows.append(
                                    {
                                        key_col: name,
                                        "frame_idx": int(m.group(1)),
                                        "image": fh.read(),
                                        "error": None,
                                    }
                                )
                except Exception as exc:  # noqa: BLE001 — E8 containment
                    rows = [
                        {
                            key_col: name,
                            "frame_idx": None,
                            "image": None,
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    ]
                yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(demux, schema=out_schema)


def frames_to_video(
    df: DataFrame,
    image_col: str = "image",
    key_col: str = "clip_name",
    idx_col: str = "frame_idx",
    ext: str = ".jpg",
    target_suffix: str = ".mp4",
    ffmpeg_exe: str | None = None,
) -> DataFrame:
    """N3 mux: frame rows → one video binary per clip (ToVideoBaseNode).

    The reference's FFMPEG_TO_VIDEO_CMD (dpl/processor/nodes/ffmpeg.py:23-26,
    136-143: ``-i {source}/%6d{ext} -start_number 0 -qscale:v 3 {target}
    -y``) consumes a frame DIRECTORY; here each clip's frames are gathered
    with ``applyInPandas`` (the grouped-sink shape), written to a task-local
    temp dir under zero-padded %06d naming (the reference writes
    ``f"{index:06d}.jpg"`` and ffmpeg reads ``%6d`` patterns zero-padded),
    muxed, and the video bytes
    returned as one row. One shuffle on the clip key — the same partitioning
    every frame-grain operator uses, so Exchange reuse applies."""
    exe = _resolve_ffmpeg(ffmpeg_exe)
    from talkinghead_datapipeline_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    cols = [key_col, "video", "n_frames", "error"]
    out_schema = f"{key_col} string, video binary, n_frames bigint, error string"

    def mux(pdf: pd.DataFrame) -> pd.DataFrame:
        import os
        import subprocess
        import tempfile

        name = pdf[key_col].iloc[0]
        try:
            ordered = pdf.sort_values(idx_col)
            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, "frames")
                os.makedirs(src)
                # Zero-padded frame names, matching the reference's
                # f"{index:06d}.jpg" writer (dpl/processor/nodes/ffmpeg.py:18-21)
                # and ffmpeg's image2 demuxer, which reads %6d as zero-padded
                # (av_get_frame_filename expands it to %06d).
                for n, blob in enumerate(ordered[image_col]):
                    with open(os.path.join(src, "%06d%s" % (n, ext)), "wb") as fh:
                        fh.write(bytes(blob))
                tgt = os.path.join(td, f"out{target_suffix}")
                cmd = [
                    exe, *_FFMPEG_BASE_ARGS,
                    "-i", os.path.join(src, f"%06d{ext}"),
                    *_FFMPEG_TO_IMG_ARGS, tgt, "-y",
                ]
                subprocess.run(
                    cmd,
                    stdin=subprocess.DEVNULL,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.STDOUT,
                    check=True,
                )
                with open(tgt, "rb") as fh:
                    row = {
                        key_col: name,
                        "video": fh.read(),
                        "n_frames": len(ordered),
                        "error": None,
                    }
        except Exception as exc:  # noqa: BLE001 — E8 containment
            row = {
                key_col: name,
                "video": None,
                "n_frames": len(pdf),
                "error": f"{type(exc).__name__}: {exc}",
            }
        return pd.DataFrame([row], columns=cols)

    return df.groupBy(key_col).applyInPandas(mux, schema=out_schema)


def transcode_media(
    df: DataFrame,
    content_col: str = "content",
    key_col: str = "clip_name",
    target_suffix: str = ".wav",
    out_col: str = "media",
    ffmpeg_exe: str | None = None,
) -> DataFrame:
    """N1/N4/N5 convert: media binary → transcoded binary, one row per clip.

    The reference's FFMPEG_CONVERT_CMD (dpl/processor/nodes/ffmpeg.py:13-16,
    146-156: ``ffmpeg -i {source} {target} -y``) — VideoToWav and AacToWav
    are this with ``target_suffix='.wav'`` (the suffix selects the muxer,
    exactly as the reference's target path does). Same mapInPandas shape
    and error containment as ``video_to_frames``."""
    exe = _resolve_ffmpeg(ffmpeg_exe)
    cols = [key_col, out_col, "error"]
    out_schema = f"{key_col} string, {out_col} binary, error string"

    def convert(batches):
        import os
        import subprocess
        import tempfile

        for pdf in batches:
            for name, blob in zip(pdf[key_col], pdf[content_col]):
                try:
                    with tempfile.TemporaryDirectory() as td:
                        src = os.path.join(td, "in.media")
                        with open(src, "wb") as fh:
                            fh.write(bytes(blob))
                        tgt = os.path.join(td, f"out{target_suffix}")
                        cmd = [exe, *_FFMPEG_BASE_ARGS, "-i", src, tgt, "-y"]
                        subprocess.run(
                            cmd,
                            stdin=subprocess.DEVNULL,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT,
                            check=True,
                        )
                        with open(tgt, "rb") as fh:
                            row = {key_col: name, out_col: fh.read(), "error": None}
                except Exception as exc:  # noqa: BLE001 — E8 containment
                    row = {
                        key_col: name,
                        out_col: None,
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                yield pd.DataFrame([row], columns=cols)

    return df.mapInPandas(convert, schema=out_schema)
