"""ffmpeg subprocess operators (N1/N2/N4/N5) against a stub executable.

The real pipeline starts with VideoToImagesNode / VideoToWavNode
(dpl/processor/nodes/ffmpeg.py:114-156). This runtime has no ffmpeg binary,
so the GATE is the binary, not the code: these tests run the full
mapInPandas → temp file → subprocess → read-back path against a small bash
stand-in that honors the reference's argument shape (`-i <src> ... <target>
-y`) and ffmpeg's image2 sequence semantics: `%06d{ext}` frame templates,
ZERO-padded filenames (av_get_frame_filename expands %6d/%06d to
zero-padding — a space-padded stub would hide a real-binary mismatch).
"""

from __future__ import annotations

import textwrap

import pandas as pd
import pytest

from talkinghead_datapipeline_spark.sources.media import (
    frames_to_video,
    transcode_media,
    video_to_frames,
)

_STUB = textwrap.dedent(
    """\
    #!/bin/bash
    # ffmpeg stand-in: parse `-i <src>`; target is the second-to-last arg
    # (the last is `-y`, matching the reference command templates).
    args=("$@")
    src=""
    for ((k=0; k<${#args[@]}; k++)); do
      [[ "${args[k]}" == "-i" ]] && src="${args[k+1]}"
    done
    tgt="${args[$((${#args[@]}-2))]}"
    if [[ "$src" == *%06d* ]]; then
      d="${src%/*}"
      # real ffmpeg only finds ZERO-padded frame files for a %06d pattern;
      # fail loudly (like ffmpeg: "No such file") if none match.
      compgen -G "$d/0*" > /dev/null || exit 1
      { printf 'MUXED:'; cat "$d"/0*; } > "$tgt"
    elif [[ "$tgt" == *%06d* ]]; then
      d="${tgt%/*}"; ext="${tgt##*%06d}"
      for n in 0 1 2; do
        { printf 'FRAME%d:' "$n"; cat "$src"; } > "$d/$(printf '%06d' "$n")$ext"
      done
    else
      { printf 'TRANSCODED:'; cat "$src"; } > "$tgt"
    fi
    """
)


@pytest.fixture
def stub_ffmpeg(tmp_path):
    p = tmp_path / "ffmpeg"
    p.write_text(_STUB)
    p.chmod(0o755)
    return str(p)


@pytest.fixture
def failing_ffmpeg(tmp_path):
    p = tmp_path / "ffmpeg-broken"
    p.write_text("#!/bin/bash\nexit 3\n")
    p.chmod(0o755)
    return str(p)


def _clips(spark):
    return spark.createDataFrame(
        pd.DataFrame({"clip_name": ["a", "b"], "content": [b"AAA", b"BBB"]})
    )


def test_video_to_frames_subprocess(spark, stub_ffmpeg):
    out = video_to_frames(_clips(spark), ffmpeg_exe=stub_ffmpeg).collect()
    assert all(r.error is None for r in out)
    frames = {(r.clip_name, r.frame_idx): bytes(r.image) for r in out}
    assert len(frames) == 6  # 3 frames x 2 clips, frame_idx from %06d names
    assert frames[("a", 0)] == b"FRAME0:AAA"
    assert frames[("a", 2)] == b"FRAME2:AAA"
    assert frames[("b", 1)] == b"FRAME1:BBB"


def test_transcode_media_subprocess(spark, stub_ffmpeg):
    out = transcode_media(
        _clips(spark), target_suffix=".wav", ffmpeg_exe=stub_ffmpeg
    ).collect()
    got = {r.clip_name: bytes(r.media) for r in out}
    assert got == {"a": b"TRANSCODED:AAA", "b": b"TRANSCODED:BBB"}
    assert all(r.error is None for r in out)


def test_demux_mux_roundtrip(spark, stub_ffmpeg):
    # N2 → N3: explode a clip to frames, then mux the frames back — the
    # grouped applyInPandas sink writes zero-padded %06d-named files like
    # the reference's f"{index:06d}.jpg".
    frames = video_to_frames(_clips(spark), ffmpeg_exe=stub_ffmpeg)
    out = frames_to_video(
        frames.drop("error"), ffmpeg_exe=stub_ffmpeg
    ).collect()
    got = {r.clip_name: (bytes(r.video), r.n_frames) for r in out}
    assert got["a"] == (b"MUXED:FRAME0:AAAFRAME1:AAAFRAME2:AAA", 3)
    assert got["b"][1] == 3
    assert all(r.error is None for r in out)


def test_failed_clip_routes_to_error_channel(spark, failing_ffmpeg):
    out = video_to_frames(_clips(spark), ffmpeg_exe=failing_ffmpeg).collect()
    assert len(out) == 2  # one quarantine row per clip, pipeline continues
    assert all(r.image is None and "CalledProcessError" in r.error for r in out)


def test_graph_node_uses_real_demux(spark, stub_ffmpeg):
    # VideoToImagesNode with ffmpeg_exe runs the subprocess path, not the
    # byte-chunk stand-in: 3 stub frames, not len(video)/FRAME_BYTES.
    from talkinghead_datapipeline_spark.plans.reference_compat import (
        run_reference_graph,
    )

    video = spark.createDataFrame(
        pd.DataFrame({"clip_name": ["c"], "video": [b"XYZ"]})
    )
    ctx = run_reference_graph(
        spark,
        [{"name": "VideoToImagesNode", "params": {"ffmpeg_exe": stub_ffmpeg}}],
        {"video": video},
    )
    rows = ctx.get("images").collect()
    assert {(r.clip_name, r.frame_idx) for r in rows} == {("c", 0), ("c", 1), ("c", 2)}
    assert bytes(sorted(rows, key=lambda r: r.frame_idx)[0].image) == b"FRAME0:XYZ"


def test_gate_raises_without_binary(spark):
    # no ffmpeg on PATH in this runtime and no explicit exe → loud gate,
    # raised driver-side before any job is launched.
    import shutil

    if shutil.which("ffmpeg") is not None:
        pytest.skip("real ffmpeg present; gate not reachable")
    with pytest.raises(NotImplementedError, match="ffmpeg not available"):
        video_to_frames(_clips(spark))
