"""Tests for the graph-config plan builder, inference scaffolding, streaming
incremental layer, and media sources (SURVEY §5 items 3-4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import normalize_events_ts
from talkinghead_datapipeline_spark.operators.inference import (
    batched_inference,
    split_error_channel,
)
from talkinghead_datapipeline_spark.operators.models import (
    EmocaEncoderStub,
    FlameDecoderStub,
    RendererStub,
    Wav2vecStub,
    fake_decode_image,
    view_transform,
)
from talkinghead_datapipeline_spark.plans.graph import NODE_REGISTRY, Pipeline
from talkinghead_datapipeline_spark.sources.media import scan_binary_dir
from talkinghead_datapipeline_spark.streaming.incremental import (
    incremental_append,
    pending_keys,
    run_available_now,
    tumbling_stream_agg,
)

# ---------------------------------------------------------------------------
# plans.graph
# ---------------------------------------------------------------------------


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    graph = [
        {"name": "source_parquet", "params": {"sf_dir": sf_dir, "table": "lineitem", "output": "lineitem"}},
        {"name": "source_parquet", "params": {"sf_dir": sf_dir, "table": "orders", "output": "orders"}},
        {"name": "filter", "params": {"input": "lineitem", "predicate": "l_quantity > 10", "output": "big_items"}},
        {
            "name": "join",
            "params": {"left": "big_items", "right": "orders", "on": "l_orderkey = o_orderkey", "how": "inner", "broadcast_right": False, "output": "joined"},
        },
        {
            "name": "aggregate",
            "params": {"input": "joined", "keys": ["o_orderstatus"], "aggs": ["round(sum(l_extendedprice), 2) AS revenue", "count(*) AS n"], "output": "summary"},
        },
        {"name": "sink_parquet", "params": {"input": "summary", "path": str(tmp_path / "summary"), "output": "summary_out"}},
    ]
    ctx = Pipeline(graph).build(spark)
    out = ctx.get("summary_out").toPandas()
    assert set(out["o_orderstatus"]) == {"O", "F", "P"}
    assert (out["n"] > 0).all()


def test_pipeline_unknown_node_rejected():
    with pytest.raises(ValueError, match="unknown nodes"):
        Pipeline([{"name": "no_such_node"}])


def test_pipeline_missing_input_rejected(spark):
    graph = [{"name": "filter", "params": {"input": "nope", "predicate": "1=1", "output": "x"}}]
    with pytest.raises(KeyError, match="missing input table 'nope'"):
        Pipeline(graph).build(spark)


def test_pipeline_test_run_smoke(spark, sf_dir):
    graph = [
        {"name": "source_parquet", "params": {"sf_dir": sf_dir, "table": "events", "output": "events"}},
        {
            "name": "window",
            "params": {"input": "events", "exprs": ["avg(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS win_avg"], "output": "smoothed"},
        },
    ]
    Pipeline(graph).test_run(spark)  # must not raise


def test_registry_has_core_vocabulary():
    assert {"source_parquet", "filter", "select", "join", "aggregate", "window", "resample", "savgol_smooth", "dedup_exact", "sink_parquet"} <= set(NODE_REGISTRY)


# ---------------------------------------------------------------------------
# operators.inference — lazy resource + error channel
# ---------------------------------------------------------------------------


def test_batched_inference_with_error_channel(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["ok", "ok", "boom", "ok"]})
    )

    def batch_fn(model, pdf):
        if (pdf["text"] == "boom").any():
            raise RuntimeError("poison batch")
        out = pdf.copy()
        out["score"] = pdf["text"].str.len() * model["scale"]
        return out

    out = batched_inference(
        df.repartition(4, "doc_id"),
        output_schema="doc_id long, text string, score double, error string",
        model_key="test_model",
        model_factory=lambda: {"scale": 2.0},
        batch_fn=batch_fn,
    )
    ok, bad = split_error_channel(out)
    ok_pdf = ok.toPandas().sort_values("doc_id")
    bad_pdf = bad.toPandas()
    assert set(bad_pdf["doc_id"]) == {3}
    assert "poison batch" in bad_pdf["error"].iloc[0]
    assert (ok_pdf["score"] == ok_pdf["text"].str.len() * 2.0).all()


def test_model_stubs_contracts():
    w2v = Wav2vecStub(dim=4)
    wav = np.sin(np.linspace(0, 100, 16000))  # 1 s @ 16 kHz
    feats = w2v.features(wav)
    vol = w2v.volume(wav)
    assert feats.shape == (int(1 * 50 - 0.25), 4)
    assert vol.shape == (50,)
    assert (vol >= 0).all()

    enc = EmocaEncoderStub()
    code = enc.encode(b"fake-crop-bytes")
    assert {k: len(v) for k, v in code.items()} == EmocaEncoderStub.SPLITS
    code2 = enc.encode(b"fake-crop-bytes")
    np.testing.assert_array_equal(code["shape"], code2["shape"])  # deterministic

    flame = FlameDecoderStub()
    verts, lmk = flame.decode(code["shape"][:8], code["exp"][:8])
    assert verts.shape == (64, 3) and lmk.shape == (12, 3)
    # linearity: decode(0,0) == template
    v0, _ = flame.decode(np.zeros(8), np.zeros(8))
    np.testing.assert_allclose(v0, flame.template)

    cam = np.array([1.0, 0.0, 0.0])
    img = RendererStub((4, 4), faces=flame.faces).render(
        verts, view_transform(verts, cam), cam
    )
    assert len(img) == 16

    arr = fake_decode_image(b"imgbytes", (8, 8))
    assert arr.shape == (8, 8, 3) and arr.dtype == np.uint8


def test_inference_pipeline_wav2vec_shape(spark):
    # N6 end-to-end shape: per-clip waveform rows → (clip, frame, feature)
    clips = pd.DataFrame(
        {
            "name": ["a", "b"],
            "wav": [list(np.sin(np.arange(8000) / 10.0)), list(np.cos(np.arange(16000) / 7.0))],
        }
    )
    df = spark.createDataFrame(clips)

    def batch_fn(model, pdf):
        rows = []
        for _, r in pdf.iterrows():
            feats = model.features(np.asarray(r["wav"]))
            for t, f_row in enumerate(feats):
                rows.append({"name": r["name"], "frame_idx": t, "feat": f_row.tolist(), "error": None})
        return pd.DataFrame(rows, columns=["name", "frame_idx", "feat", "error"])

    out = batched_inference(
        df,
        output_schema="name string, frame_idx long, feat array<double>, error string",
        model_key="wav2vec_stub",
        model_factory=lambda: Wav2vecStub(dim=4),
        batch_fn=batch_fn,
    ).toPandas()
    counts = out.groupby("name")["frame_idx"].count()
    assert counts["a"] == int(0.5 * 50 - 0.25)
    assert counts["b"] == int(1.0 * 50 - 0.25)


# ---------------------------------------------------------------------------
# streaming.incremental
# ---------------------------------------------------------------------------


def test_pending_keys_anti_join(spark):
    cand = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")}))
    done = spark.createDataFrame(pd.DataFrame({"k": [2, 4]}))
    got = sorted(r["k"] for r in pending_keys(cand, done, "k").collect())
    assert got == [1, 3]


def test_incremental_append_memoizes(spark, tmp_path):
    sink = str(tmp_path / "sink")
    batch1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]}))
    assert incremental_append(batch1, sink, "k") == 2
    # second run: overlap {2}, only 3 is new
    batch2 = spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": [20.0, 30.0]}))
    assert incremental_append(batch2, sink, "k") == 1
    assert spark.read.parquet(sink).count() == 3
    # recompute override appends everything again (the reference's flag)
    assert incremental_append(batch2, sink, "k", recompute=True) == 2


def test_incremental_append_raises_on_unreadable_sink(spark, tmp_path):
    """An existing-but-unreadable sink must RAISE, never be treated as a
    first run (ADVICE r1): appending blind would duplicate every
    previously-written key; overwriting would drop them."""
    sink = tmp_path / "sink"
    sink.mkdir()
    (sink / "part-00000.parquet").write_bytes(b"this is not parquet")
    batch = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1.0]}))
    with pytest.raises(RuntimeError, match="exists but is unreadable"):
        incremental_append(batch, str(sink), "k")
    # the corrupt sink was not clobbered by the failed run
    assert (sink / "part-00000.parquet").read_bytes() == b"this is not parquet"


def test_streaming_available_now_tumbling(spark, sf_dir, tmp_path):
    import shutil as sh

    src = tmp_path / "stream_src"
    src.mkdir()
    sh.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    # Read the stream with whatever schema the fixture's footer declares
    # (nanos-as-long, timestamp[us]/NTZ, or utc-adjusted timestamp) and let
    # the shared catalog normalizer produce TimestampType — the same seam
    # production queries go through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def transform(stream):
        return tumbling_stream_agg(normalize_events_ts(stream))

    sink = str(tmp_path / "stream_sink")
    run_available_now(
        spark, str(src), schema, transform, sink, str(tmp_path / "ckpt")
    )
    out = spark.read.parquet(sink)
    assert out.count() > 0
    assert {"window_start", "event_type", "n_events", "sum_value"} == set(out.columns)


# ---------------------------------------------------------------------------
# sources.media
# ---------------------------------------------------------------------------


def test_scan_binary_dir_key_derivation(spark, tmp_path):
    root = tmp_path / "media"
    (root / "speaker1" / "sess1").mkdir(parents=True)
    (root / "speaker2").mkdir()
    (root / "speaker1" / "sess1" / "clip01.mp4").write_bytes(b"\x00fakevideo")
    (root / "speaker2" / "clip02.mp4").write_bytes(b"\x00fakevideo2")
    (root / "speaker2" / "notes.txt").write_bytes(b"skip me")

    df = scan_binary_dir(spark, str(root), glob="*.mp4")
    rows = {r["clip_name"]: r for r in df.collect()}
    # E2 semantics: relative path parts joined by '_', suffix stripped
    assert set(rows) == {"speaker1_sess1_clip01", "speaker2_clip02"}
    assert rows["speaker1_sess1_clip01"]["content"] == b"\x00fakevideo"
    assert rows["speaker2_clip02"]["meta"]["n_bytes"] == len(b"\x00fakevideo2")


def test_graph_components_and_range_join_nodes(spark, sf_dir):
    """Round-2 graph vocabulary: component-based canonicalization and the
    binned range join, declared as a JSON-style graph."""
    from talkinghead_datapipeline_spark.plans.graph import Pipeline

    graph = [
        {
            "name": "source_parquet",
            "params": {"sf_dir": sf_dir, "table": "documents", "output": "docs"},
        },
        {
            "name": "dedup_components",
            "params": {
                "input": "docs",
                "key": "doc_id",
                "text": "text",
                "threshold": 0.2,
                "output": "docs_canon",
            },
        },
        {
            "name": "source_parquet",
            "params": {"sf_dir": sf_dir, "table": "events", "output": "ev"},
        },
        {
            "name": "select",
            "params": {
                "input": "ev",
                "exprs": ["user_id", "event_id", "ts", "value"],
                "output": "points",
            },
        },
        {
            "name": "select",
            "params": {
                "input": "ev",
                "exprs": [
                    "user_id",
                    "event_id AS alert_id",
                    "ts AS start_ts",
                    "ts + INTERVAL 10 MINUTES AS end_ts",
                ],
                "output": "intervals",
            },
        },
        {
            "name": "range_join",
            "params": {
                "points": "points",
                "intervals": "intervals",
                "point_ts": "ts",
                "start_ts": "start_ts",
                "end_ts": "end_ts",
                "keys": ["user_id"],
                "output": "hits",
            },
        },
    ]
    ctx = Pipeline(graph).build(spark)
    docs_n = ctx.get("docs").count()
    canon_n = ctx.get("docs_canon").count()
    assert 0 < canon_n <= docs_n
    # every event hits at least its own interval
    assert ctx.get("hits").count() >= ctx.get("points").count()


def test_graph_dedup_and_salted_join_nodes(spark, sf_dir):
    """North-star graph vocabulary: minhash pair node → canonical dedup →
    salted join, declared as a JSON-style graph."""
    from talkinghead_datapipeline_spark.plans.graph import Pipeline

    graph = [
        {
            "name": "source_parquet",
            "params": {"sf_dir": sf_dir, "table": "documents", "output": "docs"},
        },
        {
            "name": "dedup_minhash_pairs",
            "params": {
                "input": "docs",
                "key": "doc_id",
                "text": "text",
                "threshold": 0.2,
                "output": "pairs",
            },
        },
        {
            "name": "dedup_keep_canonical",
            "params": {
                "input": "docs",
                "pairs": "pairs",
                "key": "doc_id",
                "output": "docs_dedup",
            },
        },
        {
            "name": "source_parquet",
            "params": {"sf_dir": sf_dir, "table": "embeddings", "output": "emb"},
        },
        {
            "name": "select",
            "params": {
                "input": "emb",
                "exprs": ["vec_id AS doc_id", "label"],
                "output": "emb_keyed",
            },
        },
        {
            "name": "salted_join",
            "params": {
                "left": "docs_dedup",
                "right": "emb_keyed",
                "on": ["doc_id"],
                "n_salts": 4,
                "output": "joined",
            },
        },
    ]
    ctx = Pipeline(graph).build(spark)
    docs_n = ctx.get("docs").count()
    pairs_n = ctx.get("pairs").count()
    dedup_n = ctx.get("docs_dedup").count()
    assert dedup_n <= docs_n
    losers = (
        ctx.get("pairs").select("key_b").distinct().count()
    )
    assert dedup_n == docs_n - losers
    # Salted join result matches a plain join.
    plain = ctx.get("docs_dedup").join(ctx.get("emb_keyed"), "doc_id").count()
    assert ctx.get("joined").count() == plain
    assert pairs_n >= 0


def test_foreach_batch_upsert(spark, sf_dir, tmp_path):
    """E7-inverted: keyed upsert sink via foreachBatch — second run with the
    same source replaces rather than duplicates."""
    import os

    from pyspark.sql import functions as F

    from talkinghead_datapipeline_spark.catalog import table_path
    from talkinghead_datapipeline_spark.streaming.incremental import (
        run_foreach_batch_upsert,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    src = str(tmp_path / "src")
    os.makedirs(src)
    os.symlink(table_path(sf_dir, "events"), os.path.join(src, "events.parquet"))
    sink = str(tmp_path / "sink")

    def agg(df):
        return df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

    run_foreach_batch_upsert(
        spark, src, schema, agg, sink, str(tmp_path / "ck1"), key="user_id"
    )
    first = {r.user_id: r.n for r in spark.read.parquet(sink).collect()}
    # Re-run with a FRESH checkpoint: same batch reprocessed → upsert must
    # leave counts identical (no duplicate keys).
    run_foreach_batch_upsert(
        spark, src, schema, agg, sink, str(tmp_path / "ck2"), key="user_id"
    )
    second = {r.user_id: r.n for r in spark.read.parquet(sink).collect()}
    assert first == second
    assert len(second) == spark.read.parquet(sink).select("user_id").distinct().count()


def test_broadcast_weights_factory(spark):
    """Weights broadcast once; model rebuilt from bc.value in workers."""
    import numpy as np
    import pandas as pd

    from talkinghead_datapipeline_spark.operators.inference import (
        batched_inference,
        broadcast_weights_factory,
        split_error_channel,
    )

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, x double")
    weights = np.arange(8, dtype=np.float64)  # stand-in for big tensors

    class Linear:
        def __init__(self, w):
            self.w = w

        def apply(self, x):
            return float(self.w.sum()) * x

    factory = broadcast_weights_factory(df, weights, Linear)

    def fn(model, pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["y"] = [model.apply(v) for v in pdf["x"]]
        out["error"] = None
        return out[["id", "y", "error"]]

    res = batched_inference(
        df, "id long, y double, error string", "bc_linear", factory, fn
    )
    ok, _ = split_error_channel(res)
    got = {r.id: r.y for r in ok.collect()}
    assert got[3] == 28.0 * 3  # sum(0..7)=28
    assert len(got) == 100
