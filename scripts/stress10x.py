"""10× scale-stress for the round-2 operators — the local proxy for
"does the plan shape survive a scale-up" (ARCHITECTURE.md §7).

Unions the sf0.1 fixtures 10× in memory with id offsets (so keys stay
distinct and near-dup structure replicates), then times each operator at
1× and 10×.  Usage:

    PYTHONPATH=/root/repo python scripts/stress10x.py
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streaming_spark import get_spark, load_tables

SF_DIR = "/root/testdata/sf0.1"


def replicate(df, times: int, id_cols: list[str], step: int):
    """Union ``times`` copies with offset ids — replicas keep internal
    structure (duplicates replicate too)."""
    parts = []
    for i in range(times):
        c = df
        for col in id_cols:
            c = c.withColumn(col, F.col(col) + i * step)
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label: str, fn) -> None:
    t0 = time.perf_counter()
    n = fn()
    print(f"{label}: {time.perf_counter() - t0:.2f}s ({n} rows)", flush=True)


def main() -> None:
    spark = get_spark(app_name="stress10x")
    t = load_tables(spark, SF_DIR)
    docs1 = t["documents"]
    docs10 = replicate(docs1, 10, ["doc_id"], 10_000_000).localCheckpoint()
    li1 = t["lineitem"].select("l_orderkey", "l_quantity")
    li10 = replicate(li1, 10, ["l_orderkey"], 100_000_000).localCheckpoint()
    emb1 = t["embeddings"]
    emb10 = replicate(emb1, 10, ["vec_id"], 1_000_000).localCheckpoint()

    from streaming_spark.operators import curation
    from streaming_spark.operators.similarity import ivf_topk

    # sequence packing: one bounded window shuffle per source stratum
    timed("pack_sequences 1x (5k docs)", lambda: curation.pack_sequences(docs1).count())
    timed(
        "pack_sequences 10x (50k docs)", lambda: curation.pack_sequences(docs10).count()
    )

    # sorted-layout write: sampled range shuffle + in-partition sort
    import tempfile

    def write_layout(df):
        path = tempfile.mkdtemp(prefix="stress_layout_") + "/t"
        curation.write_sorted_layout(df, path, "l_orderkey", n_files=32)
        return spark.read.parquet(path).count()

    timed("sorted_layout 1x (600k rows)", lambda: write_layout(li1))
    timed("sorted_layout 10x (6M rows)", lambda: write_layout(li10))

    # df-wire external pipe: R-serialization both ways, children per task
    from streaming_spark.queries.streamops import _DF_CHILD_SUM, _df_child_cmd
    from streaming_spark.operators.pipe import pipe_df

    def df_pipe(df):
        return pipe_df(df.select(F.col("l_quantity")), _df_child_cmd(_DF_CHILD_SUM), "s DOUBLE, n INT").count()

    timed("pipe_df sum 1x (600k rows)", lambda: df_pipe(li1))
    timed("pipe_df sum 10x (6M rows)", lambda: df_pipe(li10))

    # IVF ANN: quantizer on bounded sample; assignment/probe distributed
    q1 = emb1.filter(F.col("vec_id") < 8)
    timed(
        "ivf_topk 1x (500 vecs)",
        lambda: ivf_topk(emb1, q1, dim=64, k=5, n_cells=8, nprobe=4).count(),
    )
    timed(
        "ivf_topk 10x (5k vecs)",
        lambda: ivf_topk(emb10, q1, dim=64, k=5, n_cells=8, nprobe=4).count(),
    )

    # tar container source: one binaryFile task per shard
    import pyarrow.parquet as pq

    from streaming_spark.io import table_path
    from streaming_spark.operators import multimodal

    base = pq.read_table(table_path(SF_DIR, "documents"), columns=["doc_id", "text"])
    samples1 = [
        (str(i), "txt", (s or "").encode())
        for i, s in zip(base["doc_id"].to_pylist(), base["text"].to_pylist())
    ]
    samples10 = [
        (str(int(k) + r * 10_000_000), e, p)
        for r in range(10)
        for k, e, p in samples1
    ]

    def tar_roundtrip(samples, n_shards):
        d = tempfile.mkdtemp(prefix="stress_tar_")
        multimodal.write_tar_shards(samples, d, n_shards=n_shards)
        return multimodal.read_tar_members(spark, d).count()

    timed("tar_ingest 1x (5k members)", lambda: tar_roundtrip(samples1, 8))
    timed("tar_ingest 10x (50k members)", lambda: tar_roundtrip(samples10, 32))

    round2b(spark, t)

    spark.stop()


if __name__ == "__main__":
    main()


def round2b(spark, t):
    """Scale-stress for the round-2b operators: funnel fold,
    decontamination probe, multires cascade."""
    from streaming_spark.queries.curation import decontaminate_flags
    from streaming_spark.queries.windows import funnel_counts

    docs1 = t["documents"]
    docs10 = replicate(docs1, 10, ["doc_id"], 10_000_000).localCheckpoint()
    ev1 = t["events"]
    ev10 = replicate(ev1, 10, ["user_id", "event_id"], 10_000_000).localCheckpoint()

    timed("funnel 1x (100k events)", lambda: funnel_counts(ev1).count())
    timed("funnel 10x (1M events)", lambda: funnel_counts(ev10).count())

    pred = F.col("doc_id") % 97 == 0
    timed(
        "decontaminate 1x (5k docs)",
        lambda: decontaminate_flags(docs1, pred).count(),
    )
    timed(
        "decontaminate 10x (50k docs)",
        lambda: decontaminate_flags(docs10, pred).count(),
    )

    def multires(ev):
        m = ev.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("minute", F.col("ts"))).alias("bucket"),
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        h = m.groupBy(
            "event_type", (F.floor(F.col("bucket") / 3600) * 3600).alias("bucket")
        ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        return m.count() + h.count()

    timed("multires 1x (100k events)", lambda: multires(ev1))
    timed("multires 10x (1M events)", lambda: multires(ev10))
