"""Phase decomposition of streaming_cdc_replay's construct cost
(guide §1.4): base-table write / changeset writes / stream drain /
final readback, each timed separately on the same session the bench
uses. Numbers in OPTIMIZATION_r13.md (round-2 continuation)."""
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from tidb_lightning_spark.session import get_spark  # noqa: E402
from tidb_lightning_spark.plans import queries as Q  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="cdc-profile")
spark.sparkContext.setLogLevel("ERROR")

# warm
Q.load(spark, sf_dir, "orders").count()

from tidb_lightning_spark.sinks.files_sink import FilesSink  # noqa: E402
from tidb_lightning_spark.streaming.events import stream_cdc_apply  # noqa: E402

n, ins_n = Q.CDCR_BASE, Q.CDCR_INS

def _n_jobs():
    return spark._jsc.sc().statusStore().jobsList(None).size()


for rep in range(3):
    o = Q.load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    tmp = tempfile.mkdtemp(prefix=f"tls_cdcprof_{uuid.uuid4().hex[:6]}_")
    marks = [("t0", time.time())]
    try:
        wh = os.path.join(tmp, "wh")
        sink = FilesSink(wh)
        sink.write_table(
            o.filter(k < n).select(*cols), "cdcrep", "orders_state",
            ["o_orderkey"],
        )
        marks.append(("base_write", time.time()))

        def change(df, status=None, add=0.0, seq=1, deleted=False):
            out = df.select(*cols)
            if status is not None:
                out = out.withColumn("o_orderstatus", F.lit(status))
            if add:
                out = out.withColumn(
                    "o_totalprice", F.col("o_totalprice") + F.lit(add)
                )
            return out.withColumn(
                "_deleted", F.lit(deleted)
            ).withColumn("seq", F.lit(seq).cast("long"))

        cdir = os.path.join(tmp, "changes")
        b1 = change(
            o.filter((k % 10 == 3) & (k % 100 != 3) & (k < n)),
            status="U1", add=1000.0, seq=1,
        ).unionByName(change(o.filter((k >= n) & (k < n + ins_n)), seq=1))
        b1.coalesce(1).write.parquet(os.path.join(cdir, "c0.parquet"))
        hot = o.filter((k % 100 == 3) & (k < n))
        b2 = (
            change(hot, status="XX", add=1500.0, seq=2)
            .unionByName(change(hot, status="U2", add=2000.0, seq=3))
            .unionByName(
                change(o.filter((k % 10 == 7) & (k < n)),
                       seq=2, deleted=True)
            )
        )
        b2.coalesce(1).write.parquet(os.path.join(cdir, "c1.parquet"))
        marks.append(("changeset_writes", time.time()))

        schema = spark.read.parquet(os.path.join(cdir, "c0.parquet")).schema
        changes = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(cdir)
        )
        marks.append(("readstream_setup", time.time()))
        j0 = _n_jobs()
        stream_cdc_apply(
            changes, wh, "cdcrep", "orders_state", ["o_orderkey"],
            os.path.join(tmp, "ckpt"), seq_column="seq",
        )
        drain_jobs = _n_jobs() - j0
        marks.append(("stream_drain", time.time()))
        final = (
            spark.read.parquet(os.path.join(wh, "cdcrep", "orders_state"))
            .select(*cols)
            .orderBy("o_orderkey")
        )
        rows = final.collect()
        _ = spark.createDataFrame(rows, final.schema)
        marks.append(("readback_collect", time.time()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    line = " ".join(
        f"{name}={t - marks[i][1]:.2f}"
        for i, (name, t) in enumerate(marks[1:])
    )
    print(f"rep{rep}: total={marks[-1][1]-marks[0][1]:.2f}  {line}  "
          f"drain_jobs={drain_jobs}", flush=True)
