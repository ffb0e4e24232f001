#!/usr/bin/env python
"""Benchmark harness (driver-run per round; also usable locally).

Runs every registered headline query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a `noop`-format write, so the full
plan executes (scan -> shuffle -> agg/window) without driver-side collect
overhead polluting the numbers. If the ingestion pipeline is available, an
`ingest_lineitem_csv` entry measures the reference's core workload
(CSV -> transform -> sorted parquet) and reports MiB/s alongside.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tidb_lightning_spark.plans import queries as Q  # noqa: E402
from tidb_lightning_spark.session import get_spark  # noqa: E402


def time_df(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def time_query(spec, spark, sf_dir: str) -> tuple[float, float]:
    """Clock the FULL registry call, not just the returned plan's
    execution: eager entries (streaming_cdc_replay drains its stream,
    the BPE trainers run per-merge argmax collects) do their real work
    INSIDE spec.spark(...), so timing only the noop write of the
    returned DataFrame understated them by their whole cost (r11
    verdict item 7). Lazy entries pay only plan construction (ms) on
    top — uniform and honest.

    Returns (total_sec, construct_sec): the split between the registry
    call (driver-side plan building + any eager collects) and the noop
    execution is recorded alongside so construction-side wins/losses
    are visible in BENCH_FULL.json instead of only in ad-hoc A/B logs
    (r12 verdict item 3). The TOTAL is unchanged — same timestamps,
    same methodology — only an intermediate timestamp is recorded."""
    t0 = time.time()
    df = spec.spark(spark, sf_dir)
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    return t2 - t0, t1 - t0


def _upsert_bench(spark, sf_dir: str) -> dict:
    """Quantify the partition-level COW claim: upsert a ~1%-of-keyspace
    CDC batch into a PK-sorted lineitem table and report how many range
    files were actually rewritten vs hardlinked through — the
    O(changed data) evidence, alongside wall time."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tidb_lightning_spark.sinks.files_sink import FilesSink, upsert_table

    src_p = f"{sf_dir}/lineitem.parquet"
    li = spark.read.parquet(src_p)
    size = os.path.getsize(src_p) if os.path.isfile(src_p) else sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src_p) for f in fs
    )
    wh = tempfile.mkdtemp(prefix="tls_bench_u")
    try:
        sink = FilesSink(wh)
        sink.write_table(
            li, "bench", "li_u",
            sort_columns=["l_orderkey", "l_linenumber"], source_bytes=size,
        )
        tdir = f"{wh}/bench/li_u"
        mn = mx = None
        for p in glob.glob(f"{tdir}/*.parquet"):
            md = pq.ParquetFile(p).metadata
            idx = md.schema.names.index("l_orderkey")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        lo = mn + (mx - mn) * 25 // 100
        hi = lo + max((mx - mn) // 100, 1)  # ~1% of the keyspace
        # the synthetic lineitem is NOT unique on its nominal PK (the
        # generator samples keys) — pre-reduce to one deterministic row
        # per key, exactly what a real CDC producer guarantees
        from pyspark.sql import Window

        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            *[F.col(c) for c in li.columns]
        )
        upd = (
            li.filter(F.col("l_orderkey").between(lo, hi))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("l_quantity", F.col("l_quantity") + 1)
        )
        n_upd = upd.count()
        t0 = time.time()
        upsert_table(sink, upd, "bench", "li_u",
                     ["l_orderkey", "l_linenumber"])
        sec = time.time() - t0
        files = [os.path.basename(p)
                 for p in glob.glob(f"{tdir}/*.parquet")]
        linked = sum(1 for f in files if f.startswith("linked-"))
        return {
            "upsert_sec": round(sec, 4),
            "upsert_rows_changed": n_upd,
            "upsert_files_total": len(files),
            "upsert_files_rewritten": len(files) - linked,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _zorder_bench(spark, sf_dir: str) -> dict:
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tidb_lightning_spark.sinks.files_sink import (
        FilesSink,
        write_zordered,
    )

    src = f"{sf_dir}/lineitem.parquet"
    li = spark.read.parquet(src)
    size = os.path.getsize(src) if os.path.isfile(src) else sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src) for f in fs
    )
    wh = tempfile.mkdtemp(prefix="tls_bench_z")
    sink = FilesSink(wh)
    sink.write_table(
        li, "bench", "li_plain",
        sort_columns=["l_orderkey", "l_linenumber"], source_bytes=size,
    )
    write_zordered(
        sink, li, "bench", "li_z", ["l_partkey", "l_suppkey"],
        source_bytes=size,
    )

    # ~5% box in each dimension, placed at the 25% point of the ACTUAL
    # key ranges (from footer stats) so the box is meaningful at any SF
    def col_range(table: str, col: str) -> tuple[int, int]:
        mn = mx = None
        for p in glob.glob(f"{wh}/bench/{table}/*.parquet"):
            md = pq.ParquetFile(p).metadata
            names = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        return int(mn), int(mx)

    pmn, pmx = col_range("li_plain", "l_partkey")
    smn, smx = col_range("li_plain", "l_suppkey")
    pk_lo = pmn + (pmx - pmn) * 25 // 100
    pk_hi = pk_lo + max((pmx - pmn) * 5 // 100, 1)
    sk_lo = smn + (smx - smn) * 25 // 100
    sk_hi = sk_lo + max((smx - smn) * 5 // 100, 1)

    def files_intersecting(table: str) -> tuple[int, int]:
        paths = glob.glob(f"{wh}/bench/{table}/*.parquet")
        hit = 0
        for p in paths:
            md = pq.ParquetFile(p).metadata
            names = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            mn = {"l_partkey": None, "l_suppkey": None}
            mx = {"l_partkey": None, "l_suppkey": None}
            for rg in range(md.num_row_groups):
                for c in mn:
                    st = md.row_group(rg).column(names[c]).statistics
                    mn[c] = st.min if mn[c] is None else min(mn[c], st.min)
                    mx[c] = st.max if mx[c] is None else max(mx[c], st.max)
            if mn["l_partkey"] <= pk_hi and mx["l_partkey"] >= pk_lo and \
               mn["l_suppkey"] <= sk_hi and mx["l_suppkey"] >= sk_lo:
                hit += 1
        return hit, len(paths)

    def scan_sec(table: str) -> float:
        df = (
            spark.read.parquet(f"{wh}/bench/{table}")
            .filter(
                (F.col("l_partkey").between(pk_lo, pk_hi))
                & (F.col("l_suppkey").between(sk_lo, sk_hi))
            )
        )
        df.count()  # warm
        t0 = time.time()
        df.count()
        return time.time() - t0

    z_hit, z_total = files_intersecting("li_z")
    p_hit, p_total = files_intersecting("li_plain")
    out = {
        "zorder_files_scanned": z_hit,
        "zorder_files_total": z_total,
        "plain_files_scanned": p_hit,
        "plain_files_total": p_total,
        "zorder_scan_sec": round(scan_sec("li_z"), 4),
        "plain_scan_sec": round(scan_sec("li_plain"), 4),
    }
    shutil.rmtree(wh, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="tls-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Size scan splits to the bench input so all cores get work: sf0.1 is
    # ~35 MB total, which would otherwise fit in a single 256 MiB split
    # (1 task, 31 idle threads). Mirrors the reference's region splitting
    # (mydump/region.go:131-234) — parallelism comes from byte-range splits.
    total_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    split = max(1 * 1024 * 1024, total_bytes // (cpus * 2))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spread: dict[str, list[float]] = {}

    # warm the JVM/codegen once on the smallest table so q1 isn't charged
    # for session startup
    Q.load(spark, sf_dir, "region").count()

    # ingestion throughput FIRST (the reference's headline number: MiB/s)
    # — measured on a quiet JVM, before 50 queries build heap/GC pressure,
    # so the number is reproducible run-to-run
    try:
        import statistics as _stats

        from tidb_lightning_spark.bench_ingest import run_ingest_bench

        # warmup on the tiny SF first: the CSV-parse/cast/sort/write stages
        # each compile generated code on first execution (~5-7 s of Janino
        # time unrelated to data volume); the same schema at sf0.001 hits
        # the codegen cache so the timed run measures throughput, not
        # compiler startup — the reference's 28 MiB/s is likewise the
        # steady-state rate of a long-running import (restore.go:959)
        for warm_sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            if os.path.isdir(warm_sf):
                run_ingest_bench(spark, warm_sf)

        # MEDIAN of `reps` full pipeline runs, same discipline the r4
        # verdict applied to queries: an interleaved A/B against the r4
        # commit showed single-shot ingest numbers on this box swing
        # 20-40% (24.7..30.3 MiB/s for the identical code), so a one-shot
        # headline chased noise two rounds running. Single-file and x10
        # reps INTERLEAVE (x1,x10,x1,x10,...) so slow in-process drift
        # (GC/JIT/box load) lands on both metrics evenly instead of
        # depressing whichever scale happens to run last. The spread is
        # reported so a wide band flags an untrustworthy median.
        # one UNTIMED warmup at the bench SF and scale: the tiny-SF
        # warmups above compile the plan shapes but the first x10 run
        # still measures ~50% low (JIT tiering on the hot loops needs
        # real volume) — same discipline as the per-query untimed warmup
        run_ingest_bench(spark, sf_dir, scale=10)
        runs_by_scale: dict[int, list] = {1: [], 10: []}
        for _ in range(reps):
            for scale in (1, 10):
                runs_by_scale[scale].append(
                    run_ingest_bench(spark, sf_dir, scale=scale)
                )

        def _ingest_reps(scale: int) -> dict:
            runs = runs_by_scale[scale]
            mid = sorted(runs, key=lambda r: r["seconds"])[len(runs) // 2]
            return {
                **mid,
                "seconds": _stats.median(r["seconds"] for r in runs),
                "mib_per_sec": _stats.median(
                    r["mib_per_sec"] for r in runs),
                "rows_per_sec": _stats.median(
                    r["rows_per_sec"] for r in runs),
                "spread_mib": [round(min(r["mib_per_sec"] for r in runs), 2),
                               round(max(r["mib_per_sec"] for r in runs), 2)],
            }

        ing = _ingest_reps(1)
        timings["ingest_lineitem_csv"] = round(ing["seconds"], 4)
        spread["ingest_lineitem_csv"] = ing["spread_mib"]
        extras["ingest_mib_per_sec"] = round(ing["mib_per_sec"], 2)
        extras["ingest_rows_per_sec"] = round(ing["rows_per_sec"], 1)
        # fixed-cost amortization point: same pipeline, 10x the bytes
        # (multi-file table) — the steady-state MiB/s a long import sees
        ingx = _ingest_reps(10)
        timings["ingest_lineitem_csv_x10"] = round(ingx["seconds"], 4)
        spread["ingest_lineitem_csv_x10"] = ingx["spread_mib"]
        extras["ingest_x10_mib_per_sec"] = round(ingx["mib_per_sec"], 2)
        extras["ingest_x10_rows_per_sec"] = round(ingx["rows_per_sec"], 1)

        # the reference's PRIMARY format: mydumper SQL dumps (INSERT
        # statements -> the Arrow mapInPandas scanner). Its 28 MiB/s
        # headline is this path, so it gets its own measured numbers —
        # x1 (one file, intra-file adaptive chunking) and x10 (the
        # multi-file layout mydumper -F emits), interleaved like the
        # CSV reps.
        if os.path.isdir("/root/testdata/sf0.01"):
            run_ingest_bench(spark, "/root/testdata/sf0.01", fmt="sql")
        run_ingest_bench(spark, sf_dir, fmt="sql", scale=10)  # untimed warmup
        sql_by_scale: dict[int, list] = {1: [], 10: []}
        for _ in range(reps):
            for scale in (1, 10):
                sql_by_scale[scale].append(
                    run_ingest_bench(spark, sf_dir, fmt="sql", scale=scale)
                )
        for scale, tag in ((1, "ingest_lineitem_sqldump"),
                           (10, "ingest_lineitem_sqldump_x10")):
            runs = sql_by_scale[scale]
            timings[tag] = round(
                _stats.median(r["seconds"] for r in runs), 4
            )
            spread[tag] = [
                round(min(r["mib_per_sec"] for r in runs), 2),
                round(max(r["mib_per_sec"] for r in runs), 2),
            ]
        extras["ingest_sql_mib_per_sec"] = round(
            _stats.median(r["mib_per_sec"] for r in sql_by_scale[1]), 2
        )
        extras["ingest_sql_x10_mib_per_sec"] = round(
            _stats.median(r["mib_per_sec"] for r in sql_by_scale[10]), 2
        )

        # third source format: typed parquet (A8) — MiB/s is over the
        # COMPRESSED parquet bytes (~3.6x denser than the CSV text), so
        # rows/s is the cross-format comparable
        run_ingest_bench(spark, sf_dir, fmt="parquet", scale=10)  # warmup
        pq_runs = [
            run_ingest_bench(spark, sf_dir, fmt="parquet", scale=10)
            for _ in range(reps)
        ]
        timings["ingest_lineitem_parquet_x10"] = round(
            _stats.median(r["seconds"] for r in pq_runs), 4
        )
        spread["ingest_lineitem_parquet_x10"] = [
            round(min(r["mib_per_sec"] for r in pq_runs), 2),
            round(max(r["mib_per_sec"] for r in pq_runs), 2),
        ]
        extras["ingest_parquet_x10_mib_per_sec"] = round(
            _stats.median(r["mib_per_sec"] for r in pq_runs), 2
        )
        extras["ingest_parquet_x10_rows_per_sec"] = round(
            _stats.median(r["rows_per_sec"] for r in pq_runs), 1
        )
    except ImportError:
        pass
    except Exception as exc:
        print(f"bench: ingest failed: {exc}", file=sys.stderr)

    # Z-order clustering benefit (K2/L4): the same lineitem written
    # PK-sorted vs Z-ordered on (l_partkey, l_suppkey), then a selective
    # 2-dim box scan on both. Reported: parquet files whose footer
    # min/max intersect the box (what a scan must open) and the scan
    # wall. PK order gives no locality on either column -> every file
    # intersects; the Morton layout confines the box to a few files.
    try:
        extras.update(_zorder_bench(spark, sf_dir))
    except Exception as exc:
        print(f"bench: zorder failed: {exc}", file=sys.stderr)
    try:
        extras.update(_upsert_bench(spark, sf_dir))
    except Exception as exc:
        print(f"bench: upsert failed: {exc}", file=sys.stderr)

    # Per-query MEDIAN of `reps` in-process repetitions (r4 verdict item
    # 8: single-shot numbers on this box swing ~20% under load, so
    # round-over-round deltas chased noise). The min/max spread is
    # reported alongside so a wide band flags an untrustworthy median.
    import statistics

    construct: dict[str, float] = {}
    for name, spec in Q.registry().items():
        try:
            # one untimed warmup execution: absorbs whole-stage-codegen
            # compilation (first run of a plan shape pays ~1-5 s of
            # Janino) and the post-ingest GC/shuffle-cleanup turbulence
            # that made early queries' first rep swing 5x (r4 spread
            # data); the timed reps then measure steady state.
            time_query(spec, spark, sf_dir)
            spark.catalog.clearCache()
            ts = []
            cs = []
            for _ in range(reps):
                t, c = time_query(spec, spark, sf_dir)
                ts.append(t)
                cs.append(c)
                # Repetitions and queries must not pollute each other:
                # drop any persist() a query made (e.g. minhash signature
                # reuse) so later timings aren't skewed by lingering
                # cached blocks / GC pressure.
                spark.catalog.clearCache()
            timings[name] = round(statistics.median(ts), 4)
            spread[name] = [round(min(ts), 4), round(max(ts), 4)]
            construct[name] = round(statistics.median(cs), 4)
        except Exception as exc:  # keep the bench line intact on a bad query
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            spark.catalog.clearCache()

    # Headline value = the ingest wall (the reference-comparable number:
    # BASELINE.md anchors 28 MiB/s bulk-import throughput; BASELINE.md §
    # "Our benchmark harness" defines BENCH as ingest wall + rows/s at the
    # bench SF, with the query timings recorded alongside). Query wall is
    # reported as queries_total_sec — it grows as the registry widens, so
    # it must not skew the round-over-round headline.
    #
    # Output discipline (r8 verdict items 2 & 9): the driver keeps only
    # the LAST 2000 chars of stdout and JSON-parses the line it finds
    # there, so the printed line must fit that window — r5-r8's full
    # 104-entry dump overflowed it and every round graded "parsed":
    # null. The full per-query medians + min/max spreads now go to
    # BENCH_FULL.json next to this script (committed, so it doubles as
    # the previous round's baseline), and the printed line keeps the
    # headline numbers plus the slowest queries that fit the budget.
    # Regressions are only CALLED when the spread windows don't overlap:
    # sf0.1 medians-of-3 swing ~±40% run-to-run with zero code change
    # (r7/r8 both chased phantom regressions), so a median ratio alone
    # is noise; requiring current-min > previous-max × 1.1 filters it.
    total = round(sum(t for t in timings.values() if t > 0), 4)
    here = os.path.dirname(os.path.abspath(__file__))
    # Single-rep sanity runs (SPARK_GRAFT_BENCH_REPS=1, typically at a
    # small SF while iterating) go to an UNTRACKED side file: writing
    # them to the tracked BENCH_FULL.json invites a stray `git add -A`
    # to replace the committed prior-round baseline with junk the
    # sf/reps guards below would then reject — making the next round's
    # regression gate vacuous (this exact accident happened in r10).
    # The tracked baseline only makes sense at the driver's SF (0.1):
    # a committed run at another SF nullifies the regression gate (the
    # sf guard below discards it), so route those to the side file too
    # (this exact accident happened in r12 with an sf0.01 run).
    sf_is_default = float(sf) == 0.1 if sf.replace(".", "").isdigit() else False
    full_name = (
        "BENCH_FULL.json" if (reps >= 2 and sf_is_default) else "BENCH_FULL.local.json"
    )
    full_path = os.path.join(here, full_name)
    # Baseline = the COMMITTED BENCH_FULL.json (git HEAD), not the working
    # file: this run overwrites the working file below, so reading it as
    # the baseline would make a second in-round run silently compare
    # against the first (same-code) run and lose the real prior-round
    # reference (driver ADVICE r9). Fallback to the working copy only
    # when git is unavailable (e.g. the repo dir was exported).
    prev = None
    try:
        import subprocess

        blob = subprocess.run(
            ["git", "-C", here, "show", "HEAD:BENCH_FULL.json"],
            capture_output=True, timeout=30,
        )
        if blob.returncode == 0:
            prev = json.loads(blob.stdout)
    except (OSError, ValueError, subprocess.SubprocessError):
        prev = None
    if prev is None:
        try:
            with open(full_path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = None

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    regressions: list[str] = []
    if prev and prev.get("sf") != sf_val:
        prev = None  # a baseline at another SF would flag everything
    if prev and (reps < 2 or prev.get("bench_reps", 0) < 2):
        # with a single rep the spread window collapses to the median and
        # the gate degenerates to a plain 20% ratio — pure noise at sf0.1
        prev = None
    if prev and isinstance(prev.get("queries"), dict):
        pq_t = prev["queries"]
        pq_s = prev.get("queries_spread", {})
        for name, med in timings.items():
            pmed = pq_t.get(name)
            if pmed is None or pmed <= 0 or med <= 0:
                continue
            lo_now = spread.get(name, [med, med])[0]
            hi_prev = pq_s.get(name, [pmed, pmed])[1]
            if med > 1.2 * pmed and lo_now > 1.1 * hi_prev:
                regressions.append(name)

    full = {
        "queries": timings,
        "queries_spread": spread,
        "queries_construct_sec": construct,
        "bench_reps": reps,
        "queries_total_sec": total,
        "n_queries": len(timings),
        "sf": sf_val,
        "regressions_significant": regressions,
        **extras,
    }
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"bench: could not write {full_path}: {exc}", file=sys.stderr)

    line = {
        "metric": "ingest_wall",
        "value": timings.get("ingest_lineitem_csv", total),
        "unit": "sec",
        "queries_total_sec": total,
        "n_queries": len(timings),
        "sf": sf_val,
        "bench_reps": reps,
        # cap the inline list so a noisy round can't crowd out the query
        # medians (full list always lands in BENCH_FULL.json)
        "regressions_significant": regressions[:8],
        "n_regressions": len(regressions),
        "queries_full": full_name,
        **extras,
        "queries": {},
    }
    # fill `queries` slowest-first until the line reaches the budget; the
    # remaining (fastest) medians live in BENCH_FULL.json
    budget = 1900
    compact = dict(separators=(",", ":"))
    by_cost = sorted(
        timings.items(), key=lambda kv: (-(kv[1] if kv[1] > 0 else 1e9))
    )
    for name, med in by_cost:
        line["queries"][name] = round(med, 2)
        if len(json.dumps(line, **compact)) > budget:
            del line["queries"][name]
            break
    line["queries_inline"] = len(line["queries"])
    out = json.dumps(line, **compact)
    if len(out) > 2000:  # belt-and-braces: never exceed the tail window
        line["queries"] = {}
        out = json.dumps(line, **compact)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
