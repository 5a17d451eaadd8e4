"""Round-6 measurement harness (guide §1). NOT part of the driver contract —
bench.py stays frozen; this file only diagnoses where time goes.

Modes:
  --plans [tag]     capture .explain("formatted") of every headline query DF
                    into plans/r06/<name>_<tag>.txt (default tag: before)
  --stages          run each headline query once with the UI enabled and dump
                    per-stage task time / shuffle bytes from the REST API
  --headline        re-run bench.run_queries with the frozen methodology and
                    print the JSON line (same numbers bench.py would print)
  --noop            time each headline query with the noop sink (isolates the
                    computation from count()'s pruning), best-of-3

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from pyspark.sql import functions as F


def _spark(ui: bool = False):
    from sfa_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    extra = {"spark.ui.enabled": "true"} if ui else {}
    return get_spark("sfa_bench_extra", cores=cores, shuffle_partitions=cores,
                     extra_conf=extra)


def headline_dfs(spark, sf_dir: str, n_urls: int | None = None):
    """Build (name -> DataFrame) for every headline + hyperfunction query,
    mirroring bench.py's dataflow (cached tier etc.)."""
    import bench

    if n_urls is None:  # same knob the frozen bench honors
        n_urls = int(os.environ.get("SPARK_GRAFT_PAGES", "400"))
    bench._warm_workers(spark, spark.sparkContext.defaultParallelism)
    from sfa_spark.encode import encode_tier_blocks_gapfill
    from sfa_spark.generator import generate_pages
    from sfa_spark.pipeline import run_pipeline, sfa_downsample_words
    from sfa_spark.rollup import gap_fill_locf, reaggregate, rollup_tier
    from sfa_spark.operators.downsample import m4_downsample
    from sfa_spark.operators.rate import counter_increase
    from sfa_spark.operators.sketches import hll_estimate, hll_merge, hll_registers

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = {}
    t1m_plan = rollup_tier(events, ["user_id"], "ts", "value", "1m")
    out["q_rollup_1m"] = t1m_plan
    t1m = t1m_plan.cache()
    t1m.count()
    t1h = reaggregate(t1m, ["user_id"], "1h")
    out["q_rollup_1h"] = t1h
    out["q_rollup_1d"] = reaggregate(t1h, ["user_id"], "1d")
    out["q_locf_1h"] = gap_fill_locf(t1h, ["user_id"], "1h")
    out["q_encode_1m"] = encode_tier_blocks_gapfill(t1m, "user_id", tier="1m").agg(
        F.sum("n").alias("pts"), F.sum("raw_bytes").alias("raw"),
        F.sum("enc_bytes").alias("enc"))

    pages = generate_pages(spark, n_urls=n_urls, mean_crawls=10, span_days=7.0).cache()
    pages.count()
    res = run_pipeline(spark, pages, encode_tiers=("1h",), collect_metrics=False)
    out["q_pipeline_blocks_1h"] = res.blocks["1h"].agg(
        F.count(F.lit(1)).alias("blocks"), F.sum("n").alias("points"),
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc"))
    filled_1h_pages = res.filled["1h"].cache()
    n_filled = filled_1h_pages.count()
    out["q_sfa_words"] = sfa_downsample_words(
        spark, filled_1h_pages, approx_rows=n_filled)

    ev_day = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id", "ts", "value", "event_id")
    out["q_hll_daily_via_hourly_merge"] = hll_estimate(
        hll_merge(hll_registers(ev_day, ["day", "hour"], "user_id"), ["day"]),
        ["day"])
    out["q_m4_daily_256"] = m4_downsample(
        events, ["user_id"], "ts", "value",
        F.date_trunc("day", F.col("ts")), 86400, width=256)
    out["q_counter_rate_1h"] = counter_increase(
        ev_day.withColumn("ctr", F.col("event_id")),
        ["user_id"], "ts", "ctr", "1h", ["event_id"])
    return out


def capture_plans(tag: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    os.makedirs("plans/r06", exist_ok=True)
    for name, df in headline_dfs(spark, sf_dir).items():
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
            f.write(p)
        print(f"wrote plans/r06/{name}_{tag}.txt ({p.count('Exchange')} Exchange refs)")
    spark.stop()


def _rest_stages(port: int = 4040) -> list[dict]:
    base = f"http://localhost:{port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=complete"))


def run_stages() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark(ui=True)
    dfs = headline_dfs(spark, sf_dir)
    report = {}
    for name, df in dfs.items():
        before = {s["stageId"] for s in _rest_stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        stages = [s for s in _rest_stages() if s["stageId"] not in before]
        report[name] = {
            "wall_s": round(wall, 3),
            "stages": [
                {
                    "id": s["stageId"],
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s["numCompleteTasks"],
                    "task_time_s": round(s.get("executorRunTime", 0) / 1000, 2),
                    "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                    "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                }
                for s in sorted(stages, key=lambda s: s["stageId"])
            ],
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(report, indent=1))
    spark.stop()


def run_noop(best_of: int = 3) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    dfs = headline_dfs(spark, sf_dir)
    times = {}
    for name, df in dfs.items():
        best = None
        for _ in range(best_of):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    print(json.dumps({"noop_best_of": best_of, "queries": times,
                      "total": round(sum(times.values()), 3)}))
    spark.stop()


def run_headline() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    n_urls = int(os.environ.get("SPARK_GRAFT_PAGES", "400"))
    r = bench.bench_once(cpus, sf_dir, n_urls)
    print(json.dumps({"value": r["total"], "queries": r["times"],
                      "hyperfunctions": r["extras"]["hyperfunctions"]}))


if __name__ == "__main__":
    if "--plans" in sys.argv:
        i = sys.argv.index("--plans")
        tag = sys.argv[i + 1] if len(sys.argv) > i + 1 else "before"
        capture_plans(tag)
    elif "--stages" in sys.argv:
        run_stages()
    elif "--noop" in sys.argv:
        run_noop()
    else:
        run_headline()
