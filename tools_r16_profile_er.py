"""Profile er_backfill per-job: run the bench's exact 4-batch fold
with event logging on, then parse job wall times grouped by call site.
Round-16 measurement tool (guide §1)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.session import get_spark
from api_weather_kafka_clickhouse_spark.streaming.er_ingest import er_ingest_batch
from api_weather_kafka_clickhouse_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = tempfile.mkdtemp(prefix="evlog_")

spark = get_spark(
    "profile_er",
    extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
    },
)

c = load(spark, "customer", SF_DIR).select(
    F.col("c_custkey").alias("rec_id"),
    F.col("c_name").alias("name"),
    F.col("c_nationkey").cast("bigint").alias("nation"),
    F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
)
bounds = c.approxQuantile("rec_id", [0.25, 0.5, 0.75], 0.0)
cuts = [float("-inf"), *bounds, float("inf")]
batches = [
    c.filter((F.col("rec_id") > lo) & (F.col("rec_id") <= hi))
    for lo, hi in zip(cuts, cuts[1:])
]

base = tempfile.mkdtemp(prefix="prof_er_")
stages: dict[str, float] = {}
t0 = time.perf_counter()
for bid, b in enumerate(batches):
    spark.sparkContext.setJobGroup(f"batch{bid}", f"er batch {bid}")
    er_ingest_batch(
        b, bid, f"{base}/store", f"{base}/pairs", f"{base}/labels",
        stage_times=stages,
    )
wall = time.perf_counter() - t0
print("WALL", round(wall, 2), "stages", {k: round(v, 2) for k, v in stages.items()})
shutil.rmtree(base, ignore_errors=True)
spark.stop()

# parse event log
jobs = {}
stageinfo = {}
paths = [p for p in glob.glob(os.path.join(EVDIR, "**", "*"), recursive=True) if os.path.isfile(p)]
for path in paths:
    for line in open(path, errors="ignore"):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if not isinstance(ev, dict):
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "group": props.get("spark.jobGroup.id", ""),
                "desc": (props.get("spark.job.description") or props.get("callSite.short") or "")[:90],
                "stages": ev.get("Stage IDs", []),
            }
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stageinfo[si["Stage ID"]] = {
                "name": si["Stage Name"][:70],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                "tasks": si["Number of Tasks"],
            }

print(f"\n{'job':>4} {'sec':>7}  {'group':8s} desc / stages")
tot = 0.0
per_group: dict[str, float] = {}
for jid, j in sorted(jobs.items()):
    if "end" not in j:
        continue
    sec = (j["end"] - j["start"]) / 1000.0
    tot += sec
    per_group[j["group"]] = per_group.get(j["group"], 0.0) + sec
    snames = "; ".join(
        f"{stageinfo[s]['name']}[{stageinfo[s]['tasks']}t,{stageinfo[s]['ms']}ms]"
        for s in j["stages"] if s in stageinfo
    )
    print(f"{jid:>4} {sec:7.2f}  {j['group']:8s} {j['desc']} | {snames[:220]}")
print("sum of job walls:", round(tot, 2), "per group:", {k: round(v, 2) for k, v in per_group.items()})
shutil.rmtree(EVDIR, ignore_errors=True)
