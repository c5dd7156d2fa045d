"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized through the no-op sink so the full plan
executes (count() would let Catalyst prune unused column work; collect()
would bottleneck on the driver for wide results).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import __spark_entry__ as entrymod  # noqa: E402
from pagerank_mapreduce_implementation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def contention_probe() -> dict:
    """Self-describing noise flag for round-over-round comparison: the
    box is a shared VM (BASELINE.md documents 6x whole-suite variance),
    so each BENCH json records whether OTHER tenants were loading the
    host while it ran. Probe = 1-minute load average vs the core count
    at bench start; "contended" means the host was already busier than
    half its cores before we spawned a single Spark task."""
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
        return {
            "load1": round(load1, 2),
            "ncpu": ncpu,
            "contended": load1 > ncpu / 2,
        }
    except OSError:  # getloadavg unsupported: report unknown, not false
        return {"load1": None, "ncpu": os.cpu_count(), "contended": None}


def wait_for_quiet_host(
    threshold: float = 3.0, max_wait_s: float = 180.0, poll_s: float = 5.0
) -> float:
    """Load gate (round-12 verdict item 5): the archived r12 driver
    bench was captured at load1 6.83 and overstated the suite ~19% vs
    the same-code quiet-box run. Rather than record a number known to
    be polluted, hold the start (bounded) until the 1-minute load
    drops under ``threshold``. Returns seconds waited. Disable with
    SPARK_GRAFT_BENCH_LOAD_GATE=0; the gate never blocks past
    ``max_wait_s`` — if the host stays busy, the run proceeds and the
    contention fields in the JSON line say so."""
    if os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "1") == "0":
        return 0.0
    waited = 0.0
    try:
        while os.getloadavg()[0] > threshold and waited < max_wait_s:
            print(
                f"  load gate: load1={os.getloadavg()[0]:.2f} > {threshold}, "
                f"waiting ({waited:.0f}/{max_wait_s:.0f}s)",
                file=sys.stderr,
            )
            time.sleep(poll_s)
            waited += poll_s
    except OSError:
        return 0.0
    return waited


def main() -> None:
    load_gate_waited = wait_for_quiet_host()
    probe_start = contention_probe()
    spark = get_spark(app_name="spark-graft-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Untimed warmup: run every query shape once at the smallest SF so
    # JVM JIT + whole-stage-codegen compilation + parquet footer reads
    # don't land on the first timed query (measured ~10s of one-time
    # cost otherwise). Steady-state is what a long-running cluster sees.
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # warmup must never fail the bench
            print(f"  warmup {name} failed: {exc}", file=sys.stderr)
    def drop_persisted() -> None:
        # Release leftover persisted/localCheckpointed RDD blocks so GC
        # pressure from one query doesn't pollute the next measurement.
        # The RDD walk goes through private py4j internals — measurement
        # hygiene only, so a Spark bump breaking it must degrade the
        # bench, never crash it.
        try:
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
        except Exception as exc:
            print(f"  drop_persisted unavailable: {exc}", file=sys.stderr)
        # Memory-sink hygiene: every streaming query registers a fresh
        # "_stream_<seq>" memory-sink temp view per invocation (names
        # are sequenced so concurrent runs can't collide), so 3 passes
        # x 15 streaming queries would otherwise pin ~45 result tables
        # in the JVM for the whole bench — steadily growing GC
        # pressure that taxes every LATER query's measurement. The
        # result df was already consumed by the noop sink, so the view
        # (the only reference to the sink's rows) can drop now.
        try:
            for tbl in spark.catalog.listTables():
                if tbl.name.startswith("_stream_") and tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
        except Exception as exc:
            print(f"  sink cleanup unavailable: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    drop_persisted()
    # Three timed passes, per-query MIN: the box is a shared VM and
    # individual measurements occasionally take a 3-10x hit from host
    # noise (same query, same session: 6s and 90s minutes apart; whole
    # suites measured 75-104s for identical code). The minimum is the
    # query's actual cost; fewer passes randomly charge host noise to
    # whichever query a bad window lands on.
    timings: dict[str, float] = {}
    for pass_no in range(3):
        for name, fn in entrymod.queries().items():
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            print(f"  [{pass_no}] {name}: {elapsed:.3f}s", file=sys.stderr)
            # drop the result's JVM references AND its pinned blocks
            # promptly: localCheckpoint blocks are unevictable
            # (truncated lineage means they're the only copy), so
            # leftover blocks from prior queries otherwise shrink the
            # memory available to later shuffle-heavy queries.
            del df
            gc.collect()
            drop_persisted()
    total = round(sum(timings.values()), 3)
    # Artifact-drift guard (round-3 verdict item 8): the driver's
    # correctness gate runs oracle_sql() keys, the bench runs queries()
    # keys — if the sets diverge, a query silently escapes one gate.
    qkeys = set(entrymod.queries())
    okeys = set(entrymod.oracle_sql())
    missing_oracle = sorted(
        k for k in qkeys - okeys if k not in entrymod.NO_ORACLE_QUERIES
    )
    stale_oracle = sorted(okeys - qkeys)
    unbenched = sorted(qkeys - set(timings))
    for label, keys in [
        ("queries without an oracle_sql entry", missing_oracle),
        ("oracle_sql entries without a query", stale_oracle),
        ("queries that produced no timing", unbenched),
    ]:
        if keys:
            print(f"  WARNING: {label}: {keys}", file=sys.stderr)
    # end-of-run probe reads load INCLUDING our own 3 passes; the
    # pre-spark probe is the tenant-noise signal
    summary = json.dumps(
        {
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "missing_oracle": missing_oracle,
            "stale_oracle": stale_oracle,
            "unbenched": unbenched,
            "contended": probe_start["contended"],
            "load1_at_start": probe_start["load1"],
            "load_gate_waited_s": load_gate_waited,
            "ncpu": probe_start["ncpu"],
        }
    )
    # Emission order (round-6/7 carry: the driver keeps only the LAST
    # ~2000 stdout chars, and the full 99-query summary is ~3k chars —
    # it can never survive that window intact, which is why BENCH_r0{4,
    # 6,7} recorded parsed:null): (1) the full contract line, complete
    # in logs and persisted to bench_result.json; (2) LAST, a COMPACT
    # contract-shaped line (2-decimal timings of the slowest queries
    # only) sized well under the tail window, so a tail-truncated
    # capture always ends with one complete parseable JSON line.
    print(summary, flush=True)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"),
            "w",
        ) as fh:
            fh.write(summary + "\n")
    except OSError as exc:
        print(f"  bench_result.json not written: {exc}", file=sys.stderr)
    spark.stop()
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15])
    compact = json.dumps(
        {
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
            "queries": {k: round(v, 2) for k, v in slowest.items()},
            "queries_note": "15 slowest; full timings in bench_result.json",
            "contended": probe_start["contended"],
        },
        separators=(",", ":"),
    )
    print(compact, flush=True)


if __name__ == "__main__":
    main()
