"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink (forces the whole
plan to execute without paying collect/serialize-to-driver costs — the right
way to time a DataFrame plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q6_revenue_delta",
    "s2_chunked_scan_orders",
    "a4_checksums",
    "x_dedup_exact",
    "x_text_stats",
    "x_lang_id",
    "x_cosine_topk",
    "x_events_sessionize",
    "x_minhash_pairs",
    # the heaviest shuffle shape in the repo: corpus-wide exchange on line
    # value (C4-style global line dedup)
    "x_dedup_lines_global",
    # token-block dedup: same single-exchange shape, block-granularity
    "x_dedup_blocks_global",
    # the ANN/PQ composition — benched so a codegen/interpretation
    # regression in the encode path (the round-5 64 KB fallback) is visible
    "x_ivf_pq_topk",
    # production checksum path (xxhash64 row hash); md5 twin stays above
    "a4_checksums_fast",
    # the embedding-curation composite (decontaminate → SemDeDup → DSIR
    # select) — wall-time guard for the whole curation stack in one entry
    "x_embcurate_select",
    # sliding-window ExactSubstr dedup — the widest explode in the repo
    # (every token k-gram), benched so a blowup in the gram/covered-token
    # expansion is visible
    "x_substring_dedup",
    # the Gopher rule family — must stay a pure scan-side projection
    "x_gopher_quality",
    # the text-curation composite (doc dedup → substring dedup → Gopher →
    # repetition gates) — wall-time guard for the whole text stack,
    # the prepare-CLI twin of x_embcurate_select
    "x_text_curate",
    # CCNet-style bigram-LM scoring: train (capped, broadcast) + score —
    # benched so an accidental shuffle of the corpus side is visible
    "x_ngram_lm_score",
    # symmetric int8 ANN: must stay a single codegen projection +
    # TakeOrdered (zero joins, zero exchanges)
    "x_sq8_topk",
    # exact rational-α temperature rebalance (integer k-th roots): one
    # count aggregate + a scan-side CASE filter — zero extra exchanges
    "x_temperature_mix_a03",
    # SoftDeDup frequency reweighting: ONE fp-keyed count aggregate +
    # join-back — benched so an accidental window-over-corpus (sort) or
    # lost map-side combine is visible
    "x_soft_dedup_weights",
    # token-budget selection: hierarchical cutoff (score histogram →
    # id-bucket histogram → one-bucket window) — benched so a regression
    # to the naive single-partition global running-sum window is visible
    "x_budget_select",
    # the per-language form: all groups' cutoffs from ONE histogram, all
    # boundary groups resolved together — benched so a regression to the
    # skew-prone window-partitioned-by-lang form is visible
    "x_budget_select_by_lang",
    # char-diversity signals (Simpson/distinct/run-length family): must
    # stay a pure scan-side projection — benched so an accidental
    # explode/exchange in the run-length machinery is visible
    "x_diversity_chars",
    # weighted-epoch materialization: scan-side explode fan-out only —
    # benched so the copy-count expression never grows a shuffle
    "x_repeat_by_weight",
    # exact-integer centroid cosine + prototype pruning: one tiny
    # (label,pos) exchange + broadcast back + per-row folds + one window
    # — benched so the centroid path never regresses to pairwise work
    "x_centroid_prune",
    # the window-free approx prune arm (round 13: distributed histogram
    # walk + shared scoring checkpoint) — benched so the one-scoring-
    # pass shape and the histogram-only windows never regress
    "x_centroid_prune_approx",
    # label-masked GEMM hard-negative mining: one Arrow corpus pass,
    # candidate window only — benched so the mask stays inside the local
    # top-k (masking after would re-rank the whole corpus)
    "x_hard_negatives",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from mydumper_spark.session import get_session

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    timings: dict[str, float] = {}
    cpu0 = _cpu_counters()

    # warm the JVM/codegen paths once with the cheapest query so q1 doesn't
    # absorb session startup cost
    qs["q6_revenue_delta"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # host-load snapshot so a drifted run is self-diagnosing (the
        # r7→r8 and r8→r9 bench episodes were host contention, proven
        # after the fact by SCALE.md forensics — record the evidence
        # inline instead): loadavg is the 1/5/15-min run-queue; idle/
        # iowait/steal are /proc/stat DELTAS across the timed loop
        # itself (since-boot cumulative counters would hide a contended
        # minute inside weeks of idle history)
        "host": _host_load(cpu0),
    }
    # machine-visible contention verdict (round 12): every disputed bench
    # episode (r7→r8, r8→r9, r11) was adjudicated after the fact from the
    # same evidence this computes — steal% over the timed loop and the
    # run queue vs core count. A flagged record means "re-run on a quieter
    # host before comparing", so a dirty number can never masquerade as a
    # regression again.
    host = result["host"]
    steal = host.get("cpu_pct", {}).get("steal", 0.0)
    load1 = (host.get("loadavg") or [0.0])[0]
    ncpu = host.get("ncpu") or os.cpu_count() or 1
    if steal > 1.0 or load1 > ncpu / 8:
        result["contended"] = True
    print(json.dumps(result))
    spark.stop()


def _cpu_counters() -> "list[int] | None":
    """Raw cumulative cpu jiffies from /proc/stat (Linux; None elsewhere):
    user nice system idle iowait irq softirq steal …"""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except Exception:
        return None


def _host_load(cpu0: "list[int] | None") -> dict:
    """Best-effort host-contention snapshot; cpu percentages are deltas
    against ``cpu0`` (captured before the timed loop)."""
    out: dict = {}
    try:
        with open("/proc/loadavg") as f:
            l1, l5, l15 = f.read().split()[:3]
        out["loadavg"] = [float(l1), float(l5), float(l15)]
    except Exception:
        pass
    cpu1 = _cpu_counters()
    if cpu0 and cpu1:
        d = [b - a for a, b in zip(cpu0, cpu1)]
        total = sum(d) or 1
        out["cpu_pct"] = {
            "idle": round(100 * d[3] / total, 1),
            "iowait": round(100 * d[4] / total, 1) if len(d) > 4 else 0.0,
            "steal": round(100 * d[7] / total, 1) if len(d) > 7 else 0.0,
        }
        out["ncpu"] = os.cpu_count()
    return out


if __name__ == "__main__":
    main()
