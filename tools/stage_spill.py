#!/usr/bin/env python3
"""Per-stage spill/shuffle attribution from a Spark event log.

Usage: python3 tools/stage_spill.py /tmp/eventlog/<app-id> [topN]

Aggregates SparkListenerTaskEnd metrics per stage and joins the stage
name + callsite from SparkListenerStageSubmitted, so a rung-level spill
number (ScaleBench reports only the query total) can be attributed to
the exact stage — the §21.5/§21.8 adjudication loop. Reads the raw
event-log file (uncompressed JSON lines; run with
spark.eventLog.compress=false, the default here).
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    stages = {}  # (stageId, attempt) -> info
    agg = defaultdict(lambda: defaultdict(int))
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                    "name": si.get("Stage Name", ""),
                    "details": (si.get("Details") or "").split("\n")[0],
                    "tasks": si.get("Number of Tasks", 0),
                }
            elif t == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                a = agg[key]
                a["spill_mem"] += m.get("Memory Bytes Spilled", 0)
                a["spill_disk"] += m.get("Disk Bytes Spilled", 0)
                a["run_ms"] += m.get("Executor Run Time", 0)
                a["gc_ms"] += m.get("JVM GC Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                a["shuf_w"] += sw.get("Shuffle Bytes Written", 0)
                a["shuf_w_rec"] += sw.get("Shuffle Records Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                a["shuf_r"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0)
                a["n_tasks"] += 1

    rows = []
    for key, a in agg.items():
        info = stages.get(key, {"name": "?", "details": "", "tasks": 0})
        rows.append((key, info, a))
    rows.sort(key=lambda r: -(r[2]["spill_disk"] + r[2]["spill_mem"]))
    gb = 1e9
    print(f"{'stage':>8} {'spillMemGB':>10} {'spillDskGB':>10} {'shufWGB':>8} "
          f"{'shufRGB':>8} {'recsW(M)':>9} {'runSec':>8} {'gcSec':>7} "
          f"{'tasks':>6}  name / callsite")
    for (sid, att), info, a in rows[:top_n]:
        print(f"{sid:>6}.{att} {a['spill_mem']/gb:>10.2f} "
              f"{a['spill_disk']/gb:>10.2f} {a['shuf_w']/gb:>8.2f} "
              f"{a['shuf_r']/gb:>8.2f} {a['shuf_w_rec']/1e6:>9.1f} "
              f"{a['run_ms']/1e3:>8.1f} {a['gc_ms']/1e3:>7.1f} "
              f"{a['n_tasks']:>6}  {info['name'][:60]} | {info['details'][:70]}")
    tot_spill = sum(a["spill_disk"] for _, _, a in rows)
    tot_gc = sum(a["gc_ms"] for _, _, a in rows) / 1e3
    tot_run = sum(a["run_ms"] for _, _, a in rows) / 1e3
    print(f"\ntotal: diskSpill {tot_spill/gb:.2f} GB, run {tot_run:.0f} s "
          f"(cpu), gc {tot_gc:.0f} s ({100*tot_gc/max(tot_run,1e-9):.1f}%)")


if __name__ == "__main__":
    main()
