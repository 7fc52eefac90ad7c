#!/usr/bin/env python3
"""Fold a scale-soak bench_out.json into a top-level pass/fail artifact.

r16 verdict item 7: the -1 sentinel inside a bench JSON hid the same two
sf10 failures for two rounds running. This emits SOAK_r{N}.json where
failures are ENUMERATED with their error strings (Bench's `failures`
map), so a soak's pass/fail is a first-class record like
CORRECTNESS_r{N}.json is for sf0.1.

Usage: tools/soak_artifact.py <bench_out.json> <out.json> [round_label]
"""
import json
import sys


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else ""
    with open(src) as f:
        d = json.load(f)
    queries = d.get("queries", {})
    adj = d.get("queries_adj", {})
    failures = d.get("failures", {})
    entries = {}
    for name, secs in queries.items():
        ok = secs is not None and secs >= 0
        e = {"status": "pass" if ok else "FAIL", "sec": secs,
             "sec_adj": adj.get(name)}
        if not ok:
            e["err"] = failures.get(name, "(no error string recorded)")
        entries[name] = e
    failed = sorted(n for n, e in entries.items() if e["status"] == "FAIL")
    out = {
        "round": label,
        "sf_dir": d.get("sf"),
        "n_queries": len(entries),
        "n_failed": len(failed),
        "failed": failed,
        "total_raw_sec": d.get("value"),
        "total_adj_sec": d.get("adj_total"),
        "control_ratios": d.get("control_ratios"),
        "codegen_fallbacks": d.get("codegen_fallbacks"),
        "louvain_arm": d.get("louvain_arm"),
        "spill_disk_total": d.get("spill_disk_total"),
        "shuffle_write_total": d.get("shuffle_write_total"),
        "layouts": d.get("layouts", {}),
        "stream": d.get("stream", {}),
        "entries": entries,
    }
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{dst}: {len(entries)} entries, {len(failed)} failed"
          + (f" -> {failed}" if failed else ""))


if __name__ == "__main__":
    main()
