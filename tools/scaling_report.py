#!/usr/bin/env python3
"""Merge filtered Bench runs over an ascending scale-factor ladder into
BENCH_SCALING.json: per-query times at every SF, the end-to-end time
ratio, and the expected scaling class.

Usage: scaling_report.py <step_factor> <bench_sf_a.json> <bench_sf_b.json> [more...]

Runs are ordered smallest SF first; the data factor between consecutive
runs is <step_factor> (so N runs span step^(N-1)× data end to end).

Queries are classed by their INPUT's scaling behavior:
  corpus  — input grows with the dataset; on a fixed-size machine the
            end-to-end time ratio should stay well under the end-to-end
            data factor (sublinear = parallelism headroom + fixed
            overheads still dominating), and at worst ~linear.
  bounded — input is a fixed-size slice or session fixture regardless
            of SF; the ratio should stay ~1 (flat cost IS the scaling
            claim: bounded operators must not secretly scan the corpus).
"""
import json, re, sys

BOUNDED = {"q62_duplicate_clusters", "q74_incremental_dedup",
           "q99_pagerank", "q127_prefix_filter_jaccard",
           "q301_modularity", "q322_dup_spans",
           "x50_inc_spans_indexed_1x", "x51_inc_spans_indexed_2x",
           "x53_inc_spans_bloom_2x",
           "x68_span_fold_1x", "x69_span_fold_2x",
           "x6a_span_compact_1x", "x6b_span_compact_2x",
           "x56_facade_query_indexed", "x62_facade_query_ivfpq",
           "x90_facade_churn_maintain"}


def load(path):
    return json.loads(re.search(r'\{.*\}', open(path).read()).group(0))


def main(step, *paths, out="BENCH_SCALING.json"):
    runs = [load(p) for p in paths]
    step = float(step)
    end_factor = step ** (len(runs) - 1)
    rows = {}
    for name in sorted(runs[0]["queries"]):
        times = [r["queries"].get(name) for r in runs]
        if any(t is None or t <= 0 for t in times):
            continue
        cls = "bounded" if name in BOUNDED else "corpus"
        ratio = round(times[-1] / times[0], 3)
        rows[name] = {
            "sec": [round(t, 3) for t in times],
            "ratio": ratio, "class": cls,
            "ok": bool(ratio <= (end_factor * 1.2 if cls == "corpus" else 3.0)),
        }
    corpus = [r["ratio"] for r in rows.values() if r["class"] == "corpus"]
    bounded = [r["ratio"] for r in rows.values() if r["class"] == "bounded"]
    report = {
        "metric": "scaling_curve",
        "data_factor_end_to_end": end_factor,
        "sf_dirs": [r.get("sf") for r in runs],
        "queries": rows,
        "corpus_ratio_max": max(corpus) if corpus else None,
        "corpus_ratio_median": sorted(corpus)[len(corpus) // 2] if corpus else None,
        "bounded_ratio_max": max(bounded) if bounded else None,
        "n_violations": sum(1 for r in rows.values() if not r["ok"]),
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items() if k != "queries"},
                     indent=1))
    for name, r in rows.items():
        flag = "" if r["ok"] else "  <-- VIOLATION"
        secs = " -> ".join(f"{t:7.3f}" for t in r["sec"])
        print(f"{name:35s} {r['class']:7s} {secs}  x{r['ratio']:.2f}{flag}")


if __name__ == "__main__":
    main(*sys.argv[1:])
