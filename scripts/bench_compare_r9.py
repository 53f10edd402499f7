"""Compare the round-9 quiesced re-baseline (BENCH_RUNS.json, 5 runs)
to the r7/r8 per-query minima for the VERDICT-flagged movers and the
geomean across shared queries. Pure-python report tool."""

from __future__ import annotations

import json
import math
import sys

MOVERS = (
    "emb_kmeans_train",
    "emb_kmeans_step",
    "emb_kcenter_init",
    "profile_columns",
    "market_basket_pairs",
    "text_tfidf_topk",
)


def main() -> None:
    runs = json.load(open("BENCH_RUNS.json"))
    cur = dict(runs["queries"])  # per-query minima
    r7 = json.load(open("BENCH_r07.json")).get("queries", {})
    r8 = json.load(open("BENCH_r08.json")).get("queries", {})
    rows = []
    for q in MOVERS:
        if q in cur:
            rows.append(
                (q, r7.get(q), r8.get(q), cur[q],
                 round(cur[q] / r7[q], 2) if r7.get(q) else None)
            )
    shared7 = [q for q in cur if q in r7]
    geo7 = math.exp(
        sum(math.log(cur[q] / r7[q]) for q in shared7) / len(shared7)
    )
    shared8 = [q for q in cur if q in r8]
    geo8 = math.exp(
        sum(math.log(cur[q] / r8[q]) for q in shared8) / len(shared8)
    )
    print(json.dumps({
        "movers": [
            {"query": q, "r7_min": a, "r8_min": b, "r9_min": c, "r9_vs_r7": d}
            for q, a, b, c, d in rows
        ],
        "geomean_vs_r7": round(geo7, 3),
        "geomean_vs_r8": round(geo8, 3),
        "n_shared_r7": len(shared7),
        "n_shared_r8": len(shared8),
    }, indent=1))


if __name__ == "__main__":
    main()
