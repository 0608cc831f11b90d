"""Merge the round-5 coverage/edge-match sf1 leg into BENCH_sf1.json (v2).

Inputs: the round-4 BENCH_sf1.json (12 spatial+dedup queries), plus two
fresh bench.py subset runs of the coverage/edge-match families at sf0.1
and sf1_synth.  Output: BENCH_sf1.json v2 carrying all queries, their
sf1 walls, and per-query sf0.1->sf1 time ratios for the new families so
SCALE.md's table has a single source.
"""

from __future__ import annotations

import json
import sys


def main(sf01_path: str, sf1_path: str) -> None:
    base = json.load(open("BENCH_sf1.json"))
    sf01 = json.load(open(sf01_path))
    sf1 = json.load(open(sf1_path))

    queries = dict(base["queries"])
    rows = dict(base.get("rows", {}))
    ratios = {}
    for q, t1 in sf1["queries"].items():
        queries[q] = t1
        rows[q] = sf1["rows"][q]
        t01 = sf01["queries"][q]
        ratios[q] = round(t1 / max(t01, 0.01), 2)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 1.0,
        "spatial_features_per_sec": base.get("spatial_features_per_sec"),
        "cpus": base.get("cpus", 32),
        "queries": queries,
        "rows": rows,
        "sf01_to_sf1_time_ratio_round5_families": ratios,
        "sf01_walls_round5_families": sf01["queries"],
        "note": (
            "v2: round-4 12-query spatial+dedup snapshot merged with the "
            "round-5 coverage/edge-match/attr leg (19 queries timed at both "
            "sf0.1 and sf1_synth in one quiet window); raster family is "
            "covered separately by BENCH_RASTER_STRESS.json (posts-scaled)"
        ),
    }
    json.dump(out, open("BENCH_sf1.json", "w"), indent=1)
    print(json.dumps(ratios, indent=1))
    print("total", out["value"], "n_queries", len(queries))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
