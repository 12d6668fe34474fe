"""One-off round-8 probe artifact rebuild.

The round-8 `scale_probe.py 10` run completed every measurement through
the ×100 plain pass and then DEADLOCKED inside the very last section
(the ×100-dialed kNN build: a JVM task blocked reading an Arrow batch
from a python worker that was itself waiting for input — zero CPU both
sides; the same leg runs fine in a fresh process, so the trigger is
~6000 accumulated stages of session state). The timings were all
printed to the run log before the wedge, so this script rebuilds
SCALE_PROBE.json from:

1. the run log (`/tmp/probe_r8d.log`) — the 70-query ×1/×10 best-of-2
   passes, the full decomposed dialed section (build + 5 consumer legs
   at ×1 AND ×10), emb_knn_graph_dialed, emb_sim_histogram_dialed, and
   the ×100 best-of-2 pass for the 6 X100_QUERIES;
2. a fresh-process re-measurement (`/tmp/probe_fill.json`) of the ONLY
   legs the wedge swallowed: the two ×100-dialed operator pairs
   (emb_knn_graph_dialed, semantic_dedup_dialed at ×1 and ×100) and the
   events_cusum noop compute legs.

Row construction below replicates tools/scale_probe.py's logic and note
strings verbatim so the artifact format is identical to a single-process
run. Provenance is recorded in the artifact itself.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import (  # noqa: E402
    BASE,
    DETAIL_OUTPUT,
    FIXED_PARAM_SUPERLINEAR,
    PROBE_QUERIES,
    X100_QUERIES,
)

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_r8d.log"
FILL = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_fill.json"
N = 10
BIG = 100


def main() -> None:
    plain = defaultdict(list)   # name -> [warmup, x1, x1, x10, x10, (x100, x100)]
    dialed = defaultdict(list)  # (name, factor) -> [t, ...] in print order
    pat_plain = re.compile(r"^#   (\S+): ([0-9.]+)s$")
    pat_dialed = re.compile(r"^#   (\S+) x(\d+): ([0-9.]+)s$")
    for line in open(LOG):
        line = line.strip()
        m = pat_dialed.match(line)
        if m:
            dialed[(m.group(1), int(m.group(2)))].append(float(m.group(3)))
            continue
        m = pat_plain.match(line)
        if m and m.group(1) in PROBE_QUERIES:
            plain[m.group(1)].append(float(m.group(2)))

    fill = json.load(open(FILL))

    results: dict = {"n": N, "base": BASE, "queries": {}}
    t1, tn, tbig = {}, {}, {}
    for name in PROBE_QUERIES:
        occ = plain[name]
        expected = 7 if name in X100_QUERIES else 5
        assert len(occ) == expected, (name, occ)
        t1[name] = round(min(occ[1:3]), 2)
        tn[name] = round(min(occ[3:5]), 2)
        if name in X100_QUERIES:
            tbig[name] = round(min(occ[5:7]), 2)

    for name in PROBE_QUERIES:
        ratio = round(tn[name] / max(t1[name], 0.01), 2)
        row = {
            "t_x1_sec": t1[name],
            f"t_x{N}_sec": tn[name],
            "ratio": ratio,
        }
        if name in FIXED_PARAM_SUPERLINEAR:
            row["fixed_param_note"] = FIXED_PARAM_SUPERLINEAR[name]
        elif name in DETAIL_OUTPUT:
            c1 = fill["cusum_noop_x1"]
            cn = fill["cusum_noop_x10"]
            rc = round(cn / max(c1, 0.01), 2)
            row["t_x1_compute_sec"] = c1
            row[f"t_x{N}_compute_sec"] = cn
            row["ratio_compute"] = rc
            row["linear_or_better"] = rc <= N * 1.2
            row["detail_output_note"] = (
                "collect ratio includes serial driver materialization of "
                "the per-event detail output (local-mode measurement "
                "artifact); ratio_compute is the distributed-sink leg"
            )
        else:
            row["linear_or_better"] = ratio <= N * 1.2
        results["queries"][name] = row

    def dialed_pair(name):
        d1 = dialed[(name, 1)][0]
        dn = dialed[(name, N)][0]
        return d1, dn

    d1, dn = dialed_pair("emb_knn_graph_dialed")
    results["queries"]["emb_knn_graph_dialed"] = {
        "t_x1_sec": d1,
        f"t_x{N}_sec": dn,
        "ratio": round(dn / max(d1, 0.01), 2),
        "linear_or_better": dn / max(d1, 0.01) <= N * 1.2,
        "note": (
            "band_bits raised 4 -> 4+log2(N) at xN (occupancy-constant "
            "configuration): the production dial the fixed-parameter "
            "emb_knn_graph row documents"
        ),
    }

    b1, bn = dialed_pair("knn_graph_build_dialed")
    results["queries"]["knn_graph_build_dialed"] = {
        "t_x1_sec": b1,
        f"t_x{N}_sec": bn,
        "ratio": round(bn / max(b1, 0.01), 2),
        "linear_or_better": bn / max(b1, 0.01) <= N * 1.2,
        "note": (
            "the SHARED banded kNN graph build at occupancy-constant "
            "band bits (4 -> 4+log2(N)), materialized via checkpoint — "
            "the build leg every *_dialed consumer row below excludes"
        ),
    }
    for cname in (
        "graph_pagerank_dialed", "graph_triangles_dialed",
        "graph_communities_dialed", "emb_hubness_dialed",
        "graph_assortativity_dialed",
    ):
        c1, cn = dialed_pair(cname)
        results["queries"][cname] = {
            "t_x1_sec": c1,
            f"t_x{N}_sec": cn,
            "ratio": round(cn / max(c1, 0.01), 2),
            "linear_or_better": cn / max(c1, 0.01) <= N * 1.2,
            "note": (
                "consumer leg ONLY, on the materialized occupancy-"
                "constant graph (build timed separately as "
                "knn_graph_build_dialed) — demonstrates the consumer "
                "is linear in edges"
            ),
        }

    h1, hn = dialed_pair("emb_sim_histogram_dialed")
    results["queries"]["emb_sim_histogram_dialed"] = {
        "t_x1_sec": h1,
        f"t_x{N}_sec": hn,
        "ratio": round(hn / max(h1, 0.01), 2),
        "linear_or_better": hn / max(h1, 0.01) <= N * 1.2,
        "note": (
            "band bits raised 4 -> 4+log2(N) at xN (occupancy-"
            "constant): the production dial the fixed-parameter "
            "emb_sim_histogram row documents (build-inclusive)"
        ),
    }

    for name in X100_QUERIES:
        r = results["queries"][name]
        ratio_big = round(tbig[name] / max(t1[name], 0.01), 2)
        r[f"t_x{BIG}_sec"] = tbig[name]
        r[f"ratio_x{BIG}"] = ratio_big
        r[f"linear_or_better_x{BIG}"] = ratio_big <= BIG * 1.2
    results["x_big"] = BIG

    for dname, k1, kb in (
        ("emb_knn_graph_dialed", "knn_dialed_x1", "knn_dialed_x100"),
        ("semantic_dedup_dialed", "semdedup_dialed_x1", "semdedup_dialed_x100"),
    ):
        dd1, ddb = fill[k1], fill[kb]
        row = results["queries"].setdefault(dname, {"t_x1_sec": dd1})
        row[f"t_x{BIG}_dialed_sec"] = ddb
        row["t_x1_dialed_sec"] = dd1
        row[f"ratio_x{BIG}"] = round(ddb / max(dd1, 0.01), 2)
        row[f"linear_or_better_x{BIG}"] = ddb / max(dd1, 0.01) <= BIG * 1.2
        row["note_x100"] = (
            "parameter dialed with N (band bits +log2(N) / "
            "n_centroids x N): the production configuration"
        )

    results["provenance_r8"] = (
        "rebuilt from the complete single-process run log (all x1/x10 "
        "passes, decomposed dialed section, x100 pass) after the run "
        "deadlocked in its FINAL leg (x100-dialed kNN build; "
        "JVM<->python-worker read-read deadlock in an aged session); "
        "the two x100-dialed pairs and the cusum noop legs were "
        "re-measured in a fresh process (best-of-2, same code paths). "
        "See tools/probe_rebuild_r8.py and NOTES_r8.md."
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.json",
    )
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    nl = sum(
        1 for v in results["queries"].values()
        if v.get("linear_or_better") is True
    )
    print(f"rows={len(results['queries'])} linear_or_better={nl}")


if __name__ == "__main__":
    main()
