"""No-Spark scaling control: measures the MACHINE's parallel-throughput
ceiling for the JSON-LD document workload using raw multiprocessing.

Purpose (see BENCH/BASELINE.md): separates "does the Spark pipeline
scale?" from "does this VM scale?".  The pipeline's measured throughput
at local[4N] should be compared against THIS ceiling, not against 4x the
local[N] number, because the sandbox VM's per-core throughput collapses
under full load (memory-bandwidth saturation of the string/dict churn
that dominates JSON-LD document processing).

Usage: python scripts/scaling_control.py [docs_per_proc]
Prints one JSON line with docs/s at 1/2/8/32 processes.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(args):
    n_docs, seed = args
    from jsonld_ex_spark.core.context import Options
    from jsonld_ex_spark.operators.kg_pipeline import (
        _pipeline_context,
        build_conversation_doc,
        doc_to_triple_rows,
    )

    active = _pipeline_context()
    options = Options()
    turns = [
        {
            "turn_idx": i,
            "role": "user",
            "text": f"The N shipment of 36 units references ENT_0170 and ENT_0034 with status O. {i}",
            "tool": None,
            "ts": "2024-01-01T00:00:00Z",
            "mentions": ["ENT_0170", "ENT_0034"],
        }
        for i in range(4)
    ]
    n = 0
    for d in range(n_docs):
        cid = f"conv-{seed}-{d}"
        doc = build_conversation_doc(cid, turns)
        n += len(doc_to_triple_rows(cid, doc, active, options))
    return n


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out = {}
    for procs in (1, 2, 8, 32):
        jobs = [(docs, p) for p in range(procs)]
        with mp.get_context("fork").Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(work, jobs)
            dt = time.perf_counter() - t0
        total = docs * procs
        out[f"procs_{procs}"] = {
            "docs_per_sec": round(total / dt, 1),
            "docs_per_sec_per_proc": round(total / dt / procs, 1),
        }
    base = out["procs_1"]["docs_per_sec"]
    out["parallel_efficiency_8"] = round(out["procs_8"]["docs_per_sec"] / (8 * base), 3)
    out["parallel_efficiency_32"] = round(out["procs_32"]["docs_per_sec"] / (32 * base), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
