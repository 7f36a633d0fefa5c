#!/usr/bin/env python3
"""Reproducible 3x scale probe (regenerates BENCH_scale.md).

Round 5's verdict asked for per-query scaling exponents beyond sf0.1;
round 6 ran the probe from an ad-hoc script. This is that script,
committed, so the table can be refreshed whenever the query surface or
the plans change.

Method (matches the BENCH_scale.md notes):
  - every FACT table (customer, orders, lineitem, events, documents,
    embeddings) is replicated 3x with key offsets (replica r adds
    r*10_000_000 to every id-like column); DIM tables (region, nation,
    supplier, part) stay single-copy so FK joins keep 1:1 fan-out;
  - replicated documents get a replica-unique token spliced in every 3
    words, so the same document across replicas is NOT a near-dup of
    itself (measured word-3-gram Jaccard ~0.14, below every gate) —
    the corpus grows the dedup work linearly instead of quadratically
    by construction;
  - replicated embeddings get a deterministic sign-flip on every third
    coordinate (phase r), pushing cross-replica cosine far below the
    similarity thresholds for the same reason;
  - exponent e = ln(t_3x / t_1x) / ln 3 per query, from two Bench runs
    (each already min-of-2 with a warm-up pass).

Usage:
  python3 tools/scaleprobe.py gen [outDir] [replicas]  # default 3 replicas
  python3 tools/scaleprobe.py report 1x.json 3x.json [10x.json] > BENCH_scale.md
The optional third JSON (a bench run over a gen'd 10-replica dir,
usually restricted via SPARK_GRAFT_ONLY to the >=0.6-exponent family)
adds a second rung: e10 = ln(t_10x/t_1x)/ln 10 separates n log n
(e10 ~= e3 + small drift) from true polynomial growth (e10 ~ e3).
The two bench JSONs come from:
  SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT=<out.json> sbt "runMain graft.Bench"
"""
import json
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000
DIMS = ["region", "nation", "supplier", "part"]
# fact table -> id-like columns to offset per replica
FACTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],  # l_partkey/l_suppkey point at single-copy dims
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def perturb_text(text: str, r: int) -> str:
    """Splice a replica-unique token after every 3rd word — kills
    cross-replica near-dup similarity while keeping length ~linear."""
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if (i + 1) % 3 == 0:
            out.append(f"r{r}x")
    return " ".join(out)


def perturb_vec(vec, r: int):
    """Flip the sign of every 3rd coordinate (phase r): cross-replica
    cosine drops to ~1/3 of the original self-similarity."""
    return [(-v if (i + r) % 3 == 0 else v) for i, v in enumerate(vec)]


def gen(out_dir: str, replicas: int = 3) -> None:
    REPLICAS = replicas
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out_dir}/{t}.parquet")
        print(f"[gen] {t}: dim, single copy")
    for t, idcols in FACTS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for r in range(REPLICAS):
            # perturbed text computed ONCE per replica — both the text
            # column and its n_chars derive from the same list
            ptxt = ([perturb_text(v, r)
                     for v in base.column("text").to_pylist()]
                    if t == "documents" and r > 0 else None)
            cols = {}
            for name in base.column_names:
                col = base.column(name)
                if r == 0:
                    cols[name] = col
                elif name in idcols:
                    cols[name] = pa.array(
                        [v + r * OFFSET for v in col.to_pylist()],
                        type=col.type)
                elif t == "documents" and name == "text":
                    cols[name] = pa.array(ptxt, type=col.type)
                elif t == "documents" and name == "n_chars":
                    cols[name] = pa.array(
                        [len(v) for v in ptxt], type=col.type)
                elif t == "embeddings" and name == "embedding":
                    cols[name] = pa.array(
                        [perturb_vec(v, r) for v in col.to_pylist()],
                        type=col.type)
                else:
                    cols[name] = col
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts), f"{out_dir}/{t}.parquet")
        print(f"[gen] {t}: {base.num_rows} -> {base.num_rows * REPLICAS}")


def report(p1: str, p3: str, p10: str = None) -> None:
    with open(p1) as f:
        b1 = json.load(f)
    with open(p3) as f:
        b3 = json.load(f)
    q1, q3 = b1["queries"], b3["queries"]
    q10 = {}
    if p10:
        with open(p10) as f:
            q10 = json.load(f)["queries"]
    names = sorted(set(q1) & set(q3))
    print("# BENCH_scale — scaling exponents"
          + (" (3x + 10x rungs)" if q10 else " (3x probe)"))
    print()
    print("Generated by tools/scaleprobe.py (see its module doc for the")
    print("replication recipe). Exponent e = ln(t_3x/t_1x)/ln 3: e~1")
    print("linear, e<0.5 mostly fixed overhead at this size, e>1.3 flagged.")
    print()
    if q10:
        print("| query | sf0.1 s | 3x s | e3 | 10x s | e10 |")
        print("|---|---|---|---|---|---|")
    else:
        print("| query | sf0.1 s | 3x s | exponent |")
        print("|---|---|---|---|")
    flagged, failed = set(), []
    for n in names:
        a, b = q1[n], q3[n]
        if a <= 0 or b <= 0:
            print(f"| {n} | {a:.2f} | {b:.2f} | FAILED |")
            failed.append(n)
            continue
        e = math.log(b / a) / math.log(3)
        if q10:
            c = q10.get(n)
            if c is not None and c > 0:
                e10 = math.log(c / a) / math.log(10)
                print(f"| {n} | {a:.2f} | {b:.2f} | {e:.2f} "
                      f"| {c:.2f} | {e10:.2f} |")
                if e10 > 1.3 and c > 1.0:
                    flagged.add(n)
            else:
                print(f"| {n} | {a:.2f} | {b:.2f} | {e:.2f} | — | — |")
        else:
            print(f"| {n} | {a:.2f} | {b:.2f} | {e:.2f} |")
        if e > 1.3 and b > 1.0:
            flagged.add(n)
    print()
    print(f"Flagged super-linear (e>1.3 at a rung with time >1s): "
          f"{len(flagged)}"
          + (f" — {', '.join(sorted(flagged))}" if flagged else ""))
    if failed:
        print(f"FAILED in at least one run: {len(failed)} — "
              + ", ".join(failed))
    # totals cover exactly the table's rows (the intersection, failures
    # excluded) so the summary can never disagree with the rows shown
    ok = [n for n in names if q1[n] > 0 and q3[n] > 0]
    t1 = sum(q1[n] for n in ok)
    t3 = sum(q3[n] for n in ok)
    print()
    if t1 > 0 and t3 > 0:
        print(f"Totals: {t1:.1f} s ({len(ok)} queries, sf0.1) -> "
              f"{t3:.1f} s (3x rows), overall exponent "
              f"{math.log(t3 / t1) / math.log(3):.2f}.")
    else:
        print("Totals unavailable: no query succeeded in both runs.")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if cmd == "gen":
        gen(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaledata/sf0.3",
            int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "report":
        report(sys.argv[2], sys.argv[3],
               sys.argv[4] if len(sys.argv) > 4 else None)
    else:
        sys.exit(f"unknown command {cmd}")
