#!/usr/bin/env python
"""sf1 linearity probe (VERDICT r5 item 4): run the heavy emitters once
at sf0.1 and once at a synthesized 10x input, and report rows/sec at
both scales. The design claims linear, shuffle-contained emission —
this measures it instead of asserting it.

The 10x input is sf0.1 replicated with shifted ids (no sf1 directory
exists in the read-only testdata): events x10 (event_id/user_id
+ k*100000), documents x10 (doc_id + k*5000). Content is replicated
VERBATIM, which is the adversarial case for the dedup/LM operators —
every k-gram group and n-gram count gets 10x hotter.

Usage: python scripts/sf1_probe.py [out_json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1synth"
QUERIES = [
    "kg_dosage_jira",
    "kg_clinvar_statements",
    # kg_cv_jsonld_variants is NOT here: its fixture is a 50-variant
    # dimension cap (user_id % 50) by construction, so a corpus 10x
    # cannot move it — kg_triples (documents-driven flagship emission)
    # probes that transform family instead
    "kg_triples",
    "dedup_spans",
    "text_lm_filter",
]


def synth():
    import duckdb

    os.makedirs(SF1, exist_ok=True)
    con = duckdb.connect()
    if not os.path.exists(f"{SF1}/events.parquet"):
        con.sql(f"""
COPY (SELECT event_id + k*100000 AS event_id, ts, user_id + k*100000 AS user_id,
             event_type, value, props
      FROM '{SF01}/events.parquet', (SELECT unnest(range(10)) AS k))
TO '{SF1}/events.parquet' (FORMAT parquet)""")
    if not os.path.exists(f"{SF1}/documents.parquet"):
        con.sql(f"""
COPY (SELECT doc_id + k*5000 AS doc_id, text, lang, source, n_chars
      FROM '{SF01}/documents.parquet', (SELECT unnest(range(10)) AS k))
TO '{SF1}/documents.parquet' (FORMAT parquet)""")


def main():
    synth()
    from genegraph_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("sf1_probe", extra_conf={"spark.driver.memory": "24g"})
    qs = E.queries()
    report = {}
    for name in QUERIES:
        rec = {}
        for label, d in (("sf0.1", SF01), ("sf1x10", SF1)):
            df = qs[name](spark, d)
            n = df.count()  # row count alone lets Catalyst prune the
            # emission expressions — time the NOOP WRITE (bench.py's
            # convention), which computes every output column
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            rec[label] = {"rows": n, "sec": round(dt, 2),
                          "rows_per_sec": round(n / dt, 1)}
        r01, r10 = rec["sf0.1"], rec["sf1x10"]
        rec["sec_ratio_10x"] = round(r10["sec"] / r01["sec"], 2)
        rec["throughput_ratio"] = round(
            r10["rows_per_sec"] / r01["rows_per_sec"], 2
        )
        report[name] = rec
        print(name, json.dumps(rec))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
