"""Capture .explain('formatted') for the headline queries -> BENCH/PLANS.md.

The plan review is part of the performance loop: confirm filters/column
pruning reach the parquet scan, joins broadcast where a side is small,
Python appears only as ArrowEvalPython/MapInPandas nodes, and relational
glue stays inside WholeStageCodegen.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "qf_pipeline_full", "qf_keep_cheap", "ngram_counts", "dedup_exact",
    "dedup_minhash", "ann_cosine_topk", "rel_top_nations", "rel_sessionize",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pycorrector_spark.session import get_spark

    spark = get_spark("plans", master="local[4]")
    qs = E.queries()
    out = ["# Physical plans (explain formatted) — sf0.01\n"]
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "PLANS.md")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
