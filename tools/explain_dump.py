"""Dump .explain("formatted") for members into plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/explain_dump.py <outdir> <suffix> <member> [member...]
       python tools/explain_dump.py plans/r14 before ann_ivf_topk ann_pq_topk

The plan is captured against $SPARK_GRAFT_SF_DIR (default sf0.1) without
executing the query (side-effecting lifecycle members DO run their
save/append steps while building the returned frame — that is inherent
to capturing their final plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from generic_data_ingestor_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain_dump")
    qs = entry_mod.member_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
