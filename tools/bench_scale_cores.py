"""Core-scaling proof at sf1 (r14 verdict #8): the driver's own scaling
block compares 8 vs 32 cores at sf0.1, where every member is
fixed-overhead-bound (~60-90 ms per action) and ratios sit at ~1 by
construction. At sf1 the heaviest members carry enough compute for the
core count to matter — run THOSE at SPARK_GRAFT_CPUS=32 and 8 (fresh
process per core count: the master is process-level) and record the
ratio table.

A member still ≈1 at sf1 gets a named serial bottleneck in
OPTIMIZATION_r15.md.

Usage: python tools/bench_scale_cores.py [n_members]
Writes BENCH_SF1_CORES.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(HERE, "_scale", "sf1")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(here)r)
import __spark_entry__ as entry_mod
from generic_data_ingestor_framework_spark.session import get_spark
spark = get_spark("scale_cores")
qs = entry_mod.member_queries()
spark.range(1000).count()
out = {}
for name in %(names)r:
    fn = qs[name]
    t0 = time.time(); fn(spark, %(sf1)r).write.format("noop").mode("overwrite").save()
    cold = round(time.time() - t0, 3)
    runs = []
    for _ in range(2):
        t0 = time.time(); fn(spark, %(sf1)r).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    out[name] = {"cold": cold, "steady": min(runs), "runs": runs}
print("CORES_RESULT " + json.dumps(out))
"""


def run_at(cpus: int, names: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_DRIVER_MEM="24g")
    code = _CHILD % {"here": HERE, "names": names, "sf1": SF1}
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CORES_RESULT "):
            return json.loads(line[len("CORES_RESULT "):])
    raise RuntimeError(f"child at cpus={cpus} produced no result:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    with open(os.path.join(HERE, "BENCH_SF1.json")) as fh:
        sf1_prev = json.load(fh)["sf1"]
    names = [k for k, _ in sorted(sf1_prev.items(), key=lambda kv: -kv[1])[:n]]
    r32 = run_at(32, names)
    r8 = run_at(8, names)
    out = {
        "sf_dir": SF1,
        "members": names,
        "cpus32": r32,
        "cpus8": r8,
        "ratio_8_over_32_steady": {
            k: round(r8[k]["steady"] / r32[k]["steady"], 2) for k in names
        },
        "ratio_8_over_32_cold": {
            k: round(r8[k]["cold"] / r32[k]["cold"], 2) for k in names
        },
    }
    with open(os.path.join(HERE, "BENCH_SF1_CORES.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"metric": "sf1_core_scaling",
                      "ratio_steady": out["ratio_8_over_32_steady"]}))


if __name__ == "__main__":
    main()
