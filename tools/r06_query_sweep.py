"""Round-6 sweep: time EVERY declared query with the noop sink.

Evidence tool for OPTIMIZATION_r06.md's "every operator examined"
checklist (guide §1.4 — noop sink isolates the computation from the
sink; §1.5 — jobs labeled per query). Never used by the driver.

Usage:
    python tools/r06_query_sweep.py [sf_dir] [--only name,name] [--reps N]

Prints one JSON object: {"sf_dir": ..., "times": {name: [sec, ...]},
"errors": {name: msg}} with reps interleaved (all queries' rep r before
rep r+1) so host drift lands across rows evenly.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from plwordnet_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    only = None
    reps = 1
    i = 0
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            sf_dir = args[i]
            i += 1

    spark = get_spark(app_name="r06-query-sweep", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    names = [n for n in qs if only is None or n in only]
    out = {"sf_dir": sf_dir, "reps": reps, "times": {}, "errors": {}}
    for rep in range(reps):
        for name in names:
            if name in out["errors"]:
                continue
            spark.sparkContext.setJobDescription(f"sweep:{name}:rep{rep}")
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                out["times"].setdefault(name, []).append(
                    round(time.time() - t0, 3)
                )
            except Exception as e:  # noqa: BLE001 — sweep must finish
                out["errors"][name] = f"{type(e).__name__}: {e}"[:200]
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
