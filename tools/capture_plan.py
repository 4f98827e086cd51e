#!/usr/bin/env python
"""Capture .explain('formatted') for named keys into plans/<tag>/.

Usage: python tools/capture_plan.py <tag> <suffix> key [key ...]
e.g.   python tools/capture_plan.py r11 before map_cogroup_pandas

Writes plans/<tag>/<key>_<suffix>.txt (the optimization-round evidence
format: the judge checks plan claims against these files).
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.environ["TZ"] = "UTC"
    import time as _t

    _t.tzset()
    tag, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from basis_spark.session import get_spark

    spark = get_spark("capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = mod.queries()
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for k in keys:
        df = queries[k](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {k} — explain('formatted') at {sf} ({suffix})\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
