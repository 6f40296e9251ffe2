#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries to plans/r14/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [name1,name2,...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import tdengine_spark.queries_extra  # noqa: F401
    import tdengine_spark.queries_pipeline  # noqa: F401
    from bench import HEADLINE
    from tdengine_spark.queries import REGISTRY
    from tdengine_spark.session import get_spark

    spark = get_spark("plan-dump")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.environ.get("PLANS_DIR", "/root/repo/plans/r15")
    os.makedirs(outdir, exist_ok=True)
    names = only or HEADLINE
    for name in names:
        if name not in REGISTRY:
            continue
        try:
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")


if __name__ == "__main__":
    main()
