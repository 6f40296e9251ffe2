"""Soft-run reference replay corpora and print every distinct mismatch.

Usage: python scripts/replay_probe.py <relpath-under-13-TimeSeriesExt> m1 m2 ...
(relpath may use ../11-Functions/... like the test files do).
Prints one line per distinct failing statement — the iteration loop for
bringing a new replay file green without paying Spark startup per probe.
"""
import sys

sys.path.insert(0, "tests")

from tdengine_spark.session import get_spark  # noqa: E402
from reference_replay import TdSqlShim, load_reference_test  # noqa: E402

REF = "/root/reference/test/cases/13-TimeSeriesExt"


def main():
    relpath, methods = sys.argv[1], sys.argv[2:]
    tz, unordered, attrs = 0, False, {}
    while methods and methods[0].startswith("--"):
        if methods[0].startswith("--tz="):
            tz = int(methods[0][5:])
        elif methods[0] == "--unordered":
            unordered = True
        elif methods[0].startswith("--set="):
            k, _, v = methods[0][6:].partition("=")
            attrs[k] = v
        methods = methods[1:]
    spark = get_spark("replay-probe")
    shim = TdSqlShim(spark, tz_shift_hours=tz, soft=True)
    shim.unordered_ok = unordered
    obj = load_reference_test(f"{REF}/{relpath}", shim)
    for k, v in attrs.items():
        setattr(obj, k, v)
    for m in methods:
        try:
            getattr(obj, m)()
        except Exception as exc:  # noqa: BLE001 — keep probing
            print(f"METHOD-ERROR {m}: {exc!r}"[:300])
    print("stats:", shim.stats)
    print("failures:", len(shim.failures))
    seen = set()
    for f in shim.failures:
        sql = f.split("\n")[-1].strip()
        if sql in seen:
            continue
        seen.add(sql)
        print("-", f.replace("\n", " | ")[:240])
    print("distinct:", len(seen))


if __name__ == "__main__":
    main()
