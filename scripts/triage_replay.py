"""Triage a reference test file through the replay shim in soft mode:
run every method, collect check failures instead of stopping, print a
summary. Usage:

    python scripts/triage_replay.py <ref-test-file.py> [method ...] \
        [--tz 0|8] [--max N]
"""

import sys

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from reference_replay import TdSqlShim, load_reference_test  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tz = 8
    max_show = 40
    session_tz = None
    for a in sys.argv[1:]:
        if a.startswith("--tz"):
            tz = int(a.split("=")[1])
        if a.startswith("--max"):
            max_show = int(a.split("=")[1])
        if a.startswith("--stz"):
            session_tz = a.split("=")[1]
    path, methods = args[0], args[1:]

    from tdengine_spark.session import get_spark

    spark = get_spark()
    shim = TdSqlShim(spark, tz_shift_hours=tz, soft=True, session_tz=session_tz)
    try:
        obj = load_reference_test(path, shim)
        if not methods:
            methods = [
                m for m in dir(obj)
                if m.startswith(("test_", "do_", "run_")) and callable(getattr(obj, m))
            ]
        for m in methods:
            print(f"== {m}")
            try:
                getattr(obj, m)()
            except Exception as e:  # noqa: BLE001
                print(f"ABORT {m}: {type(e).__name__}: {str(e)[:500]}")
                print(f"  LAST_SQL: {getattr(shim, 'last_sql', '')[:300]}")
    finally:
        print("stats:", shim.stats)
        print(f"failures: {len(shim.failures)}")
        for f in shim.failures[:max_show]:
            print("  FAIL:", f.replace("\n", " | ")[:300])
        shim.close()


if __name__ == "__main__":
    main()
