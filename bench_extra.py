"""Extra benchmarks (optimization guide §1.1/§1.4) — NOT part of the driver
contract; ``bench.py`` stays the frozen measurement harness.

Per-query isolation with the noop sink at an arbitrary scale factor:

    python bench_extra.py [--sf DIR] [--reps N] [--plans DIR] [--cold] [query ...]

- Times each ``__spark_entry__.queries()`` entry with
  ``df.write.format("noop").mode("overwrite").save()`` (computes every
  column of every row, discards the result — §1.4) under a job description
  so the run is attributable in the UI/event logs.
- ``--plans DIR`` additionally writes ``DIR/<query>.txt`` with
  ``explain('formatted')`` for every selected query.
- ``--cold`` clears the module-level extraction cache between queries so
  each query is charged its own extraction cost (default: warm, like the
  frozen bench, where the first extraction-dependent query pays it).
- Session config matches bench.py exactly (same master/shuffle partitions/
  Arrow settings) so numbers are comparable with the driver's bench.

Prints one JSON line: {"sf": ..., "reps": N, "queries": {name: best_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    reps = 2
    plans_dir = None
    cold = False
    names: list[str] = []
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif a == "--cold":
            cold = True
            i += 1
        else:
            names.append(a)
            i += 1

    from bench import make_session

    import __spark_entry__ as entrymod

    spark = make_session(CPUS)
    sc = spark.sparkContext
    qs = entrymod.queries()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name, fn in qs.items():
        if plans_dir:
            try:
                df = fn(spark, sf_dir)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
            except Exception as e:  # plan capture must never kill the bench
                print(f"# plan capture failed for {name}: {e}", file=sys.stderr)
        best = None
        for _ in range(reps):
            if cold:
                entrymod._extract_cache.clear()
            sc.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                fn(spark, sf_dir).count()
            dt = time.time() - t0
            sc.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf": sf_dir, "reps": reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
