"""Round-6 measurement sidecar (bench.py is FROZEN — guide §1.4).

Isolates individual declared queries with the noop sink (or the driver's
count() methodology), interleaved best-of-N to ride out the documented
2-3x host noise, and dumps .explain("formatted") for plan evidence.

Usage:
    python bench_extra.py q1 q2 ...            # time queries, best-of-3
    python bench_extra.py --rounds 5 q1 ...    # more repeats
    python bench_extra.py --noop q1 ...        # noop sink instead of count
    python bench_extra.py --explain q1 ...     # dump plans/r06/<q>_<tag>.txt
    python bench_extra.py --tag after --explain q1
    python bench_extra.py --pipeline           # time the headline pipeline only

Timing matches bench.py: t0 before fn(spark, sf_dir) so in-query actions
(guards, sidecar writes) are included, exactly as the driver times them.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    rounds = 3
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i : i + 2]
    noop = "--noop" in args
    explain = "--explain" in args
    pipeline = "--pipeline" in args
    tag = "base"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from otel_arrow_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    if pipeline:
        import bench

        runs = []
        for _ in range(rounds + 1):  # first run is warm-up
            runs.append(bench.run_pipeline_once(f"local[{cpus}]", sf_dir, cpus))
        print(json.dumps({"pipeline_runs_sec": [round(r["sec"], 3) for r in runs],
                          "min": round(min(r["sec"] for r in runs[1:]), 3)}))
        return

    import __spark_entry__ as entrymod

    qdefs = entrymod.queries()
    best: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rnd in range(rounds):
        for name in names:
            fn = qdefs[name]
            spark.sparkContext.setJobDescription(f"{name} [{tag} r{rnd}]")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.monotonic() - t0
            samples[name].append(round(dt, 3))
            if name not in best or dt < best[name]:
                best[name] = dt
            spark.sparkContext.setJobDescription(None)
            if explain and rnd == 0:
                os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
                p = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
                with open(p, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print(json.dumps({"tag": tag, "noop": noop,
                      "best": {k: round(v, 3) for k, v in best.items()},
                      "samples": samples}))


if __name__ == "__main__":
    main()
