"""Per-query micro-benchmarks for optimization work (guide §1.4): times any
subset of the declared bench queries with the SAME methodology as bench.py
(steal-gated best-of-N, minimum as the estimator) but isolated through the
noop sink so the computation is timed, not the sink or a count's pruning.

bench.py is FROZEN for driver measurement — this file is the sandbox for
before/after numbers cited in OPTIMIZATION_r*.md.

Usage:
    python bench_extra.py q_ann_ivf q_pdf_extract        # named queries
    python bench_extra.py --sink count q_ann_ivf         # bench.py's sink
    N=5 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("N", "3"))
STEAL_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "0.05"))


def _cpu_sample() -> list[int]:
    return [int(x) for x in open("/proc/stat").readline().split()[1:]]


def _steal_frac(a: list[int], b: list[int]) -> float:
    d = [y - x for x, y in zip(a, b)]
    total = max(sum(d[:8]), 1)
    busy = max(total - d[3] - d[4], 1)
    return d[7] / busy


def _burn(stop_at: float) -> None:
    x = 1.0
    while time.time() < stop_at:
        x = x * 1.0000001 % 7


def _steal_probe(burn_sec: float = 1.0) -> float:
    import multiprocessing as mp

    procs = min(os.cpu_count() or 4, 16)
    stop_at = time.time() + burn_sec
    ctx = mp.get_context("fork")
    s0 = _cpu_sample()
    ps = [ctx.Process(target=_burn, args=(stop_at,), daemon=True)
          for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return _steal_frac(s0, _cpu_sample())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sink = "noop"
    if "--sink" in sys.argv:
        sink = sys.argv[sys.argv.index("--sink") + 1]
        args = [a for a in args if a != sink]

    from crawl4ai_custom_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in args:
        fn = q[name]

        def run(n=name, f=fn):
            df = f(spark, SF_DIR)
            if sink == "count":
                return df.count()
            df.write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"bench_extra warmup: {name}")
        run()  # warmup (workers, broadcast caches)
        times, steals = [], []
        done = clean = 0
        while done < REPEATS or (clean == 0 and done < REPEATS + 4):
            t_gate = time.time()
            while (_steal_probe() > STEAL_MAX
                   and time.time() - t_gate < 60):
                time.sleep(5)
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            s0 = _cpu_sample()
            t0 = time.time()
            run()
            dt = time.time() - t0
            st = _steal_frac(s0, _cpu_sample())
            times.append(round(dt, 3))
            steals.append(round(st, 4))
            done += 1
            if st <= STEAL_MAX:
                clean += 1
        out[name] = {"best": min(times), "times": times, "steals": steals}
        print(f"{name}: best={min(times):.3f}s times={times} steals={steals}",
              flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "sink": sink, "results": out}))


if __name__ == "__main__":
    main()
