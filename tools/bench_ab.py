#!/usr/bin/env python
"""Order-controlled A/B micro-benchmark harness for plan variants.

Today's measurement lesson, captured as a tool: back-to-back timings in
a fresh JVM are dominated by JIT warm-up and page-cache state, so
"variant A then variant B" systematically favors B (a round-6 session
measured a 2.1x 'win' that an order-controlled re-run showed to be
noise).  This harness removes both biases:

  * one warm-up execution of EVERY variant before any timed run,
  * timed runs strictly ALTERNATE between variants,
  * best-of-N is reported per variant (min is the right statistic for
    a noisy shared box: contention only ever adds time).

Usage (library):
    from tools.bench_ab import ab
    ab({"old": lambda: old_df(), "new": lambda: new_df()}, n=4)

Each thunk must return a DataFrame; the harness forces it with a
full-result noop write (same convention as bench.py).
"""

from __future__ import annotations

import time
from collections.abc import Callable


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ab(variants: dict[str, Callable], n: int = 4) -> dict[str, float]:
    """Alternating best-of-n wall times per variant; prints a table."""
    for fn in variants.values():  # warm every variant once, untimed
        _force(fn())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(n):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            _force(fn())
            times[name].append(time.perf_counter() - t0)
    best = {k: min(v) for k, v in times.items()}
    width = max(len(k) for k in variants)
    for k, v in times.items():
        runs = " ".join(f"{x:.2f}" for x in v)
        print(f"{k:<{width}}  best {best[k]:.3f}s  [{runs}]")
    return best


if __name__ == "__main__":
    raise SystemExit(
        "bench_ab is a library: import ab() and hand it DataFrame thunks"
    )
