"""Shared harness for the spread() A/B tools.

ab_spread.py (spread vs no-spread) and ab_spread_by.py (hash arm vs
round-robin arm) are the same machine with different arms: one Spark
session, JVM warm-up, noop-sink timing, interleaved arms with the
order alternating per pass so warm-session effects don't favor the
second arm, min-of-N per arm, and a finally-restore so an aborted run
can't leave the plans modules patched. The r15 review found the
harness copy-pasted between the two (the derived-module-discovery fix
had to be applied twice) — this module is the ONE copy.
"""

from __future__ import annotations

import sys
import time
from collections.abc import Callable


def discover_spread_modules(real_spread) -> list:
    """Every loaded plans module holding a reference to the real
    spread helper — derived from sys.modules, not hardcoded, so a key
    whose plan lives in a module outside an enumerated list can't
    silently run identical arms and print a credible verdict. Call
    AFTER registry.load_all_plans()."""
    modules = [
        m
        for name, m in list(sys.modules.items())
        if name.startswith("drive_bc_datapipeline_spark.plans.")
        and m is not None
        and getattr(m, "spread", None) is real_spread
    ]
    assert modules, "no plans module imports spread — nothing to A/B"
    return modules


def run_spread_ab(
    keys: list[str],
    sf_dir: str,
    passes: int,
    arms: list[tuple[str, Callable]],
    verdict: Callable[[dict[str, float]], str],
    *,
    app_name: str,
) -> None:
    """Time each key under every arm, interleaved min-of-N, and print
    one line per key with the verdict. ``arms`` is an ordered list of
    (label, spread_replacement); ``verdict`` maps {label: min_sec}
    to the printed decision."""
    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark
    from drive_bc_datapipeline_spark.tables import spread as real_spread

    registry.load_all_plans()
    unknown = [k for k in keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    spark = get_spark(app_name)
    registry.t(spark, sf_dir, "lineitem").count()  # warm JVM
    modules = discover_spread_modules(real_spread)

    def time_once(key: str) -> float:
        t0 = time.time()
        registry.QUERIES[key](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    try:
        for key in keys:
            vals: dict[str, list[float]] = {lbl: [] for lbl, _ in arms}
            for p in range(passes):
                order = arms if p % 2 == 0 else arms[::-1]
                for label, fn in order:
                    for m in modules:
                        m.spread = fn
                    vals[label].append(time_once(key))
            mins = {lbl: min(v) for lbl, v in vals.items()}
            detail = " | ".join(
                f"{lbl}={[round(x, 3) for x in v]} min={mins[lbl]:.3f}"
                for lbl, v in vals.items()
            )
            print(f"{key}: {detail} -> {verdict(mins)}")
    finally:
        # restore the real helper even if a run raises, so an aborted
        # A/B can't leave the plans modules patched to the wrong arm
        # (and stop the session here too — r15 ADVICE: a raise during
        # a timing pass used to leave the JVM running, polluting the
        # box load the very protocol depends on)
        for m in modules:
            m.spread = real_spread
        spark.stop()
