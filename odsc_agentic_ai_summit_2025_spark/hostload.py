"""Host-load sampling for benchmark artifacts.

Every perf-noise adjudication through round 6 had to reconstruct the
host's state (hypervisor steal bursts, co-resident CPU load) AFTER
the fact from per-pass spreads; this records the evidence inline:
sample ``/proc/loadavg`` and the aggregate ``/proc/stat`` cpu line
before/after each timed pass, and store the deltas next to the
timing. A pass with ``steal_pct`` in the double digits (or ``la1``
far above the run's own norm) is a noisy-window measurement and the
repo's noise protocol (SCALING.md) can cite the number instead of
inferring it.

Jiffy deltas are summed across all CPUs (USER_HZ ticks); only the
ratios are meaningful, so no HZ conversion is done.
"""

from __future__ import annotations


def sample() -> dict:
    """One instant's host-load reading (cheap: two /proc reads)."""
    out: dict = {"la1": None, "jt": None, "js": None}
    try:
        with open("/proc/loadavg") as f:
            out["la1"] = float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        pass
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        out["jt"] = sum(vals)
        # cpu line: user nice system idle iowait irq softirq steal …
        out["js"] = vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        pass
    return out


def jvm_gc_ms(spark) -> int | None:
    """Cumulative JVM garbage-collection milliseconds (all collectors,
    driver JVM == the whole cluster in local mode). Sampled
    before/after a timed pass, the delta splits "stage-internal GC"
    from actual shuffle/compute cost — the r7 verdict's open question
    on minhash_candidates' quiet-window spread."""
    try:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )
    except Exception:
        return None


def delta(before: dict, after: dict) -> dict:
    """Per-pass load record: 1-min loadavg at pass start plus the
    pass's total/steal jiffy deltas and the steal percentage."""
    rec: dict = {"la1": before.get("la1")}
    jt0, jt1 = before.get("jt"), after.get("jt")
    js0, js1 = before.get("js"), after.get("js")
    if None not in (jt0, jt1, js0, js1):
        dt, ds = jt1 - jt0, js1 - js0
        rec["dtotal"] = dt
        rec["dsteal"] = ds
        rec["steal_pct"] = round(100.0 * ds / dt, 2) if dt > 0 else 0.0
    else:
        rec["dtotal"] = rec["dsteal"] = rec["steal_pct"] = None
    return rec
