"""Physical-plan measurement utilities shared by the scale audits
(scripts/broadcast_audit.py) and their CI guards (tests/test_plans.py).

The central measurement: run a query with adaptive execution OFF (so
the compile-time plan — the one that ships to a cluster — is what's
measured) and read the ``numOutputRows`` metric of every
BroadcastExchange. Pairing those counts across scale factors classifies
each broadcast frame's GROWTH: ~1x across a decade = bounded by
construction (aggregate profiles, fixed dims, capped top-K — safe at
any scale); ~SF-ratio = linear in the corpus (OOMs executors at
cluster scale while looking broadcast-optimal at test SF).
"""

from __future__ import annotations

from collections.abc import Callable


def node_metric(node, key: str):
    """Read one named SQL metric off a physical-plan JVM node."""
    m = node.metrics()
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == key:
            return kv._2().value()
    return None


def walk_plan(node, visit: Callable) -> None:
    """Pre-order walk over a JVM physical-plan tree."""
    visit(node)
    ch = node.children()
    for i in range(ch.size()):
        walk_plan(ch.apply(i), visit)


def broadcast_rows(
    spark,
    build: Callable,
    sf_dir: str,
    forced_only: bool = False,
    manage_confs: bool = True,
) -> list[int]:
    """Execute ``build(spark, sf_dir)`` with AQE off (and, when
    ``forced_only``, auto-broadcast disabled so every surviving
    BroadcastExchange is an explicit hint) and return the
    ``numOutputRows`` of each BroadcastExchange in plan order.

    ``manage_confs=False`` skips the per-call conf set/restore for
    callers that pin the confs once around a CONCURRENT sweep (session
    confs are global, so per-call toggling is not thread-safe)."""
    if manage_confs:
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        if forced_only:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = build(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
    finally:
        if manage_confs:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)

    found: list[int] = []

    def _visit(node):
        if node.nodeName() == "BroadcastExchange":
            v = node_metric(node, "numOutputRows")
            if v is not None:
                found.append(int(v))

    walk_plan(plan, _visit)
    return found


def classify_broadcast_growth(
    small_rows: list[int],
    big_rows: list[int],
    sf_ratio: float = 10.0,
    floor: int = 100,
) -> list[tuple[int | None, int, str]]:
    """Pair per-broadcast row counts measured at two SFs (plan order)
    and label each pair: ``bounded`` (grows well under the SF ratio or
    stays tiny), ``linear`` (grows ~with the corpus past the floor), or
    ``unpaired`` (plan shape changed between SFs — growth unknowable,
    reported for a human read)."""
    if len(small_rows) != len(big_rows):
        return [(None, b, "unpaired") for b in big_rows]
    out: list[tuple[int | None, int, str]] = []
    for s, b in zip(small_rows, big_rows):
        if b <= floor:
            out.append((s, b, "bounded"))
        elif s == 0 or b / max(s, 1) > sf_ratio / 2:
            out.append((s, b, "linear"))
        else:
            out.append((s, b, "bounded"))
    return out
