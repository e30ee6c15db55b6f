"""Shared physical-plan walker for the exchange-payload pins (r18 —
VERDICT r17 item 2).

The r17 q201 pin walked only ``children()`` plus
``AdaptiveSparkPlanExec.inputPlan()``. That walk is blind in exactly
the configuration that matters: with AQE on, the executed tree wraps
each materialized shuffle in a ``ShuffleQueryStageExec`` (the exchange
lives behind ``.plan()``, which ``children()`` never reaches) and each
reused shuffle in a ``ReusedExchangeExec`` leaf (the exchange lives
behind ``.child()``) — so a keyed exchange carrying document text was
structurally invisible to the pin (the dedup_mix_pack finding,
VERDICT r17 "What's wrong"). This walker descends every wrapper those
nodes expose and dedupes on ``SparkPlan.id()`` so a reused exchange is
inspected once, not once per consumer.
"""

from __future__ import annotations


def iter_plan_nodes(root):
    """Yield every physical node reachable from ``root``, descending
    through the AQE wrappers a plain ``children()`` walk never enters:
    ``AdaptiveSparkPlanExec`` (both the current physical plan and the
    pre-AQE input plan — exchanges must be caught in whichever tree
    holds them at inspection time), ``*QueryStageExec.plan()``, and
    ``ReusedExchangeExec.child()``.

    Walking ``inputPlan()`` alongside ``executedPlan()`` is DELIBERATE
    conservatism (ADVICE r18): the pre-AQE input tree can hold
    exchanges AQE later replaced (e.g. a sort-merge shuffle converted
    to broadcast), so a ban-pin may flag a node that never executed —
    a false-POSITIVE risk only, never a missed bug. That is the right
    default for these pins: a payload the optimizer happened to
    rescue this run is still a latent scale bug (AQE's runtime stats
    differ at 100 TB), and the plan-discipline tests additionally run
    with AQE off, where the two trees coincide and the question is
    moot. A pin that legitimately needs executed-only semantics
    should filter on the stage tree itself, not weaken this walker."""
    stack, seen = [root], set()
    while stack:
        node = stack.pop()
        nid = node.id()  # SparkPlan.id — unique per physical node
        if nid in seen:
            continue
        seen.add(nid)
        yield node
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            stack.append(node.inputPlan())
        elif cls.endswith("QueryStageExec"):
            stack.append(node.plan())
        elif cls == "ReusedExchangeExec":
            stack.append(node.child())
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def exchanges(df):
    """Every distinct Exchange node in ``df``'s executed plan,
    AQE-proof (query stages and reused exchanges included)."""
    return [
        n
        for n in iter_plan_nodes(df._jdf.queryExecution().executedPlan())
        if "Exchange" in n.getClass().getSimpleName()
    ]


def keyed_exchange_strings(df, allow=()):
    """(column, partitioning) for every string-typed column riding a
    non-RoundRobin exchange, minus the ``allow`` names — the
    exchange-payload pins' shared predicate: RoundRobin repartitions
    are the deliberate text-moves-exactly-once work-spreading move;
    keyed shuffles are where payload width multiplies across join/agg
    stages and heavy strings are banned. BroadcastExchange nodes are
    DELIBERATELY in scope too (r18 review): a corpus-branch string on
    a broadcast is as much a scale bug as on a shuffle — broadcasting
    corpus text melts the driver before a shuffle would — and the r18
    minhash finding (raw shingles riding BroadcastPartitioning) was
    caught exactly because broadcasts are inspected. Legitimate
    small-frame broadcasts name their columns in ``allow`` ('lang',
    'topic'), which stays honest because each allowlist is per-pin
    and tiny."""
    bad = []
    for node in exchanges(df):
        part = node.outputPartitioning().toString()
        if "RoundRobin" in part:
            continue
        out = node.output()
        for i in range(out.size()):
            a = out.apply(i)
            if a.dataType().typeName() == "string" and a.name() not in allow:
                bad.append((a.name(), part[:60]))
    return bad
