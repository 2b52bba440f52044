"""label_propagation: full parity against a plain-Python reference
implementation of monotone min-tie majority label spreading, driven by
the SAME LSH edge set the query uses (sf0.001 corpus — small enough to
materialize the graph driver-side). Oracle parity at sf0.01 is the
driver/check_oracle gate; this pins the round semantics (per-round
label snapshot, monotone assignment, count-desc/label-asc tie-break).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    LP_ROUNDS,
    LP_SEED_MOD,
    embedding_neardup_lsh,
    label_propagation,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _reference(pairs, seeds, rounds):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    labels = dict(seeds)
    rnd = {n: 0 for n in seeds}
    for r in range(1, rounds + 1):
        snapshot = dict(labels)  # same-round assignments don't vote
        new = {}
        for node in adj:
            if node in snapshot:
                continue
            votes = Counter(
                snapshot[nb] for nb in adj[node] if nb in snapshot
            )
            if votes:
                new[node] = min(votes, key=lambda l: (-votes[l], l))
        labels.update(new)
        rnd.update({n: r for n in new})
    return labels, rnd


def test_label_propagation_matches_python_reference(spark, sf_dir):
    pairs = [
        (r["ia"], r["ib"])
        for r in embedding_neardup_lsh(spark, sf_dir).collect()
    ]
    emb = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, "embeddings", sf_dir).collect()
    }
    seeds = {v: l for v, l in emb.items() if v % LP_SEED_MOD == 0}
    want_lab, want_rnd = _reference(pairs, seeds, LP_ROUNDS)

    got = label_propagation(spark, sf_dir).collect()
    assert len(got) == len(emb)
    for r in got:
        v = r["vec_id"]
        assert r["final_label"] == want_lab.get(v), v
        assert r["labeled_round"] == want_rnd.get(v), v
    # the graph actually propagated something beyond the seeds
    assert any(r["labeled_round"] == 1 for r in got)
