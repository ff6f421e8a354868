"""Cross-sf parity gate (runs every round, not just under a manual
YUKI_SPARK_TEST_SF override): the adaptive-parameter queries derive
LSH bits/planes, IVF cells, and the pairwise doc cap from the CATALOG
they run against, so a regression in the parameter derivation — a
formula change, a footer-count misread, an oracle twin built against
the wrong catalog — can pass at sf0.01 and still break at another
scale. Re-running the ten cheapest adaptive queries at sf0.001 here
surfaces that class before the driver gate does.

The env var is set per-test (monkeypatch) because both the sim and
docs oracle builders read it at CALL time — exactly the contract this
gate exists to pin."""
from __future__ import annotations

import pytest

from yuki_spark.compare import compare

# Slow tier (r14 verdict item 1): a second-scale parity sweep is a
# robustness gate, not the driver's sf0.01 gate — the heaviest rows
# (s29 at sf0.001 alone costs ~3 min) belong in the builder's full CI
# (tools/citest.sh sets YUKI_SPARK_RUN_SLOW=1), not the driver's
# budget-bounded default run.
pytestmark = pytest.mark.slow

SF_SMALL = "/root/testdata/sf0.001"

# cheapest queries whose parameters (or twin SQL) derive from the
# catalog: near-dup caps (d2/d3/d4), embedding LSH planes (d9/s3/s11),
# IVF cells (s4), semdedup cell split (s7), PQ shift (s8), and the
# balance quota over the s9 fit (s10)
ADAPTIVE = [
    "d2_ngram_jaccard_dups",
    "d3_minhash_lsh_dups",
    "d4_simhash_dups",
    "d9_embedding_neardup",
    "s3_lsh_ann",
    "s4_ivf_ann",
    "s7_semdedup",
    "s8_pq_ann",
    "s10_cluster_balance",
    "s11_knn_graph",
    "d33_split_leakage",
    "d36_cross_source_dups",  # PAIR_CAP from the catalog footer
    "s14_mmr_rerank",  # deposit-backed pool re-derived per catalog
    "s16_knn_centrality",  # inherits s11's adaptive plane count
    "s17_ivf_probe_sweep",  # composes three s4 twins (IVF cells)
    "s18_nn_descent",  # expands the s11 twin (adaptive plane count)
    "s21_nn_descent_converge",  # two s11-twin expansions + edge diffs
    "s22_hnsw_ann",  # level-0 + level-sized level-1 s11 twins
    "s23_hnsw_beam_sweep",  # three descent chains over the same twins
    "s24_hnsw_multilevel",  # 3-level chain + level-sized gl2 twin
    "s19_ivfpq_ann",  # IVF cells + pq_shift from the catalog footer
    "s20_pq_shortlist_sweep",  # three cuts over the s19 adaptive chain
    "s26_hnsw_adaptive",  # ladder moduli derived from the footer count
    "s27_graph_churn",  # churn_modulus demo grain from the footer count
    "s28_filtered_ann",  # composes the s4 adaptive chain (IVF cells)
    "s29_filtered_graph_ann",  # 4 filtered + 3 pool descent chains
    "d53_video_phash_dups",  # PAIR_CAP all-pairs twin from the footer
    "s31_pq_churn",  # pq_shift geometry from the catalog footer
    "s32_filtered_ann_auto",  # policy-dispatched s29/s4 chains
    "d55_audio_fingerprint_dups",  # PAIR_CAP all-pairs twin from the footer
]


@pytest.mark.parametrize("name", ADAPTIVE)
def test_adaptive_parity_at_sf0001(spark, name, monkeypatch):
    monkeypatch.setenv("YUKI_SPARK_TEST_SF", SF_SMALL)
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()  # rebuilt under the small catalog
    problems = compare(spark, entrymod.queries()[name], oracles[name], SF_SMALL)
    assert not problems, f"{name} @ sf0.001:\n" + "\n".join(problems)
