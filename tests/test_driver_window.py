"""Driver-window pinning — the correctness driver certifies the FIRST
50 entries of ``queries()``, so dict order is load-bearing. This guard
pins the round-5 window (COVERAGE.md "Driver-certification ledger")
against accidental reorder: an edit that shuffles the head of the
registry silently reassigns which queries get external evidence.

When rotating the window for a new round, update WINDOW here and the
ledger in COVERAGE.md together — that's the point: rotation must be a
deliberate two-file change, not a side effect.
"""

import __spark_entry__ as entrymod

WINDOW = [
    "shard_manifest", "manifest_merge",
    # crawl loop
    "robots_gate", "robots_rules", "robots_allow", "sitemap_parse",
    "crawl_plan", "frontier_sched", "snapshot_delta", "redirects",
    "url_traps", "soft404", "domain_parse", "template_pages", "cc_scrub",
    # release & maintenance
    "hrw_shards", "compaction_plan", "mixture_plan", "temp_mixture",
    "host_quota", "holdout_split",
    # web graph
    "host_trustrank", "outlink_pagerank", "spam_mass", "host_hits",
    "host_kcore", "host_salsa", "bowtie", "harmonic", "modularity",
    "hyperball",
    # retrieval ranking
    "bm25f_topk", "qlm_topk", "prf_bm25", "mmr_topk", "rrf_fuse",
    "phrase_search", "snippets",
    # sketches
    "hll_words", "cms_topwords", "bloom_dedup", "ams_f2", "kmv_overlap",
    # gate metrics / statistical tests
    "gate_ndcg", "gate_map", "gate_kappa", "gate_mcnemar", "ks_drift",
    "benford", "powerlaw_fit",
]


def test_round5_window_is_first_fifty():
    assert list(entrymod.queries())[:50] == WINDOW


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [k for k in qs if k not in oracles]
    assert not missing, f"queries without oracle SQL: {missing}"
