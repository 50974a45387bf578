#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: runs the headline flagship pipeline (ingest -> extract ->
partition -> windowed features -> checkpointed Parquet -> as-of probe
join -> Parquet) over the deterministic bench corpus, plus every bench
query over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), and prints
ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the headline pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs plus efficiency = (T32/T8)/4 (the in-sandbox evidence
protocol for the N->4N >= 0.8 criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_SCALE = os.environ.get("BENCH_SCALE", "bench")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HEADLINE_ONLY = os.environ.get("BENCH_HEADLINE_ONLY") == "1"

# Queries benched at sf0.1 (jaccard_pairs excluded: its exact all-pair
# verification is quadratic in near-dup cluster size — the scale path
# is minhash_pairs, which IS benched).
BENCH_QUERIES = [
    "doc_stats", "doc_quality", "doc_cooc", "doc_runlen",
    "doc_bpe_tokens",
    "doc_spectrum", "lang_profile", "token_totals",
    "dedup_exact", "minhash_pairs", "simhash_pairs", "doc_langid",
    "doc_fingerprint", "lag_lead", "rolling_stats", "sessionize",
    "session_stats", "asof_quote", "backfill", "time_slice",
    "hourly_rate", "pricing_summary", "top_spenders", "region_orders",
    "ann_cosine", "ann_lsh", "ann_ivf", "embedding_near_dup",
    "embedding_near_dup_lsh",
    "multimodal_decode", "custkey_distinct", "custkey_distinct_approx",
    "vocab_topk", "corpus_clean",
    # round-3 additions
    "doc_repetition", "doc_normalize", "dedup_normalized",
    "range_join_funnel", "lang_quantiles", "props_extract",
    "pages_domains", "line_dedup", "q3_shipping", "decontaminate",
    "doc_tfidf", "stratified_sample", "quality_rank", "semantic_dedup",
    "source_mix", "seq_pack", "quality_band", "lang_pivot",
    "epoch_shuffle", "topk_per_group", "dup_spans",
    "lm_score", "doc_chunks", "term_postings",
    # near_dedup_keep is the benched clustering path (LSH candidates);
    # dedup_clusters is its exact-Jaccard oracle twin and inherits
    # jaccard_pairs' quadratic pair stage, so it is excluded like
    # jaccard_pairs itself.
    "near_dedup_keep", "cust_no_orders", "corpus_curation",
    "oov_rate", "decontaminate_bloom", "near_dedup_keep_md5",
    "dup_spans_apply", "lang_zscore", "weighted_sample",
    "pages_domain_cap", "pages_drift", "vocab_heavy_approx",
    "quality_band_by_lang", "gopher_rules",
    # round-4 additions
    "blocklist_filter", "lang_balanced_sample", "multimodal_resize",
    "rolling_median", "ewma", "session_concurrency",
    "quality_classifier", "dsir_weights", "rolling_distinct",
    "asof_quote_fwd", "session_funnel", "retention_cohorts",
    "rolling_corr", "bigram_pmi", "pages_url_features",
    "boilerplate_strip", "order_fill_rates", "sales_rollup",
    "orders_audit", "train_val_split", "source_overlap",
    "url_versions", "trending_terms", "top_event_type",
    "price_histogram", "kmeans_clusters", "user_value_trend",
    "value_outliers", "event_transitions", "part_pareto",
    "bpe_merges", "q6_revenue", "q5_local_supplier", "decile_lift",
    "gini_spend", "chi2_lang_source", "orders_monthly",
    "keyness_loglik", "winsorized_stats", "bm25_scores",
    "part_linkage",
    "q14_promo", "q18_big_orders", "q4_priority", "user_streaks",
    "interval_merge", "cumulative_users", "doc_readability",
    "basket_pairs", "target_encode", "feature_scale", "time_features",
    "cust_order_dist", "part_supplier_census", "robust_scale",
    "k_anonymize", "source_diversity", "feature_corr",
    "triangle_count", "ab_test", "source_kl", "interarrival_stats",
    "embedding_covariance", "embedding_quantize", "label_centroid_sim",
    "embedding_pca", "rrf_fusion", "template_overlap", "daily_anomaly",
    # containment_pairs is excluded for the same reason as
    # jaccard_pairs: the exact inverted-index tier enumerates all
    # in-posting pairs (quadratic in near-dup cluster size); the
    # benched scale path for candidate generation is minhash_pairs.
    "rfm_segments", "orders_growth", "benford_digits",
    "dow_index", "new_vs_returning", "zipf_fit", "q7_trade_flow",
    # dup_cluster_hist excluded: it inherits jaccard_pairs' exact
    # quadratic pair tier (same reason as dedup_clusters).
    "ltv_cohorts", "discount_quantity_corr", "vocab_coverage",
    "dow_anova", "source_hhi", "conversion_lag", "cheapest_supplier",
    # dedup_survivor excluded: jaccard exact-tier sibling (see
    # dedup_clusters / dup_cluster_hist).
    "part_churn", "basket_lift", "user_type_entropy",
    "tables_census", "missing_hours", "value_quantiles",
    "entity_clusters", "order_reorder_rate", "lang_confusion",
    # round-5 additions
    "q8_market_share", "q9_product_profit", "q15_top_supplier",
    "q17_small_quantity", "q19_disjunctive", "q22_sales_opportunity",
    "q11_important_parts", "q12_priority_census",
    "q20_dominant_suppliers", "q21_waiting_suppliers",
    "part_pagerank", "item_cosine_sim", "volume_changepoint",
    "seq3_mining", "multimodal_frames",
    # previously-unbenched registry entries (the pages_* flagship
    # family stays out: the headline run IS its benchmark; the five
    # quadratic exact-Jaccard oracle twins stay out as documented
    # above)
    "asof_quote_tol", "corpus_profile", "custkey_distinct_hll_md5",
    "decontaminate_bloom_md5", "decontaminate_semantic", "doc_entropy",
    "doc_fingerprint_md5", "doc_sample", "lang_quantiles_approx",
    "minhash_pairs_md5", "pii_redact", "returned_customers",
    "simhash_pairs_md5", "token_budget", "vocab_heavy_md5",
    # round-5 session-2 additions (jaccard_prefix excluded: exact
    # AllPairs verification is quadratic in near-dup cluster size,
    # same as jaccard_pairs; its sweep at sf0.1 is recorded instead)
    "weighted_median", "lang_source_mi", "vocab_jaccard_langs",
    "user_path_census", "nation_top2_gap", "pages_markup_census",
    "shard_balance", "value_psi", "best_split_value",
    "lang_top_terms", "pages_titles", "rolling_extrema_time",
    "twap_value", "bloom_semi_join", "xcorr_lag",
    "gram_novelty", "lang_kappa", "mutual_nn", "name_typo_pairs",
    "supplier_skyline", "linear_attribution", "resample_locf",
    "spearman_qty_discount", "kendall_tau_b", "title_text_overlap",
    "kaplan_meier", "embedding_jl", "lognormal_fit",
    "nb_lang_classify", "ring_rebalance",
    "ks_2samp", "mann_whitney", "quantile_normalize",
]


def consume(res) -> int:
    """Fully execute a result and return its row count."""
    import pandas as pd
    if isinstance(res, pd.DataFrame):
        return len(res)
    if hasattr(res, "iter_batches"):          # ray.data.Dataset
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    return res.num_rows                        # pyarrow.Table


def run_headline(num_partitions: int = 32) -> dict:
    import ray.data as rd

    from nuclei_feature_extraction_ray.corpus import corpus_dir
    from nuclei_feature_extraction_ray.pipelines.pages_features import (
        finalize_fused_probes, run_checkpointed)
    from nuclei_feature_extraction_ray.state.manifest import summarize

    cdir = corpus_dir(BENCH_SCALE)
    pages_path = os.path.join(cdir, "pages")
    probes_path = os.path.join(cdir, "probes.parquet")
    # Warm the OS page cache so we measure compute + shuffle, not the
    # first cold read.
    import pyarrow.parquet as pq
    n_pages = 0
    for name in sorted(os.listdir(pages_path)):
        fp = os.path.join(pages_path, name)
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
        n_pages += pq.ParquetFile(fp).metadata.num_rows

    # Warm the Ray worker-process pool so the timer measures the
    # pipeline, not cluster boot (worker spawn is ~seconds).
    rd.range(2048, override_num_blocks=64).map_batches(
        lambda b: b, batch_format="pyarrow").count()

    # RAM-backed scratch when available: the shared host disk was
    # observed congested (load ~14 with 97% idle CPU), which IO-binds
    # the 32-CPU level disproportionately and corrupts the measured
    # SCALING of the engine with host disk noise.
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_root = tempfile.mkdtemp(prefix="nfx_bench_", dir=shm)
    try:
      best, best_s, raw = None, None, []
      for rep in range(HEADLINE_REPEATS):
        feat_dir = os.path.join(out_root, "features_%d" % rep)
        probe_dir = os.path.join(out_root, "probe_features_%d" % rep)
        t0 = time.perf_counter()
        pages = rd.read_parquet(pages_path,
                                columns=["url", "warc_ts", "html", "lang"])
        # Two phases: features job (checkpointed), then the as-of
        # probe join over the committed checkpoint. (A fused
        # emit="features" single job was measured SLOWER: two chained
        # hash shuffles compete for the same aggregator pool.)
        probes = rd.read_parquet(probes_path)
        if os.environ.get("BENCH_FUSED", "1") == "1":
            # fused serve: probes broadcast pre-partitioned; every sink
            # task as-of joins its slice while the partition's features
            # are still in memory — one job end-to-end, no re-read
            run_checkpointed(pages, feat_dir,
                             num_partitions=num_partitions,
                             resume=False, probes_ds=probes,
                             probe_dir=probe_dir).materialize()
            finalize_fused_probes(probe_dir, probes, num_partitions)
        else:
            from nuclei_feature_extraction_ray.pipelines.pages_features \
                import probe_features_from_checkpoint
            run_checkpointed(pages, feat_dir,
                             num_partitions=num_partitions,
                             resume=False).materialize()
            probe_features_from_checkpoint(
                feat_dir, probes, num_partitions=num_partitions) \
                .write_parquet(probe_dir)
        sec = time.perf_counter() - t0
        raw.append(round(sec, 3))
        if best is None or sec < best:
            best, best_s = sec, summarize(feat_dir)
        shutil.rmtree(feat_dir, ignore_errors=True)
        shutil.rmtree(probe_dir, ignore_errors=True)
      return {
          "headline_sec": round(best, 3),
          "headline_raw_sec": raw,
          "pages": n_pages,
          "pages_per_sec": round(n_pages / best, 1),
          "feature_rows": best_s["rows"],
          "dropped_rows": best_s["dropped_rows"],
          "partitions": best_s["partitions"],
      }
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


#: repeats per query, min-of-N recorded: single-shot numbers alias the
#: shared host's load epochs into round-over-round comparisons
QUERY_REPEATS = int(os.environ.get("BENCH_QUERY_REPEATS", "2"))

#: headline repeats (min-of-N + raw list recorded): the shared host's
#: load epochs were measured to swing a single-shot headline 7.4 s ->
#: 28.3 s on identical code within one morning
HEADLINE_REPEATS = int(os.environ.get("BENCH_HEADLINE_REPEATS", "2"))


# Intentional exclusions from the dynamic complement below: the
# pages_* flagship twins (the headline run IS their benchmark) and
# the quadratic exact-Jaccard oracle tiers (their benched scale path
# is minhash_pairs; each is documented at its BENCH_QUERIES comment).
BENCH_EXCLUDE = {
    "pages_features_core", "pages_features_full", "pages_sessions",
    "pages_probes_core", "pages_latest", "pages_features",
    "pages_probe_features",
    "jaccard_pairs", "dedup_clusters", "containment_pairs",
    "dup_cluster_hist", "dedup_survivor", "jaccard_prefix",
}


def bench_names() -> list:
    """The static core list plus every later-registered query not
    explicitly excluded — new operators join the bench table
    automatically."""
    from nuclei_feature_extraction_ray.pipelines.queries import (
        all_queries)
    known = set(BENCH_QUERIES) | BENCH_EXCLUDE
    return BENCH_QUERIES + [n for n in all_queries()
                            if n not in known]


def run_queries() -> dict:
    from nuclei_feature_extraction_ray.pipelines.queries import QUERIES
    out = {}
    for name in bench_names():
        best = None
        for _ in range(QUERY_REPEATS):
            t0 = time.perf_counter()
            n = consume(QUERIES[name](SF_DIR))
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
        out[name + "_rows"] = n
    return out


def _burn(secs: float) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < secs:
        x += 1
    return x


def effective_cores(n: int = 32, secs: float = 0.5) -> float:
    """Measured host parallel throughput in single-core units: n
    concurrent busy-loops vs one. The shared host's effective-core cap
    was observed to swing identical 32-CPU runs 7.4 s -> 28 s within
    one morning while 8-CPU legs stayed stable; recording the cap with
    every bench record makes the epoch quality self-describing."""
    import multiprocessing as mp

    with mp.Pool(n) as p:
        agg = sum(p.map(_burn, [secs] * n))
    return round(agg / max(_burn(secs), 1), 1)


def main() -> None:
    # Corpus generation happens (cached) before the Ray session/timer.
    from nuclei_feature_extraction_ray.corpus import corpus_dir
    corpus_dir(BENCH_SCALE)
    eff_cores = effective_cores()

    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    head = run_headline()
    queries = {} if HEADLINE_ONLY else run_queries()

    qsec = {k: v for k, v in queries.items() if not k.endswith("_rows")}
    full = {
        "queries": qsec,
        "query_rows": {k[:-5]: v for k, v in queries.items()
                       if k.endswith("_rows")},
        "query_repeats": QUERY_REPEATS,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "host_effective_cores": eff_cores,
        **head,
    }
    # Full per-query timings go to a FILE: the driver's stdout-tail
    # capture is ~2,000 chars and the 70+-query map overflowed it in
    # round 3 (BENCH_r03 parsed=null). The LAST stdout line is a
    # compact headline-only record that always fits.
    here = os.path.dirname(os.path.abspath(__file__))
    if not HEADLINE_ONLY:
        with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    rec = {
        "metric": ("pages/sec end-to-end (ingest->windowed features->"
                   "as-of join->Parquet)"),
        "value": head["headline_sec"],
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "host_effective_cores": eff_cores,
        **head,
        "n_queries": len(qsec),
        "queries_total_sec": round(sum(qsec.values()), 3),
        "queries_file": "BENCH_QUERIES.json",
    }
    # Structural capture of the most recent scaling run (bench.py
    # --scaling writes BENCH_SCALING.json) so the driver's parsed
    # record carries the raw per-level times, not just BASELINE.md.
    try:
        with open(os.path.join(here, "BENCH_SCALING.json")) as f:
            rec["scaling"] = json.load(f)
    except (OSError, ValueError):
        pass
    print(json.dumps(rec))
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_HEADLINE_ONLY="1",
                   # single-shot per subprocess: the alternating
                   # min-of-N HERE is the repeat protocol (unchanged
                   # across rounds); in-process headline repeats would
                   # silently double every level's sample count
                   BENCH_HEADLINE_REPEATS="1",
                   BENCH_SCALE=os.environ.get("BENCH_SCALE", "scaling"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(
                                 os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = (int(x) for x in os.environ.get(
        "BENCH_SCALING_LEVELS", "8,32").split(","))
    repeats = int(os.environ.get("BENCH_SCALING_REPEATS", "2"))
    # min-of-N per level with ALTERNATING level order: the shared host
    # drifts (effective-core caps, disk congestion epochs), so running
    # all-lo-then-all-hi lets one level absorb a bad epoch and skews
    # efficiency either way; interleaving exposes both levels to the
    # same conditions.
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    rec = {
        "pages": r_lo["pages"],
        "sec_%d" % lo: t_lo, "sec_%d" % hi: t_hi,
        "pages_per_sec_%d" % lo: r_lo["pages_per_sec"],
        "pages_per_sec_%d" % hi: r_hi["pages_per_sec"],
        "raw_sec_%d" % lo: [r["value"] for r in runs_lo],
        "raw_sec_%d" % hi: [r["value"] for r in runs_hi],
        # measured host parallel capacity per run (single-core units):
        # makes effective-core-cap epochs visible inside the record
        "host_effective_cores_%d" % lo: [
            r.get("host_effective_cores") for r in runs_lo],
        "host_effective_cores_%d" % hi: [
            r.get("host_effective_cores") for r in runs_hi],
        "scaling_efficiency": round(eff, 3),
        "repeats": repeats,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_SCALING.json"), "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
