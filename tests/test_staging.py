"""Parquet staging backend for the memoized relations: with
spark.etl_service.stagingDir set, every staged relation (shingle
hash-sets, prefix postings, token mass, dup pairs/clusters, IVF/LSH
stages) writes to parquet under the run-scoped dir and reads back —
the durable staging-table shape for a real cluster — and all oracle
checks stay green."""

from __future__ import annotations

import os

import pytest

from etl_service_spark.functions.portable import STAGING_DIR_CONF
from etl_service_spark.plans.queries import registry

from .harness import run_case

CASES = registry()

STAGED_FAMILIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_components",
    "text_tfidf_top_terms",
    "text_top_terms_per_language",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "corpus_training_pipeline",
    "text_bigram_lm_score",
    "dedup_chunk_exact",
    "emb_pq_codes",
    "ann_pq_adc_topk",
    "basket_brand_pairs",
    "dedup_best_keeper",
]


@pytest.fixture()
def staging_dir(spark, tmp_path):
    d = str(tmp_path / "staging")
    spark.conf.set(STAGING_DIR_CONF, d)
    try:
        yield d
    finally:
        spark.conf.unset(STAGING_DIR_CONF)


@pytest.mark.parametrize("name", STAGED_FAMILIES)
def test_staged_families_green_with_parquet_staging(spark, sf_dir, staging_dir, name):
    case = CASES[name]
    problems = run_case(spark, sf_dir, case.spark, case.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_parquet_staging_actually_writes(spark, sf_dir, staging_dir):
    from etl_service_spark.operators import dedup
    from etl_service_spark.plans.queries import views

    views(spark, sf_dir)
    rel = dedup.materialize_hashsets(spark)
    assert os.path.isdir(os.path.join(staging_dir, rel))  # parquet dir, not a checkpoint
    assert spark.table(rel).count() > 0


def test_pair_outputs_staged_once_and_shared(spark, sf_dir):
    """Round 11: the VERIFIED pair / fingerprint OUTPUTS are staged
    (not just their inputs) and every consumer reads the same memoized
    relation — the sweep/recall-report consumers must not re-derive
    the candidate join per call, and the clustering path must share
    the standalone query's pair table instead of checkpointing it a
    second time."""
    from etl_service_spark.operators import dedup, graph
    from etl_service_spark.plans.queries import views

    views(spark, sf_dir)
    a = dedup.ngram_jaccard_staged_view(spark, tau=0.8)
    b = dedup.ngram_jaccard_staged_view(spark, tau=0.8)
    assert a == b  # memo hit: one materialization per (session, params)
    assert graph.staged_pairs_view(spark, tau=0.8) == a  # shared, not re-staged
    # consumer plans are scans of the staged relation — no candidate
    # self-join, no Arrow kernel, no exchange left in the pair query
    plan = (
        dedup.minhash_lsh_staged(spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan, plan[:1200]


def test_r12_staged_relations_shared_and_memoized(spark, sf_dir):
    """Round 12: the winnowing fingerprint selection, the ExactSubstr
    span relation, the tf-idf term-frequency table and the RAKE words
    relation are memoized staged views — repeated calls return the
    SAME content-addressed relation (one materialization per session),
    and the sibling consumers share it instead of re-deriving."""
    from etl_service_spark.operators import dedup, textops
    from etl_service_spark.plans.queries import views

    views(spark, sf_dir)
    w1 = textops._winnow_fp_staged(spark, 4, 5, "documents")
    w2 = textops._winnow_fp_staged(spark, 4, 5, "documents")
    assert w1 == w2
    s1 = dedup._ess_spans_staged(spark, 8, "documents")
    s2 = dedup._ess_spans_staged(spark, 8, "documents")
    assert s1 == s2
    # the pair report's plan reads the staged fingerprints — the
    # w-window MIN selection must not be re-planned per reference
    plan = (
        textops.winnowing_pairs_staged(spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan[:1200]


def test_neardup_blocks_size_driven():
    """Round 12 (VERDICT r11 #1): the block count for the block-pair
    kernels is purely size-driven — the r11 parallelism floor was a
    driver-refuted 32-core regression and must not come back."""
    from etl_service_spark.operators.similarity import _neardup_blocks

    assert _neardup_blocks(2000, 700) == 3
    assert _neardup_blocks(1, 700) == 1
    assert _neardup_blocks(0, 700) == 1
    assert _neardup_blocks(70000, 700) == 100


def test_broadcast_threshold_parser(spark):
    """ADVICE r11: unit-suffixed autoBroadcastJoinThreshold values must
    parse instead of silently falling back to 10 MiB and flipping the
    size-adaptive join branches."""
    from etl_service_spark.operators.graph import _broadcast_threshold_bytes

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want in (
            ("64MB", 64 * 1024 * 1024),
            ("1g", 1024 ** 3),
            ("10485760b", 10 * 1024 * 1024),
            ("67108864", 64 * 1024 * 1024),
            ("-1", 0),
        ):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _broadcast_threshold_bytes(spark) == want, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
