"""End-to-end corpus build: the materializing runner for the
training-data pipeline the registry exposes query-by-query.

``build_corpus`` chains the same operators the oracle-checked registry
entries use — nothing here is new logic, which is the point: the
runner's per-stage counts are cross-checkable against the registry
queries (corpus_training_pipeline, dedup_*, corpus_contamination,
text_quality_score), and a user of the query plane gets the "actually
write my curated corpus" loop with the same semantics.

Stages, in pretraining-pipeline order:

1. exact dedup        — poly-hash groupBy, keep min doc_id per text;
2. near-dup collapse  — PPJoin jaccard pairs → connected components,
                        keep each cluster's min (reproducibility-first
                        keeper; swap in best-quality election via
                        operators/corpus.best_keeper if curation wants
                        it);
3. benchmark holdout  — the doc_id < bench_max_id stand-in eval set
                        never enters the corpus, and any training doc
                        sharing >= k shingles with it is
                        decontaminated away;
4. quality gate       — the Arrow quality kernel, threshold q_min;
5. split assignment   — pure-function-of-doc_id train/val/test;
6. atomic publish     — ONE snapshot commit (sources/snapshots): a
                        crashed build leaves the previous version
                        fully readable, a rebuild is commit_overwrite
                        (old versions stay time-travelable until
                        expire), and "what exactly did we train on" is
                        answerable per version forever.

The report (returned AND written as report.json next to the table) is
the per-stage row ledger — every removal accounted, which is the audit
artifact a data-governance review asks for.

At 100 TB: stages 1-2 are the dedup plane's bucketed/staged shapes,
3-5 are map-side, 6 is one metadata write. The runner's own .count()
actions are per-stage scalar aggregates (no driver data movement).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import graph, textops
from ..sources import snapshots

TRAIN_PER_MILLE = 900
VAL_PER_MILLE = 950
_BUCKET = "((doc_id * 2654435761) % 4294967296) % 1000"
SPLIT_EXPR = (
    f"CASE WHEN {_BUCKET} < {TRAIN_PER_MILLE} THEN 'train' "
    f"WHEN {_BUCKET} < {VAL_PER_MILLE} THEN 'val' ELSE 'test' END"
)


def build_corpus(
    spark: SparkSession,
    sf_dir: str,
    table_dir: str,
    q_min: float = 0.45,
    bench_max_id: int = 50,
    k_shared: int = 5,
    tau: float = 0.8,
) -> dict:
    """Run the full build; returns the per-stage report dict and
    commits the curated corpus as the next snapshot version of
    ``table_dir``."""
    from ..operators.dedup import contamination_staged, exact_dedup_staged
    from ..plans.queries import views

    views(spark, sf_dir)
    docs = spark.table("documents")
    report: dict = {"sf_dir": sf_dir, "n_input": docs.count()}

    # Each stage's survivor set is lineage-truncated (the repo's
    # standard staging idiom) so the ledger count AND the next stage
    # read the materialized result instead of re-executing the whole
    # upstream chain per action.

    # 1. exact dedup — the registry operator itself, keepers only
    exact_kept = (
        exact_dedup_staged(spark)
        .select(F.col("keeper_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    report["n_after_exact"] = exact_kept.count()

    # 2. near-dup collapse: cluster members above tau keep the min id
    clusters = graph.dup_clusters(spark, tau=tau)
    near_pruned = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    kept = exact_kept.join(near_pruned, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    report["n_after_neardup"] = kept.count()

    # 3. benchmark holdout + shingle-overlap decontamination
    contaminated = contamination_staged(
        spark, k_shared=k_shared, bench_max_id=bench_max_id
    ).select(F.col("train_id").alias("doc_id")).distinct()
    kept = (
        kept.filter(F.col("doc_id") >= bench_max_id)
        .join(contaminated, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    report["n_after_decontamination"] = kept.count()

    # 4. quality gate over the surviving docs only
    scored = textops.quality_scores_df(docs.join(kept, "doc_id")).select(
        "doc_id", "quality"
    )
    kept = (
        scored.filter(F.col("quality") >= q_min)
        .select("doc_id", "quality")
        .localCheckpoint(eager=True)
    )
    report["n_after_quality"] = kept.count()

    # 5. deterministic split + 6. one atomic snapshot commit
    curated = (
        docs.join(kept, "doc_id")
        .withColumn("split", F.expr(SPLIT_EXPR))
        .select("doc_id", "split", "quality", "lang", "source", "n_chars", "text")
    )
    version = snapshots.commit_overwrite(curated, table_dir)
    report["version"] = version
    report["n_per_split"] = {
        r["split"]: r["n"]
        for r in snapshots.read_snapshot(spark, table_dir, version)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    with open(os.path.join(table_dir, f"report_v{version:06d}.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    return report
