#!/usr/bin/env python
"""One-order-of-magnitude scale spot-bench of the dedup/ANN spine.

VERDICT r3 stretch item: validate the bounded-posting-list claims an
order of magnitude above the bench scale. TESTDATA.md stops at sf0.1
(5k docs / 2k vectors), so this tool GENERATES a deterministic
sf1.0-shaped twin (10x docs and vectors, same vocabulary, length
distribution, near-dup/exact-dup structure, cluster count — seeded,
no global RNG) under /tmp, symlinks the unscaled TPC-H tables from
sf0.1, runs the spine queries at both scales, and reports wall-clock
plus the intermediate-relation row counts the scale argument rests on
(LSH postings + candidate pairs from the cost-audit relation, PPJoin
output pairs). A bounded design shows ~linear growth (10x data ->
~10x rows/wall); a quadratic blowup shows ~100x.

Run: python tools/scale_bench.py [--keep]
Prints a JSON summary line; paste the table into BASELINE_LOCAL.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SCALE_DIR = "/tmp/etl_scale_sf1"
# the sf0.1 documents vocabulary is UNIFORM over these 30 tokens
# (measured: each ~9k occurrences at sf0.1, plus a rare 'dup' marker)
VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # en-heavy like testdata
N_DOCS, N_VECS, DIM, N_LABELS = 50_000, 20_000, 64, 10


def _gen_documents(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(1_000_003)
    texts: list[str] = []
    langs, sources, n_chars = [], [], []
    for doc_id in range(N_DOCS):
        r = rng.rand()
        if doc_id > 100 and r < 0.002:  # exact dup of an earlier doc
            t = texts[int(rng.randint(0, doc_id))]
        elif doc_id > 100 and r < 0.03:  # near-dup: ~10% token churn
            base = texts[int(rng.randint(0, doc_id))].split()
            t = " ".join(
                w if rng.rand() > 0.1 else VOCAB[int(rng.randint(0, len(VOCAB)))]
                for w in base
            )
        else:
            n = max(4, int(rng.normal(42, 14)))
            t = " ".join(VOCAB[int(i)] for i in rng.randint(0, len(VOCAB), n))
        texts.append(t)
        langs.append(LANGS[int(rng.randint(0, len(LANGS)))])
        sources.append(f"src{int(rng.randint(0, 20))}")
        n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        path,
    )


def _gen_embeddings(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # sf0.1 embeddings are ~unit-normalized gaussians with NEGLIGIBLE
    # label structure (measured: centroid norm 0.06 vs residual 1.0) —
    # mirror that, or the neardup/ANN candidate masses are incomparable
    rng = np.random.RandomState(2_000_003)
    labels = rng.randint(0, N_LABELS, N_VECS)
    vecs = rng.randn(N_VECS, DIM).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        ),
        path,
    )


def build_scale_dir() -> str:
    if os.path.isdir(SCALE_DIR):
        shutil.rmtree(SCALE_DIR)
    os.makedirs(SCALE_DIR)
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        os.symlink(os.path.join(SF01, f"{t}.parquet"),
                   os.path.join(SCALE_DIR, f"{t}.parquet"))
    _gen_documents(os.path.join(SCALE_DIR, "documents.parquet"))
    _gen_embeddings(os.path.join(SCALE_DIR, "embeddings.parquet"))
    return SCALE_DIR


SPINE = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_winnowing_pairs",
    "dedup_lsh_cost_audit",
    "ann_pq_adc_topk",
    "ann_ivf_topk",
    "emb_cosine_neardup",
]


def main() -> int:
    from etl_service_spark.functions import portable as P
    from etl_service_spark.plans.queries import registry, views
    from etl_service_spark.session import get_spark

    scale_dir = build_scale_dir()
    spark = get_spark("scale_bench")
    P.warm_udfs(spark)
    cases = registry()
    out: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1.0~", scale_dir)):
        views(spark, sf_dir)
        for name in SPINE:
            t0 = time.monotonic()
            df = cases[name].spark(spark, sf_dir)
            rows = df.count()
            wall = round(time.monotonic() - t0, 2)
            agg = {}
            if name == "dedup_lsh_cost_audit":
                # the posting/candidate masses ARE the scale claim
                r = df.selectExpr(
                    "sum(n_postings) p", "sum(cand_pairs) c"
                ).collect()[0]
                agg = {"n_postings": r.p, "cand_pairs": r.c}
            out.setdefault(name, {})[sf_name] = {
                "wall_s": wall, "rows": rows, **agg,
            }
            print(f"{sf_name} {name}: {wall}s, {rows} rows {agg}", flush=True)
    for name, rec in out.items():
        a, b = rec["sf0.1"], rec["sf1.0~"]
        rec["wall_ratio_10x"] = round(b["wall_s"] / max(a["wall_s"], 0.01), 1)
        rec["rows_ratio_10x"] = round(b["rows"] / max(a["rows"], 1), 1)
    print(json.dumps(out))
    if "--keep" not in sys.argv:
        shutil.rmtree(SCALE_DIR, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
