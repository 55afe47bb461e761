"""Snapshot/time-travel table lifecycle (sources/snapshots.py):
atomic manifest commits, snapshot isolation across an overwrite,
crash-window behavior, and expiry reclaiming exactly the unreferenced
bytes."""

from __future__ import annotations

import json
import os

import pytest

from etl_service_spark.sources import snapshots as S


@pytest.fixture()
def table(tmp_path, spark):
    d = str(tmp_path / "tbl")

    def commit(ids, op="append"):
        df = spark.createDataFrame([(i, i * 10) for i in ids], "id bigint, v bigint")
        fn = S.commit_append if op == "append" else S.commit_overwrite
        return fn(df, d)

    return d, commit


def _ids(spark, d, version=None):
    return sorted(r.id for r in S.read_snapshot(spark, d, version).collect())


def test_append_overwrite_time_travel(spark, table):
    d, commit = table
    assert commit([1, 2]) == 1
    assert commit([3]) == 2
    assert commit([9], op="overwrite") == 3
    assert S.list_versions(d) == [1, 2, 3]
    assert _ids(spark, d) == [9]  # latest = overwrite result
    assert _ids(spark, d, version=1) == [1, 2]
    assert _ids(spark, d, version=2) == [1, 2, 3]  # pre-overwrite state intact


def test_staged_files_invisible_until_commit(spark, table):
    d, commit = table
    commit([1])
    # simulate a crashed writer: staged data files but no manifest
    df = spark.createDataFrame([(99, 990)], "id bigint, v bigint")
    S._stage_data_files(df, d)
    # and a half-written manifest temp (never renamed)
    with open(os.path.join(d, "v000002.manifest.json.deadbeef.tmp"), "w") as fh:
        fh.write("{")
    assert S.list_versions(d) == [1]
    assert _ids(spark, d) == [1]


def test_expire_reclaims_unreferenced_files_only(spark, table):
    d, commit = table
    commit([1, 2])
    commit([3])
    commit([9], op="overwrite")
    # orphan from a crashed writer — must be swept too
    df = spark.createDataFrame([(99, 990)], "id bigint, v bigint")
    S._stage_data_files(df, d)
    # default grace would keep the seconds-old orphan (in-flight-writer
    # protection); grace 0 asserts the sweep itself
    stats = S.expire_snapshots(d, keep_last=1, orphan_grace_s=0)
    assert stats["dropped_manifests"] == [1, 2]
    assert stats["kept_versions"] == [3]
    assert stats["dropped_files"] > 0
    assert _ids(spark, d) == [9]  # survivor intact
    with pytest.raises(ValueError):
        S.read_snapshot(spark, d, version=2)  # expired
    # every remaining data file is referenced by the surviving manifest
    manifest = json.load(open(os.path.join(d, "v000003.manifest.json")))
    on_disk = set()
    data_root = os.path.join(d, "data")
    for stage in os.listdir(data_root):
        for f in os.listdir(os.path.join(data_root, stage)):
            if f.endswith(".parquet"):
                on_disk.add(os.path.join("data", stage, f))
    assert on_disk == set(manifest["files"])


def test_manifest_rows_match_data(spark, table):
    d, commit = table
    commit([1, 2, 3])
    commit([4])
    manifest = json.load(open(os.path.join(d, "v000002.manifest.json")))
    assert manifest["rows"] == 4
    assert S.read_snapshot(spark, d).count() == 4


from hypothesis import given, settings, strategies as st

# model-based: a random sequence of append/overwrite/expire commits,
# checked against a pure-Python model of version -> row multiset.
OP = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 50), min_size=1, max_size=5)),
    st.tuples(st.just("overwrite"), st.lists(st.integers(0, 50), min_size=1, max_size=5)),
    st.tuples(st.just("expire"), st.integers(1, 3)),
)


@settings(max_examples=15, deadline=None)
@given(st.lists(OP, min_size=1, max_size=8))
def test_snapshot_layer_matches_model(spark, tmp_path_factory, ops):
    import collections

    tmp = tmp_path_factory.mktemp("snapmodel")
    d = str(tmp / "tbl")
    model: dict[int, "collections.Counter"] = {}  # version -> row multiset
    live: "collections.Counter" = collections.Counter()
    nxt = 1
    for op, arg in ops:
        if op == "append":
            live = live + collections.Counter(arg)
            df = spark.createDataFrame([(i,) for i in arg], "id bigint")
            assert S.commit_append(df, d) == nxt
            model[nxt] = collections.Counter(live)
            nxt += 1
        elif op == "overwrite":
            live = collections.Counter(arg)
            df = spark.createDataFrame([(i,) for i in arg], "id bigint")
            assert S.commit_overwrite(df, d) == nxt
            model[nxt] = collections.Counter(live)
            nxt += 1
        else:  # expire keep_last=arg
            if not model:
                continue
            S.expire_snapshots(d, keep_last=arg, orphan_grace_s=0)
            keep = sorted(model)[-arg:]
            model = {v: model[v] for v in keep}
    assert S.list_versions(d) == sorted(model)
    for v, expect in model.items():
        got = collections.Counter(
            r.id for r in S.read_snapshot(spark, d, version=v).collect()
        )
        assert got == expect, f"version {v}"


def test_merge_upsert_update_insert_delete(spark, table):
    d, commit = table
    commit([1, 2, 3, 4])  # v1: v = id*10
    src = spark.createDataFrame(
        [
            (2, 999, False),   # update
            (3, 0, True),      # delete (value ignored)
            (50, 500, False),  # insert
        ],
        "id bigint, v bigint, is_delete boolean",
    )
    assert S.merge_upsert(spark, d, src, "id", "is_delete") == 2
    rows = {r.id: r.v for r in S.read_snapshot(spark, d).collect()}
    assert rows == {1: 10, 2: 999, 4: 40, 50: 500}
    # v1 untouched by the merge (snapshot isolation)
    assert _ids(spark, d, version=1) == [1, 2, 3, 4]


def test_merge_upsert_without_delete_col_is_pure_upsert(spark, table):
    d, commit = table
    commit([1, 2])
    src = spark.createDataFrame([(2, 7), (9, 90)], "id bigint, v bigint")
    S.merge_upsert(spark, d, src, "id")
    rows = {r.id: r.v for r in S.read_snapshot(spark, d).collect()}
    assert rows == {1: 10, 2: 7, 9: 90}


def test_merge_upsert_prunes_untouched_files(spark, tmp_path):
    d = str(tmp_path / "tbl")
    # range-clustered seed: 4 disjoint key ranges -> 4+ data files
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(400)], "id bigint, v bigint"
    ).repartitionByRange(4, "id")
    S.commit_append(df, d)
    before = set(S._read_manifest(d, 1)["files"])
    # source touches only the low end of the key space
    src = spark.createDataFrame([(3, -3), (7, -7)], "id bigint, v bigint")
    S.merge_upsert(spark, d, src, "id")
    after = S._read_manifest(d, 2)
    carried = set(after["files"]) & before
    assert carried, "expected untouched files to be carried over verbatim"
    assert len(carried) >= 2  # only the file(s) containing 3 and 7 rewritten
    rows = {r.id: r.v for r in S.read_snapshot(spark, d).collect()}
    assert rows[3] == -3 and rows[7] == -7 and rows[399] == 3990
    assert len(rows) == 400
    assert after["rows"] == 400


def test_merge_upsert_insert_only_touches_nothing(spark, tmp_path):
    d = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "id bigint, v bigint"
    ).repartitionByRange(4, "id")
    S.commit_append(df, d)
    before = set(S._read_manifest(d, 1)["files"])
    src = spark.createDataFrame([(1000, 1), (2000, 2)], "id bigint, v bigint")
    S.merge_upsert(spark, d, src, "id")
    after = S._read_manifest(d, 2)
    assert before <= set(after["files"])  # pure insert: zero rewrites
    assert after["rows"] == 102


def test_compact_files_preserves_rows_and_reduces_files(spark, tmp_path):
    d = str(tmp_path / "tbl")
    # many tiny files: 16 partitions of a small table
    df = spark.createDataFrame([(i, i) for i in range(160)], "id bigint, v bigint")
    S.commit_append(df.repartition(16), d)
    n_before = len(S._read_manifest(d, 1)["files"])
    assert n_before >= 8
    res = S.compact_files(spark, d)
    assert res["version"] == 2 and res["compacted"] == n_before
    after = S._read_manifest(d, 2)
    assert len(after["files"]) < n_before
    assert after["rows"] == 160
    ids = sorted(r.id for r in S.read_snapshot(spark, d).collect())
    assert ids == list(range(160))
    # v1 still time-travelable
    assert len(S._read_manifest(d, 1)["files"]) == n_before


def test_merge_upsert_insert_normalizes_column_order(spark, tmp_path):
    d = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i) for i in range(50)], "id bigint, v bigint"
    ).repartitionByRange(2, "id")
    S.commit_append(df, d)
    # source with REVERSED column order; keys outside all file ranges
    src = spark.createDataFrame([(900, 9000), (901, 9010)], "v bigint, id bigint").select(
        "v", "id"
    )
    S.merge_upsert(spark, d, src, "id")
    snap = S.read_snapshot(spark, d)
    assert snap.columns == ["id", "v"]
    rows = {r.id: r.v for r in snap.collect()}
    assert rows[9000] == 900 and rows[9010] == 901  # src columns mapped by NAME
    # every committed file carries the table's column order
    import pyarrow.parquet as pq
    import os as _os

    for rel in S._read_manifest(d, 2)["files"]:
        names = pq.ParquetFile(_os.path.join(d, rel)).schema_arrow.names
        assert names == ["id", "v"], rel


def test_compact_files_noop_below_threshold(spark, table):
    d, commit = table
    commit([1, 2, 3])  # few files
    versions_before = S.list_versions(d)
    res = S.compact_files(spark, d, small_bytes=1)  # nothing under 1 byte
    assert res["version"] is None and res["compacted"] == 0
    assert S.list_versions(d) == versions_before  # no empty commit


def test_merge_upsert_duplicate_source_keys_raises(spark, table):
    d, commit = table
    commit([1, 2, 3])
    src = spark.createDataFrame(
        [(2, 111), (2, 222), (5, 555)], "id bigint, v bigint"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        S.merge_upsert(spark, d, src, "id")
    # nothing was committed
    assert S.list_versions(d) == [1]


def test_concurrent_commit_stale_parent_fails(spark, table):
    """Writer-vs-writer conflict semantics: a commit whose declared
    parent is stale (another writer published that version first) must
    raise ConcurrentCommitError, never silently drop the first
    writer's changes (lost update)."""
    d, commit = table
    commit([1, 2, 3])  # v1
    # two writers both read v1; writer A merges and commits v2
    src_a = spark.createDataFrame([(2, 222)], "id bigint, v bigint")
    assert S.merge_upsert(spark, d, src_a, "id") == 2
    # writer B derived its file set from v1 — its claim of v2 must fail
    stale = S._read_manifest(d, 1)
    with pytest.raises(S.ConcurrentCommitError):
        S._commit(d, "merge", stale["files"], stale["rows"], parent_version=1)
    # history is intact: v2 is writer A's merge
    assert S.list_versions(d) == [1, 2]
    rows = {r.id: r.v for r in S.read_snapshot(spark, d).collect()}
    assert rows[2] == 222


def test_concurrent_overwrite_retries_and_wins(spark, table):
    """overwrite is state-independent: a version-claim collision is
    retried internally and lands on the next free version."""
    d, commit = table
    commit([1])  # v1
    # simulate a racing writer that claimed v2 between read and publish
    real_commit = S._commit
    calls = {"n": 0}

    def racing_commit(table_dir, op, files, rows, parent_version=None, extra=None):
        if calls["n"] == 0:
            calls["n"] += 1
            # another writer publishes v2 between this writer's read
            # and publish; this writer's first claim of v2 collides
            real_commit(table_dir, "append", files, rows, parent_version=1)
            return real_commit(table_dir, op, files, rows, parent_version=1, extra=extra)
        return real_commit(table_dir, op, files, rows, parent_version, extra=extra)

    orig = S._commit
    S._commit = racing_commit
    try:
        v = S.commit_overwrite(
            spark.createDataFrame([(9, 90)], "id bigint, v bigint"), d
        )
    finally:
        S._commit = orig
    assert v == 3  # v2 was taken by the racer; overwrite retried to v3
    assert _ids(spark, d) == [9]


def test_clustering_report_and_recluster_restore_pruning(spark, tmp_path):
    """Trickle merges blur the key layout (merge-written files span the
    batch's whole key range); clustering_report measures the decay and
    recluster_files restores disjoint ranges so merge pruning works
    again."""
    d = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i) for i in range(400)], "id bigint, v bigint"
    ).repartitionByRange(4, "id")
    S.commit_append(base, d)
    r0 = S.clustering_report(d, "id")
    assert r0["n_ranged"] == 4 and r0["max_overlap_depth"] == 1
    assert r0["files_overlapping"] == 0

    # three trickle merges, each spanning the whole key space
    for seq in range(3):
        src = spark.createDataFrame(
            [(k, 1000 + seq) for k in (5 + seq, 395 - seq)], "id bigint, v bigint"
        )
        S.merge_upsert(spark, d, src, "id")
    r1 = S.clustering_report(d, "id")
    assert r1["max_overlap_depth"] > 1  # layout degraded
    assert r1["files_overlapping"] > 0

    res = S.recluster_files(spark, d, "id", n_files=4)
    r2 = S.clustering_report(d, "id")
    assert r2["max_overlap_depth"] == 1 and r2["files_overlapping"] == 0
    assert res["report_before"] == r1
    # data unchanged through the rewrite
    rows = {r.id: r.v for r in S.read_snapshot(spark, d).collect()}
    assert len(rows) == 400 and rows[5] == 1000 and rows[394] == 1001
    # and a point merge prunes again: exactly one file rewritten
    v_before = set(S._read_manifest(d, res["version"])["files"])
    S.merge_upsert(
        spark, d, spark.createDataFrame([(7, 7777)], "id bigint, v bigint"), "id"
    )
    v_after = set(S._read_manifest(d, res["version"] + 1)["files"])
    assert len(v_before & v_after) == 3


def test_expire_grace_protects_inflight_staged_files(spark, table):
    """An unreferenced data file younger than the grace period is NOT
    swept — it may be a concurrent writer's staged-but-unpublished
    commit; deleting it would corrupt that writer's publish."""
    d, commit = table
    commit([1])
    df = spark.createDataFrame([(99, 990)], "id bigint, v bigint")
    files, _ = S._stage_data_files(df, d)  # in-flight writer's stage
    stats = S.expire_snapshots(d, keep_last=1)  # default grace
    assert stats["dropped_files"] == 0
    import os

    assert all(os.path.exists(os.path.join(d, f)) for f in files)


def test_gc_never_rmtrees_midwrite_temporary_stage_dir(spark, table):
    """The pre-commit window of a concurrent df.write.parquet holds
    ONLY a _temporary/ subtree in its stage dir (part files appear at
    Spark's commit-time rename). A GC pass during that window — even
    one invoked with grace 0 elsewhere in the tree — must not rmtree
    the live writer's stage dir: the freshness probe is recursive, so
    the just-written task files deep under _temporary keep the dir
    alive."""
    d, commit = table
    commit([1])
    # simulate the mid-write window: a stage dir whose only content is
    # a fresh _temporary subtree with task-attempt files deep inside
    stage = os.path.join(d, "data", "stage-inflight")
    deep = os.path.join(stage, "_temporary", "0", "task_0000_m_000000")
    os.makedirs(deep)
    with open(os.path.join(deep, "part-00000.snappy.parquet.inprogress"), "w") as fh:
        fh.write("x")
    S.remove_orphan_files(d, orphan_grace_s=3600)
    S.expire_snapshots(d, keep_last=1, orphan_grace_s=3600)
    assert os.path.isdir(stage)  # live writer's stage dir untouched
    # once the subtree is genuinely stale (older than grace), GC may
    # reclaim it — backdate every path and rerun
    old = 1_000_000_000
    for root, dirs, files in os.walk(stage, topdown=False):
        for e in dirs + files:
            os.utime(os.path.join(root, e), (old, old))
    os.utime(stage, (old, old))
    S.remove_orphan_files(d, orphan_grace_s=3600)
    assert not os.path.exists(stage)  # crashed-writer debris reclaimed
