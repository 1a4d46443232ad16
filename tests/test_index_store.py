"""Versioned index store (r10): atomic publish/swap semantics for
the persisted index families — the code form of the "rename or
repoint" docstring the r9 compaction left to the caller."""

from __future__ import annotations

import os

import pytest

from parallel_svms_spark.io import index_store as IS
from parallel_svms_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _publish_build(spark, docs, root):
    p = IS.new_version_path(root)
    D.gram_count_index(docs).write.parquet(p)
    IS.publish(root, p)
    return p


def test_publish_and_read_current(spark, docs, tmp_path):
    root = str(tmp_path / "gidx")
    p1 = _publish_build(spark, docs, root)
    assert IS.current_path(root) == p1
    n1 = IS.read_current(spark, root).count()
    assert n1 > 0
    # unpublished store raises, partially-published names must exist
    with pytest.raises(FileNotFoundError):
        IS.current_path(str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        IS.publish(root, str(tmp_path / "gidx" / "v999999"))
    with pytest.raises(ValueError):
        IS.publish(root, str(tmp_path / "elsewhere"))


def test_compact_swap_read_equivalent_no_path_juggling(
        spark, docs, tmp_path):
    """The full day-N lifecycle against ONE root handle: build →
    publish → append two day batches into current → compact_swap →
    the incremental screen reads the compacted index through the
    same read_current call and returns identical rows."""
    corpus = docs.filter("source not in ('src0', 'src1')")
    b1 = docs.filter("source = 'src0'")
    b2 = docs.filter("source = 'src1'")
    root = str(tmp_path / "gidx")
    _publish_build(spark, corpus, root)
    D.gram_index_append(b1, IS.current_path(root))
    before = {(r.doc_id, r.span_start, r.span_tokens)
              for r in D.repeated_spans_incremental(
                  corpus.unionByName(b1), b2,
                  index=IS.read_current(spark, root)).collect()}
    scrub_before = {(r.doc_id, r.clean_text, r.n_removed_tokens)
                    for r in D.scrub_repeated_spans_incremental(
                        corpus.unionByName(b1), b2,
                        index=IS.read_current(spark, root)).collect()}
    new_p = D.gram_index_compact_swap(spark, root)
    assert IS.current_path(root) == new_p
    # compacted: one row per gram, same totals
    idx = IS.read_current(spark, root)
    assert idx.groupBy("g").count().filter("count > 1").count() == 0
    after = {(r.doc_id, r.span_start, r.span_tokens)
             for r in D.repeated_spans_incremental(
                 corpus.unionByName(b1), b2,
                 index=IS.read_current(spark, root)).collect()}
    scrub_after = {(r.doc_id, r.clean_text, r.n_removed_tokens)
                   for r in D.scrub_repeated_spans_incremental(
                       corpus.unionByName(b1), b2,
                       index=IS.read_current(spark, root)).collect()}
    assert after == before and scrub_after == scrub_before
    assert before  # non-vacuous


def test_swap_under_concurrent_reader(spark, docs, tmp_path):
    """A reader that bound the OLD version before the swap keeps a
    valid snapshot (version dirs are immutable; the pointer flip
    doesn't touch files); new readers get the compacted version. A
    later drop_stale_versions removes only non-current dirs — after
    which the old snapshot is gone by design."""
    root = str(tmp_path / "gidx")
    p1 = _publish_build(spark, docs.filter("source <> 'src0'"), root)
    D.gram_index_append(docs.filter("source = 'src0'"),
                        IS.current_path(root))
    old_reader = IS.read_current(spark, root)
    rows_before_swap = old_reader.count()
    p2 = D.gram_index_compact_swap(spark, root)
    # the old snapshot still scans its (untouched) files
    assert old_reader.count() == rows_before_swap
    assert IS.current_path(root) == p2
    new_rows = IS.read_current(spark, root).count()
    assert 0 < new_rows < rows_before_swap  # day-rows folded
    dropped = IS.drop_stale_versions(root)
    assert dropped == [p1]
    assert os.path.isdir(p2) and not os.path.isdir(p1)
    assert IS.read_current(spark, root).count() == new_rows


def test_store_is_family_generic(spark, docs, tmp_path):
    """The same pointer convention serves the appends that need no
    fold: a winnow index root with identity compaction (dedup of
    day-rows is a no-op there — each doc fingerprinted once)."""
    root = str(tmp_path / "widx")
    p = IS.new_version_path(root)
    D.winnow_index(
        docs.filter("source not in ('src0', 'src1')")).write.parquet(p)
    IS.publish(root, p)
    D.winnow_index_append(docs.filter("source = 'src0'"),
                          IS.current_path(root))
    batch = docs.filter("source = 'src1'")
    corpus = docs.filter("source <> 'src1'")
    via_store = {(r.doc_a, r.doc_b, r.jaccard)
                 for r in D.winnow_near_dups_incremental(
                     corpus, batch,
                     index=IS.read_current(spark, root)).collect()}
    inline = {(r.doc_a, r.doc_b, r.jaccard)
              for r in D.winnow_near_dups_incremental(
                  corpus, batch).collect()}
    assert via_store == inline
