"""BPE trainer semantics on a tiny known corpus, plus the pinned
single-pass merge-application deviation on self-pair runs."""

from closure_html_spark.spark import relational as R


def _merges(spark, tmp_path, texts, n_merges, top_words=50):
    import pandas as pd
    p = str(tmp_path / "documents.parquet")
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(p)
    return R.q_bpe_merges(spark, str(tmp_path), n_merges=n_merges,
                          top_words=top_words).collect()


def test_known_corpus_merges(spark, tmp_path):
    """'low' x3 + 'lower' x1: highest pair is (l,o) count 4, then
    (lo,w) count 4 after the merge, then w</w> from the three 'low's."""
    got = _merges(spark, tmp_path, ["low low low lower"], 3)
    assert [(r.step, r.pair_left, r.pair_right, r.merged, r.pair_count)
            for r in got] == [
        (1, "l", "o", "lo", 4),
        (2, "lo", "w", "low", 4),
        (3, "low", "</w>", "low</w>", 3),
    ]


def test_tie_break_lexicographic(spark, tmp_path):
    """'ab cd' once: all pairs have count 1; (a,b) wins the (left,right)
    ascending tie-break over (b,</w>), (c,d), (d,</w>)."""
    [r] = _merges(spark, tmp_path, ["ab cd"], 1)
    assert (r.pair_left, r.pair_right) == ("a", "b")


def test_self_pair_run_deviation(spark, tmp_path):
    """Pinned deviation from canonical BPE: in 'aaaa' the single-pass
    padded replace merges (a,a) ONCE per non-overlapping scan, leaving
    [aa, a, a] (canonical BPE leaves [aa, aa]).  The pair COUNT is the
    standard overlapping count (3 in 'aaaa').  Cross-engine identity of
    this exact behavior is what the oracle gate pins."""
    got = _merges(spark, tmp_path, ["aaaa"], 2)
    assert (got[0].pair_left, got[0].pair_right, got[0].pair_count) == ("a", "a", 3)
    # step 2 sees symbols [aa, a, a, </w>]: pairs (aa,a), (a,a), (a,</w>)
    # all count 1 -> tie-break picks (a,</w>) ('<' sorts before 'a')
    assert (got[1].pair_left, got[1].pair_right) == ("a", "</w>")
