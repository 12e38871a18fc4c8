"""BPE merge training — published-example golden (Sennrich et al. 2016).

Corpus: low×5, lower×2, newest×6, widest×3 — the worked example from the
paper, under the fused end-marker convention (last char carries </w> as
one symbol, so 'newest' starts as [n,e,w,e,s,t</w>]).  Derived by hand:
  (e,s) 9 (newest 6 + widest 3) → es
  (es,t</w>) 9                  → est</w>
  (l,o) 7 (low 5 + lower 2)     → lo
  (e,w) 6 (newest; ties with (n,e),(w,est</w>) — (left,right) asc wins)
  (ew,est</w>) 6                → ewest</w>
"""

import pytest

from results_ingestor_spark.operators.bpe import train_bpe_merges


@pytest.fixture(scope="module")
def corpus(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_published_example(corpus):
    got = [(r["left"], r["right"], r["merged"], r["pair_count"])
           for r in train_bpe_merges(corpus, n_merges=5).collect()]
    assert got == [
        ("e", "s", "es", 9),
        ("es", "t</w>", "est</w>", 9),
        ("l", "o", "lo", 7),
        ("e", "w", "ew", 6),
        ("ew", "est</w>", "ewest</w>", 6),
    ]


def test_bpe_greedy_nonoverlapping_merge(spark):
    # 'aaa': symbols [a, a, a</w>] → adjacent pairs (a,a) and (a,a</w>),
    # tied at count 2; the (left, right) tie-break picks (a,a).  The
    # merge rewrite is greedy left-to-right: aaa → [aa, a</w>], never
    # the overlapping [a, aa</w>] reading.
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    rows = train_bpe_merges(df, n_merges=2).collect()
    assert (rows[0]["left"], rows[0]["right"], rows[0]["pair_count"]) == \
        ("a", "a", 2)
    # second merge operates on [aa, a</w>]: the only remaining pair
    assert (rows[1]["left"], rows[1]["right"]) == ("aa", "a</w>")


def test_bpe_merge_rank_monotone_counts(corpus):
    rows = train_bpe_merges(corpus, n_merges=8).collect()
    assert [r["merge_rank"] for r in rows] == list(range(len(rows)))
    assert all(r["pair_count"] > 0 for r in rows)


def test_tokenize_with_merges_published_example(corpus):
    # After the 5 derived merges: low→[lo,w</w>]=2, lower→[lo,w,e,r</w>]=4,
    # newest→[n,ewest</w>]=2, widest→[w,i,d,est</w>]=4.
    from results_ingestor_spark.operators.bpe import tokenize_with_merges
    m = train_bpe_merges(corpus, n_merges=5)
    pairs = [(r["left"], r["right"]) for r in m.collect()]
    row = tokenize_with_merges(corpus, pairs).collect()[0]
    assert row["n_words"] == 16  # 5+2+6+3
    assert row["n_subwords"] == 5 * 2 + 2 * 4 + 6 * 2 + 3 * 4
