"""Property test: the PPJoin prefix/length/positional filters must lose NO
qualifying pair — the operator's output equals a brute-force Python oracle
on randomized corpora, including near-duplicate-heavy ones."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tigerbeetle_cdc_nats_spark.operators.dedup import prefix_jaccard_pairs

VOCAB = ["a", "b", "c", "d", "e", "f"]

# A doc = 3..10 tokens over a 6-token vocab: 3-gram sets are small and
# collide often, which stresses the flat-frequency (worst) case for the
# prefix filter. A mutation strategy derives near-dups so qualifying pairs
# actually occur.
doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=3, max_size=10)


def brute_force(docs: list[list[str]], t_num: int, t_den: int):
    sets = {}
    for i, toks in enumerate(docs):
        sets[i] = {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}
    out = set()
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if t_den * inter >= t_num * union:
                out.add((a, b, inter, union))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(doc_strategy, min_size=2, max_size=8),
       st.integers(min_value=0, max_value=7),
       st.data())
def test_matches_brute_force(spark, base_docs, dup_of, data):
    # inject a near-duplicate of one base doc (append one token) so the
    # qualifying set is non-trivial in most examples
    docs = list(base_docs)
    src = docs[dup_of % len(docs)]
    docs.append(src + [data.draw(st.sampled_from(VOCAB))])
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b, r.n_inter, r.n_union)
           for r in prefix_jaccard_pairs(df).collect()}
    assert got == brute_force(docs, 1, 2)


@settings(max_examples=6, deadline=None)
@given(st.lists(doc_strategy, min_size=2, max_size=6))
def test_stricter_threshold_is_subset(spark, base_docs):
    docs = list(base_docs) + [base_docs[0]]  # exact dup: J = 1 pair exists
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    loose = {(r.doc_a, r.doc_b)
             for r in prefix_jaccard_pairs(df, t_num=1, t_den=2).collect()}
    strict = {(r.doc_a, r.doc_b)
              for r in prefix_jaccard_pairs(df, t_num=9, t_den=10).collect()}
    assert strict <= loose
    assert strict == brute_force_pairs(docs, 9, 10)


def brute_force_pairs(docs, t_num, t_den):
    return {(a, b) for a, b, _, _ in brute_force(docs, t_num, t_den)}
