"""Property-based checks (hypothesis) for the algorithmic cores:
connected components vs a pure-Python union-find on random graphs, and
minhash-LSH agreement with exact shingle Jaccard on random corpora.
Few examples per property — every example runs real Spark jobs."""

from hypothesis import given, settings, strategies as st

from dug_spark.operators import canonicalize, dedup

_node = st.integers(min_value=0, max_value=40)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(_node, _node), min_size=1, max_size=60))
def test_connected_components_equals_union_find(spark, edge_list):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {f"n{x:02d}": f"n{min(m for m in parent if find(m) == find(x)):02d}"
                for x in parent}

    rows = [(f"n{a:02d}", f"n{b:02d}") for a, b in edge_list]
    edges = spark.createDataFrame(rows, "src string, dst string")
    sym = edges.unionByName(edges.selectExpr("dst as src", "src as dst"))
    got = {r["id"]: r["comp"]
           for r in canonicalize.connected_components(sym, max_iter=50).collect()}
    # self-loop-only nodes appear in got; union-find sees them too (setdefault)
    assert got == expected


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=12,
    )
)
def test_minhash_pairs_subset_of_shingle_pairs(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.shingle_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    # LSH candidates are verified with the same exact Jaccard → subset,
    # with identical jaccard values on the shared pairs
    assert lsh <= exact
    # identical-text pairs have identical signatures → always recovered
    identical = {p for p in exact if p[2] == 1.0}
    assert identical <= lsh
